#!/usr/bin/env python
"""Fetch the ERA5 sample datasets the benchmarks and examples use.

Data-acquisition parity with the reference's ``data/download_era5.py``
(/root/reference/data/download_era5.py:1-43): the same CDS datasets,
variables and 2024-03 sample window, so ``bench.py`` and the netCDF/CDO
examples are reproducible outside this image without the reference's
committed fixtures.  Requires the ``cdsapi`` package and a configured
``~/.cdsapirc`` (https://cds.climate.copernicus.eu/how-to-api); neither
ships in the test image, so this script is a tool, not a test dependency
— everything in ``tests/`` synthesizes data or uses small committed
fixtures instead.

Also emits ``test_data.npy`` (one 721x1440 float32 temperature frame at
500 hPa) — the array-level fixture shape the test-suite conftest consumes
— when ``--npy`` is given and xarray/netCDF4 are importable.

Usage:
    python scripts/download_era5.py [--out-dir data] [--npy]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

PRESSURE_LEVELS = [
    "1000", "975", "950", "925", "900", "875", "850", "825", "800", "775",
    "750", "700", "650", "600", "550", "500", "450", "400", "350", "300",
    "250", "225", "200", "175", "150", "125", "100", "70", "50", "30",
    "20", "10", "7", "5", "3", "2", "1",
]

PL_REQUEST = {
    "product_type": ["reanalysis"],
    "variable": [
        "geopotential", "temperature", "specific_humidity",
        "u_component_of_wind", "v_component_of_wind", "vertical_velocity",
    ],
    "year": ["2024"],
    "month": ["03"],
    "day": ["01", "02"],
    "time": ["00:00"],
    "pressure_level": PRESSURE_LEVELS,
    "data_format": "netcdf",
}

SFC_REQUEST = {
    "product_type": ["reanalysis"],
    "variable": [
        "10m_u_component_of_wind", "10m_v_component_of_wind",
        "2m_temperature", "mean_sea_level_pressure",
        "toa_incident_solar_radiation", "total_precipitation",
    ],
    "year": ["2024"],
    "month": ["03"],
    "day": ["01", "02"],
    "time": ["00:00"],
    "data_format": "netcdf",
}


# Hourly 500 hPa temperature sequence (one synoptic day, 8 consecutive
# hours): the real-data fixture for the temporal (closed-loop predictive)
# mode measurements — consecutive reanalysis hours are the correlation
# regime temporal coding targets (tests/test_temporal.py real-sequence
# gate, docs/RESULTS.md temporal table).
TEMPORAL_REQUEST = {
    "product_type": ["reanalysis"],
    "variable": ["temperature"],
    "year": ["2024"],
    "month": ["03"],
    "day": ["01"],
    "time": [f"{h:02d}:00" for h in range(8)],
    "pressure_level": ["500"],
    "data_format": "netcdf",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-dir", default="data", type=Path)
    ap.add_argument("--npy", action="store_true",
                    help="also extract test_data.npy (one 721x1440 "
                         "temperature frame) from the pressure-level file")
    ap.add_argument("--skip-sfc", action="store_true",
                    help="pressure-level file only")
    ap.add_argument("--temporal", action="store_true",
                    help="also fetch 8 consecutive hourly 500 hPa "
                         "temperature frames and emit "
                         "era5_temporal_8f.npy (the temporal-mode "
                         "real-sequence fixture)")
    args = ap.parse_args(argv)

    try:
        import cdsapi
    except ImportError:
        print("cdsapi is not installed; `pip install cdsapi` and configure "
              "~/.cdsapirc (https://cds.climate.copernicus.eu/how-to-api)",
              file=sys.stderr)
        return 1

    args.out_dir.mkdir(parents=True, exist_ok=True)
    client = cdsapi.Client()
    pl_target = args.out_dir / "era5_pl_sample.nc"
    client.retrieve("reanalysis-era5-pressure-levels", PL_REQUEST,
                    str(pl_target))
    print(f"wrote {pl_target}")
    if not args.skip_sfc:
        sfc_target = args.out_dir / "era5_sfc_sample.nc"
        client.retrieve("reanalysis-era5-single-levels", SFC_REQUEST,
                        str(sfc_target))
        print(f"wrote {sfc_target}")

    if args.temporal:
        tmp_target = args.out_dir / "era5_temporal_sample.nc"
        client.retrieve("reanalysis-era5-pressure-levels", TEMPORAL_REQUEST,
                        str(tmp_target))
        print(f"wrote {tmp_target}")
        import numpy as np
        import xarray as xr

        ds = xr.open_dataset(tmp_target)
        seq = np.asarray(ds["t"].squeeze(), dtype=np.float32)
        assert seq.shape == (8, 721, 1440), seq.shape
        np.save(args.out_dir / "era5_temporal_8f.npy", seq)
        print(f"wrote {args.out_dir / 'era5_temporal_8f.npy'} {seq.shape}")

    if args.npy:
        import numpy as np
        import xarray as xr

        ds = xr.open_dataset(pl_target)
        t = ds["t"].sel(pressure_level=500).isel(valid_time=0)
        frame = np.asarray(t, dtype=np.float32)
        assert frame.shape == (721, 1440), frame.shape
        np.save(args.out_dir / "test_data.npy", frame)
        print(f"wrote {args.out_dir / 'test_data.npy'} {frame.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
