"""xarray end-to-end example: compress a Dataset through the ETPU HDF5
filter and reopen it with stock climate tooling.

Role parity: the reference's benchmark drivers follow exactly this shape
(xarray.open_dataset -> h5py.create_dataset(**EBCC_Filter) -> reopen and
compare sizes, reference tests/benchmarks/compress_ebcc.py).

Run:  python examples/example_xarray.py [output.nc]
Needs xarray + h5py (+ h5netcdf or netCDF4 to reopen); prints a skip
message when they are absent so CI smoke jobs stay green either way.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    try:
        import xarray as xr
    except ImportError:
        print("xarray not installed; skipping example")
        return 0
    from ebcc_tpu.api import xarray_io

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/example_xarray.nc"

    ref = "/root/reference/data/test_data.npy"
    if os.path.exists(ref):
        t = np.load(ref).astype(np.float32)
    else:
        yy, xx = np.mgrid[0:721, 0:1440].astype(np.float32)
        t = (260 + 25 * np.sin(yy / 721 * np.pi)
             * np.cos(xx / 1440 * 2 * np.pi)).astype(np.float32)
    ds = xr.Dataset(
        {"t2m": (("time", "lat", "lon"),
                 np.stack([t, t + 0.5]).astype(np.float32))},
        coords={"time": np.arange(2),
                "lat": np.linspace(90, -90, 721).astype(np.float32),
                "lon": np.linspace(0, 360, 1440, endpoint=False,
                                   dtype=np.float32)},
        attrs={"title": "ETPU xarray example"})

    xarray_io.compress_dataset(ds, path, error=0.5)
    out = xarray_io.open_compressed(path)
    err = float(np.abs(np.asarray(out["t2m"]) - ds["t2m"].values).max())
    raw = ds["t2m"].values.nbytes
    stored = os.path.getsize(path)
    print(f"max abs error = {err:.4f} (bound 0.5)")
    print(f"file: {stored} bytes, CR ~ {raw / stored:.1f}")
    assert err <= 0.5
    return 0


if __name__ == "__main__":
    sys.exit(main())
