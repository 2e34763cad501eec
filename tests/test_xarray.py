"""xarray convenience layer (api/xarray_io).

Role parity: the reference's climate-tooling story depends on xarray
(reference pyproject.toml:24-28; benchmark drivers follow
open-with-xarray -> write-through-h5py+filter -> reopen, e.g.
tests/benchmarks/compress_ebcc.py:12-42).  Skips when xarray is absent
(runs in the packaging CI)."""

import numpy as np
import pytest

xr = pytest.importorskip("xarray")
pytest.importorskip("h5py")

from ebcc_tpu.api import xarray_io  # noqa: E402


def _dataset():
    rng = np.random.default_rng(11)
    t = (270 + rng.normal(scale=2, size=(3, 128, 128))
         .cumsum(axis=2) / 20).astype(np.float32)
    return xr.Dataset(
        {"t2m": (("time", "lat", "lon"), t),
         "mask": (("lat", "lon"), np.ones((128, 128), np.int8))},
        coords={"time": np.arange(3),
                "lat": np.linspace(-60, 60, 128).astype(np.float32),
                "lon": np.linspace(0, 359, 128).astype(np.float32)},
        attrs={"source": "synthetic"})


class TestXarrayIO:
    def test_dataarray_roundtrip(self, tmp_path):
        ds = _dataset()
        path = str(tmp_path / "da.nc")
        xarray_io.compress_dataarray(ds["t2m"], path, error=0.1)
        out = xarray_io.open_compressed(path)
        got = np.asarray(out["t2m"])
        assert got.shape == ds["t2m"].shape
        assert np.abs(got - ds["t2m"].values).max() <= 0.1
        np.testing.assert_allclose(out["lat"], ds["lat"])

    def test_dataset_roundtrip_relative(self, tmp_path):
        ds = _dataset()
        path = str(tmp_path / "ds.nc")
        xarray_io.compress_dataset(ds, path, relative_error=0.01)
        out = xarray_io.open_compressed(path)
        rng = float(ds["t2m"].max() - ds["t2m"].min())
        assert np.abs(np.asarray(out["t2m"])
                      - ds["t2m"].values).max() <= 0.01 * rng
        # non-float variables pass through uncompressed
        assert "mask" in out

    def test_requires_exactly_one_bound(self, tmp_path):
        ds = _dataset()
        with pytest.raises(ValueError):
            xarray_io.compress_dataarray(ds["t2m"], str(tmp_path / "x.nc"))
        with pytest.raises(ValueError):
            xarray_io.compress_dataarray(ds["t2m"], str(tmp_path / "x.nc"),
                                         error=1.0, relative_error=0.1)
