"""netCDF integration: third-party readers consuming plugin-filtered files.

Parity: reference ``tests/test_netcdf.py:11-99`` (h5py/netCDF pipeline with
rel-error and CR floors) and ``data/test_netcdf.sh`` (cdo --filter round
trip).  The point of shipping an HDF5 filter plugin is that OTHER tools can
read the files — so these tests write through h5py + the plugin and read
back through netCDF4 / h5netcdf (each in a subprocess, HDF5_PLUGIN_PATH
set), not through this package's own decode entry points.

netCDF4 / h5netcdf / cdo are not in every image; each test skips cleanly
when its reader is absent (same gating as the reference's enstools-dependent
suites) and runs in the packaging CI where they are installed.
"""

import os
import shutil
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytest.importorskip("h5py")
import h5py  # noqa: E402

from ebcc_tpu import native as native_mod  # noqa: E402
from ebcc_tpu.api.filter_wrapper import EBCC_Filter  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def plugin_dir():
    try:
        native_mod.load()
    except Exception:
        pytest.skip("native plugin not buildable here")
    # Register for THIS process's writes; readers get HDF5_PLUGIN_PATH.
    h5py.h5pl.append(str(native_mod.BUILD_DIR).encode())
    return str(native_mod.BUILD_DIR)


def _climate_field(h=256, w=256):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(3)
    x = (270 + 20 * np.sin(yy / h * np.pi) * np.cos(xx / w * 2 * np.pi)
         + rng.normal(scale=0.5, size=(h, w)))
    return x.astype(np.float32)


def _write_filtered_nc(path, data, rel_target=0.009, base_cr=100):
    """netCDF-4 style file (dimension scales attached) written through
    h5py with the ETPU filter on the data variable."""
    h, w = data.shape[-2:]
    filt = EBCC_Filter(base_cr=base_cr, height=h, width=w,
                       residual_opt=("relative_error_target", rel_target),
                       data_dim=data.ndim)
    with h5py.File(path, "w") as f:
        lat = f.create_dataset("lat", data=np.linspace(-90, 90, h,
                                                       dtype=np.float32))
        lon = f.create_dataset("lon", data=np.linspace(0, 360, w,
                                                       dtype=np.float32,
                                                       endpoint=False))
        lat.make_scale("lat")
        lon.make_scale("lon")
        d = f.create_dataset("t2m", shape=data.shape, **filt)
        d[...] = data
        d.dims[data.ndim - 2].attach_scale(lat)
        d.dims[data.ndim - 1].attach_scale(lon)
        d.attrs["units"] = np.bytes_(b"K")
    return filt


def _read_in_subprocess(reader_code, path, plugin_dir):
    env = dict(os.environ)
    env["HDF5_PLUGIN_PATH"] = plugin_dir
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", reader_code, str(path)],
        capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


class TestNetCDF4:
    def test_netcdf4_reads_filtered_file(self, plugin_dir, tmp_path):
        """A file written via h5py + plugin is readable by the netCDF4
        library (the CDO/xarray substrate), bound held."""
        pytest.importorskip("netCDF4")
        data = _climate_field()
        path = tmp_path / "t.nc"
        _write_filtered_nc(path, data, rel_target=0.009)
        out = _read_in_subprocess(textwrap.dedent("""
            import sys, numpy as np, netCDF4
            ds = netCDF4.Dataset(sys.argv[1])
            v = ds.variables['t2m'][...]
            np.save(sys.argv[1] + '.npy', np.asarray(v))
            print('READ_OK', v.shape)
        """), path, plugin_dir)
        assert "READ_OK" in out
        got = np.load(str(path) + ".npy")
        rng = float(data.max() - data.min())
        assert np.abs(got - data).max() <= 0.009 * rng

    def test_file_level_cr_floor(self, plugin_dir, tmp_path):
        """Reference floor: file-level CR > 5 at rel 0.009 / base_cr 100
        (reference tests/test_netcdf.py:37-61)."""
        data = _climate_field()
        path = tmp_path / "t.nc"
        _write_filtered_nc(path, data, rel_target=0.009, base_cr=100)
        raw = tmp_path / "raw.npy"
        np.save(raw, data)
        assert raw.stat().st_size / path.stat().st_size > 5

    @pytest.mark.parametrize("base_cr", [10, 50, 100, 200])
    def test_base_cr_sweep_distortion(self, plugin_dir, tmp_path, base_cr):
        """CR sweep with the bound asserted at every point (reference
        tests/test_netcdf.py:63-80 asserts only shape; we assert error)."""
        data = _climate_field(128, 128)
        path = tmp_path / "t.nc"
        _write_filtered_nc(path, data, rel_target=0.01, base_cr=base_cr)
        with h5py.File(path, "r") as f:
            got = f["t2m"][...]
        rng = float(data.max() - data.min())
        assert np.abs(got - data).max() <= 0.01 * rng


class TestH5netcdf:
    def test_h5netcdf_reads_filtered_file(self, plugin_dir, tmp_path):
        pytest.importorskip("h5netcdf")
        data = _climate_field()
        path = tmp_path / "t.nc"
        _write_filtered_nc(path, data)
        out = _read_in_subprocess(textwrap.dedent("""
            import sys, numpy as np, h5netcdf
            with h5netcdf.File(sys.argv[1], 'r', phony_dims='sort') as ds:
                v = np.asarray(ds['t2m'])
            np.save(sys.argv[1] + '.npy', v)
            print('READ_OK')
        """), path, plugin_dir)
        assert "READ_OK" in out
        got = np.load(str(path) + ".npy")
        rng = float(data.max() - data.min())
        assert np.abs(got - data).max() <= 0.009 * rng


class TestCDO:
    def test_cdo_roundtrip(self, plugin_dir, tmp_path):
        """data/test_netcdf.sh analog: cdo applies the filter via
        --filter <id>,<cd_values...> and the result round-trips."""
        cdo = shutil.which("cdo")
        if cdo is None:
            pytest.skip("cdo not installed")
        pytest.importorskip("netCDF4")
        import netCDF4

        data = _climate_field()
        src = tmp_path / "src.nc"
        with netCDF4.Dataset(src, "w") as ds:
            ds.createDimension("lat", data.shape[0])
            ds.createDimension("lon", data.shape[1])
            v = ds.createVariable("t2m", "f4", ("lat", "lon"))
            v[...] = data

        filt = EBCC_Filter(base_cr=30, height=data.shape[0],
                           width=data.shape[1],
                           residual_opt=("max_error_target", 0.1),
                           data_dim=2)
        spec = ",".join(str(x) for x in
                        (filt.FILTER_ID,) + filt.hdf_filter_opts)
        dst = tmp_path / "dst.nc"
        env = dict(os.environ)
        env["HDF5_PLUGIN_PATH"] = plugin_dir
        proc = subprocess.run(
            [cdo, "-b", "F32", "--filter", spec, "copy", str(src), str(dst)],
            capture_output=True, text=True, env=env)
        assert proc.returncode == 0, proc.stderr

        out = _read_in_subprocess(textwrap.dedent("""
            import sys, numpy as np, netCDF4
            ds = netCDF4.Dataset(sys.argv[1])
            np.save(sys.argv[1] + '.npy', np.asarray(ds.variables['t2m'][...]))
            print('READ_OK')
        """), dst, plugin_dir)
        assert "READ_OK" in out
        got = np.load(str(dst) + ".npy")
        assert np.abs(got - data).max() <= 0.1
