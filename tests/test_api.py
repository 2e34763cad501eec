"""API-surface tests (parity role: reference tests/test_netcdf.py,
tests/test_zarr.py, and the filter_wrapper CLI contract)."""

import subprocess
import sys

import numpy as np
import pytest

from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR
from ebcc_tpu.api.filter_wrapper import (
    EBCC_Filter,
    FILTER_ID,
    float_to_uint32,
    populate_config,
    uint32_to_float,
)
from ebcc_tpu.api.zarr_filter import EBCCZarrFilter


class TestFilterWrapper:
    def test_mapping_contract(self):
        """Parity: EBCC_Filter splats into create_dataset (fw.py:49-56)."""
        f = EBCC_Filter(base_cr=100, height=721, width=1440,
                        residual_opt=("relative_error_target", 0.009),
                        data_dim=3)
        kwargs = dict(f)
        assert kwargs["dtype"] == "float32"
        assert kwargs["chunks"] == (1, 721, 1440)
        assert kwargs["compression"] == FILTER_ID
        opts = kwargs["compression_opts"]
        assert opts[0] == 721 and opts[1] == 1440
        assert uint32_to_float(opts[2]) == 100.0
        assert opts[3] == 2  # relative mode
        assert abs(uint32_to_float(opts[4]) - 0.009) < 1e-9

    def test_none_mode_opts(self):
        f = EBCC_Filter(base_cr=50, height=64, width=64, residual_opt=None)
        assert f.hdf_filter_opts == (64, 64, float_to_uint32(50.0), 0)

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="Unknown residual_type"):
            EBCC_Filter(base_cr=1, height=64, width=64,
                        residual_opt=("bogus", 1))

    def test_populate_config_roundtrip(self):
        """Parity: populate_config cd_values ABI (h5z_ebcc.c:38-93)."""
        f = EBCC_Filter(base_cr=30, height=64, width=128,
                        residual_opt=("max_error_target", 0.5))
        nbytes = 4 * 64 * 128 * 5  # five frames
        config = populate_config(f.hdf_filter_opts, nbytes)
        assert config.dims == (5, 64, 128)
        assert config.base_cr == 30.0
        assert config.residual_mode == RESIDUAL_MAX_ERROR
        assert config.error == 0.5

    def test_populate_config_validation(self):
        f = EBCC_Filter(base_cr=30, height=64, width=64,
                        residual_opt=("max_error_target", 0.5))
        with pytest.raises(ValueError, match="not divisible"):
            populate_config(f.hdf_filter_opts, 4 * 64 * 64 + 4)
        with pytest.raises(ValueError, match="smaller than"):
            populate_config(f.hdf_filter_opts, 4 * 32)
        with pytest.raises(ValueError, match="invalid"):
            populate_config((8, 8, float_to_uint32(30.0), 0), 4 * 64 * 64)


class TestZarrFilter:
    def test_encode_decode_roundtrip(self, small_frame):
        """Parity: test_zarr.py:30-60 via the numcodecs-style codec."""
        f = EBCC_Filter(base_cr=30, height=64, width=64,
                        residual_opt=("max_error_target", 0.1))
        codec = EBCCZarrFilter(f.hdf_filter_opts)
        buf = codec.encode(small_frame[None])
        out = codec.decode(buf).reshape(1, 64, 64)
        assert np.abs(out - small_frame[None]).max() <= 0.1
        assert small_frame.nbytes / len(buf) > 2

    def test_decode_into_out(self, small_frame):
        f = EBCC_Filter(base_cr=30, height=64, width=64,
                        residual_opt=("max_error_target", 0.1))
        codec = EBCCZarrFilter(f.hdf_filter_opts)
        buf = codec.encode(small_frame[None])
        out = np.empty(64 * 64, np.float32)
        got = codec.decode(buf, out=out)
        assert got is out
        assert np.abs(out.reshape(64, 64) - small_frame).max() <= 0.1

    def test_config_roundtrip(self):
        f = EBCC_Filter(base_cr=30, height=64, width=64,
                        residual_opt=("max_error_target", 0.1))
        codec = EBCCZarrFilter(f.hdf_filter_opts)
        cfg_dict = codec.get_config()
        codec2 = EBCCZarrFilter.from_config(cfg_dict)
        assert np.array_equal(codec2.arglist, codec.arglist)


class TestHDF5:
    def test_save_load_dataset(self, medium_frame, tmp_path):
        h5py = pytest.importorskip("h5py")
        from ebcc_tpu.api import hdf5 as h5api

        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 128, 128))
        path = tmp_path / "t.h5"
        with h5py.File(path, "w") as f:
            h5api.save_dataset(f, "temperature", data, config)
        with h5py.File(path, "r") as f:
            out = h5api.load_dataset(f, "temperature")
            size = f["temperature"].size
        assert out.shape == data.shape
        assert np.abs(out - data).max() <= 0.1
        assert data.nbytes / size > 2  # achieved file-level CR floor

    def test_load_rejects_foreign_dataset(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from ebcc_tpu.api import hdf5 as h5api

        path = tmp_path / "t.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("x", data=np.arange(10))
            with pytest.raises(ValueError, match="not an ebcc_tpu payload"):
                h5api.load_dataset(f, "x")


class TestCLI:
    def test_spec_output(self):
        """Parity: CLI prints '<id>,<h>,<w>,...' (fw.py:108-115)."""
        from ebcc_tpu.api import cli

        proc = subprocess.run(
            [sys.executable, "-m", "ebcc_tpu.api.cli", "spec", "-b", "30",
             "-H", "721", "-W", "1440", "-m", "0.5"],
            capture_output=True, text=True, check=True)
        parts = proc.stdout.strip().split(",")
        assert parts[0] == str(FILTER_ID)
        assert parts[1] == "721" and parts[2] == "1440"
        assert uint32_to_float(int(parts[3])) == 30.0
        assert parts[4] == "1"
        assert uint32_to_float(int(parts[5])) == 0.5

    def test_spec_default_relative(self):
        proc = subprocess.run(
            [sys.executable, "-m", "ebcc_tpu.api.cli", "-b", "200"],
            capture_output=True, text=True, check=True)
        parts = proc.stdout.strip().split(",")
        assert parts[4] == "2"
        assert abs(uint32_to_float(int(parts[5])) - 0.01) < 1e-9

    def test_compress_decompress_files(self, small_frame, tmp_path):
        inp = tmp_path / "in.npy"
        mid = tmp_path / "out.ebcc"
        outp = tmp_path / "out.npy"
        np.save(inp, small_frame[None])
        from ebcc_tpu.api import cli

        assert cli.main(["compress", str(inp), str(mid),
                         "--max-error", "0.1"]) == 0
        assert cli.main(["decompress", str(mid), str(outp)]) == 0
        out = np.load(outp)
        assert np.abs(out.reshape(small_frame[None].shape)
                      - small_frame[None]).max() <= 0.1
