"""Streaming IO pipeline + multi-host ownership tests."""

import io

import numpy as np
import pytest

from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR, decode_chunked, encode_chunked
from ebcc_tpu.io import compress_stream, decompress_stream
from ebcc_tpu.parallel import multihost


class TestStreamingIO:
    def test_stream_matches_in_memory(self, base_test_data):
        """Streamed container must be byte-identical to encode_chunked."""
        data = np.stack([base_test_data[:96, :128] + i for i in range(5)])
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(2, 96, 128))
        buf = io.BytesIO()
        compress_stream(data, config, buf)
        assert buf.getvalue() == encode_chunked(data, config)

    def test_stream_roundtrip(self, base_test_data):
        data = np.stack([base_test_data[:64, :64] + i for i in range(6)])
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 64, 64))
        buf = io.BytesIO()
        compress_stream(data, config, buf)
        buf.seek(0)
        out = decompress_stream(buf)
        assert np.abs(out - data).max() <= 0.1

    def test_compress_hdf5(self, base_test_data, tmp_path):
        h5py = pytest.importorskip("h5py")
        from ebcc_tpu.io import compress_hdf5

        data = np.stack([base_test_data[:64, :96] + i for i in range(4)])
        src = tmp_path / "src.h5"
        dst = tmp_path / "dst.etpk"
        with h5py.File(src, "w") as f:
            f.create_dataset("t2m", data=data)
        compress_hdf5(str(src), "t2m",
                      str(dst), {"base_cr": 30,
                                 "residual_mode": RESIDUAL_MAX_ERROR,
                                 "error": 0.1})
        out = decode_chunked(dst.read_bytes())
        assert np.abs(out - data).max() <= 0.1


class TestMultihost:
    def test_chunk_slices_partition(self):
        for n, p in [(10, 3), (8, 8), (5, 2), (3, 7)]:
            got = []
            for pid in range(p):
                s, e = multihost.host_chunk_slice(n, pid, p)
                got.extend(range(s, e))
            assert got == list(range(n))

    def test_parts_merge_equals_single_host(self, base_test_data):
        """Per-host encodes concatenated under one header == single-host
        container, and it decodes."""
        data = np.stack([base_test_data[:64, :64] + i for i in range(6)])
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 64, 64))
        parts = []
        for pid in range(3):
            streams, _ = multihost.encode_owned_chunks(
                data, config, process_id=pid, process_count=3)
            parts.append(multihost.container_part(streams))
        blob = multihost.merge_container_parts(config, parts)
        assert blob == encode_chunked(data, config)
        out = decode_chunked(blob)
        assert np.abs(out - data).max() <= 0.1
