"""Bitstream contract tests (parity role: reference tests/test_c_api.py
header-exactness and container tests, tc:174-300)."""

import struct

import numpy as np
import pytest

from ebcc_tpu.core import stream


def _hdr(**kw):
    defaults = dict(
        flags=stream.FLAG_HAS_RESIDUAL, entropy=1, n_frames=2, height=64,
        width=128, minval=-1.5, maxval=2.5,
        rmin=float(np.float32(-0.1)), rmax=float(np.float32(0.2)),
        base_levels=5, res_levels=3, base_nplanes=20, base_cut=4, base_top=2,
        res_nplanes=12, res_cut=3, res_top=1, base_comp_size=0,
        res_comp_size=0)
    defaults.update(kw)
    return stream.FrameHeader(**defaults)


def test_frame_header_roundtrip():
    h = _hdr(base_comp_size=123, res_comp_size=45)
    buf = h.pack()
    assert len(buf) == stream.FRAME_HEADER_SIZE
    h2 = stream.FrameHeader.unpack(buf)
    assert h2 == h
    assert h2.has_residual and not h2.const_field


def test_frame_stream_roundtrip():
    h = _hdr(base_comp_size=4, res_comp_size=3)
    blob = stream.pack_frame_stream(h, b"abcd", b"xyz")
    h2, b, r = stream.split_frame_stream(blob)
    assert (b, r) == (b"abcd", b"xyz")
    assert h2 == h


def test_frame_stream_trailing_bytes_rejected():
    h = _hdr(base_comp_size=4, res_comp_size=0)
    blob = stream.pack_frame_stream(h, b"abcd", b"") + b"JUNK"
    with pytest.raises(stream.StreamError, match="size mismatch"):
        stream.split_frame_stream(blob)


def test_bad_magic_rejected():
    h = _hdr()
    buf = bytearray(h.pack())
    buf[:4] = b"NOPE"
    with pytest.raises(stream.StreamError, match="magic"):
        stream.FrameHeader.unpack(bytes(buf))


def test_bad_version_rejected():
    buf = bytearray(_hdr().pack())
    buf[4] = 99
    with pytest.raises(stream.StreamError, match="version"):
        stream.FrameHeader.unpack(bytes(buf))


def test_truncated_header_rejected():
    with pytest.raises(stream.StreamError, match="truncated"):
        stream.FrameHeader.unpack(b"ETPU123")


def test_chunked_header_exactness():
    """Field-level exactness, parity with test_c_api.py:174-192."""
    h = stream.ChunkedHeader(dims=(4, 100, 200), chunk_dims=(1, 64, 64),
                             num_chunks=4 * 2 * 4, chunk_size=64 * 64)
    buf = h.pack()
    assert len(buf) == stream.CHUNKED_HEADER_SIZE == 80
    assert buf[:4] == b"ETPK"
    assert struct.unpack_from("<I", buf, 4)[0] == 1  # version
    assert struct.unpack_from("<I", buf, 8)[0] == 3  # ndims
    assert struct.unpack_from("<3Q", buf, 16) == (4, 100, 200)
    assert struct.unpack_from("<3Q", buf, 40) == (1, 64, 64)
    h2 = stream.ChunkedHeader.unpack(buf)
    assert h2 == h


def test_chunked_container_roundtrip():
    h = stream.ChunkedHeader(dims=(1, 64, 64), chunk_dims=(1, 64, 64),
                             num_chunks=3, chunk_size=64 * 64)
    streams = [b"a" * 10, b"bb" * 7, b"c"]
    blob = stream.pack_chunked(h, streams)
    h2, out = stream.iter_chunked(blob)
    assert h2 == h and out == streams


def test_chunked_truncation_rejected():
    h = stream.ChunkedHeader(dims=(1, 64, 64), chunk_dims=(1, 64, 64),
                             num_chunks=2, chunk_size=64 * 64)
    blob = stream.pack_chunked(h, [b"aa", b"bb"])
    with pytest.raises(stream.StreamError):
        stream.iter_chunked(blob[:-1])
    with pytest.raises(stream.StreamError, match="trailing"):
        stream.iter_chunked(blob + b"x")


class TestVersionCompat:
    def test_v1_zstd_stream_still_decodes(self, small_frame):
        """Only the CAB bitstream changed between frame versions 1 and 2;
        zstd/store streams are byte-compatible and must stay readable."""
        from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR
        from ebcc_tpu.core import codec

        cfg = CodecConfig(dims=(1, 64, 64), base_cr=20,
                          residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob = bytearray(codec.encode(small_frame, cfg))
        assert blob[4] == 2
        blob[4] = 1
        out = codec.decode(bytes(blob)).reshape(64, 64)
        assert np.abs(out - small_frame).max() <= 0.1

    def test_v1_cab_stream_rejected(self, small_frame):
        from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR
        from ebcc_tpu.core import codec, stream

        cfg = CodecConfig(dims=(1, 64, 64), base_cr=20,
                          residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                          entropy_backend="cab")
        try:
            blob = bytearray(codec.encode(small_frame, cfg))
        except Exception:
            import pytest
            pytest.skip("CAB backend unavailable")
        if blob[6] != 2 and (blob[7] or blob[6]) != 2:
            import pytest
            pytest.skip("CAB did not win on this frame")
        blob[4] = 1
        import pytest
        with pytest.raises(stream.StreamError):
            codec.decode(bytes(blob))
