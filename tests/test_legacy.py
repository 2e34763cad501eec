"""Legacy EBCC v1 format interop tests.

Parity role: the reference has no legacy-format tests (it IS the format);
these pin the interop layer (ebcc_tpu/compat/) that reads and writes the
reference's "EBCC"/"EBCK" streams — VERDICT round-1 row 19.  The reference
binary cannot be built in this image (its openjpeg/zstd submodules are
empty), so fidelity rests on (a) the J2K base layer going through the same
system OpenJPEG the reference links, and (b) the SPIHT mirror's bit-level
round-trip + truncation properties tested here and in test_native.
"""

import struct
import subprocess

import numpy as np
import pytest

from ebcc_tpu import (CodecConfig, RESIDUAL_MAX_ERROR, RESIDUAL_NONE,
                      RESIDUAL_RELATIVE_ERROR, decode)
from ebcc_tpu import native as native_mod


@pytest.fixture(scope="module")
def compat():
    pytest.importorskip("PIL")
    from PIL import features
    if not features.check("jpg_2000"):
        pytest.skip("Pillow lacks JPEG2000 support")
    try:
        native_mod.load()
    except (RuntimeError, FileNotFoundError, subprocess.CalledProcessError):
        pytest.skip("native toolchain unavailable")
    from ebcc_tpu import compat as c
    return c


@pytest.fixture(scope="module")
def frame(base_test_data):
    return np.ascontiguousarray(base_test_data[:256, :384])


# ---------------------------------------------------------------------------
# SPIHT mirror properties
# ---------------------------------------------------------------------------

def test_spiht_roundtrip_and_truncation(compat, frame):
    norm = ((frame - frame.min()) / (frame.max() - frame.min()))
    norm = norm.astype(np.float32)
    blob = native_mod.spiht_encode(norm, trunc_bits=0, num_stages=3)
    full = native_mod.spiht_decode(blob, *norm.shape, len(blob) * 8)
    # 255-scale quantization + coefficient-truncation floor of the
    # reference design (floor-quantized coefficients through 3 idwt levels)
    assert np.abs(full - norm).max() < 0.05
    # embedded property: prefix decode error decays monotonically (within
    # a small tolerance for plane-boundary effects)
    errs = []
    for frac in (0.05, 0.2, 0.5, 1.0):
        nbytes = max(20, int(len(blob) * frac))
        out = native_mod.spiht_decode(blob[:nbytes], *norm.shape, nbytes * 8)
        errs.append(np.abs(out - norm).max())
    assert errs == sorted(errs, reverse=True)
    assert errs[0] > errs[-1]


def test_spiht_budgeted_encode_respects_budget(compat, frame):
    norm = ((frame - frame.min()) / (frame.max() - frame.min()))
    norm = norm.astype(np.float32)
    blob = native_mod.spiht_encode(norm, trunc_bits=30000, num_stages=3)
    assert len(blob) <= 30000 // 8 + 20  # budget + header slack


def test_spiht_rejects_garbage(compat):
    with pytest.raises(ValueError):
        native_mod.spiht_decode(b"not an ims stream" * 10, 64, 64, 800)


# ---------------------------------------------------------------------------
# Frame streams
# ---------------------------------------------------------------------------

def test_legacy_frame_bound_and_header(compat, frame):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(frame, cfg)
    assert blob[:4] == b"EBCC" and blob[4] == 1  # magic + version
    out = compat.decode_frame(blob)
    assert out.shape == frame.shape
    assert np.abs(out - frame).max() <= 0.5
    assert frame.nbytes / len(blob) > 5


def test_legacy_relative_error(compat, frame):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_RELATIVE_ERROR, error=0.01)
    blob = compat.encode_frame(frame, cfg)
    out = compat.decode_frame(blob)
    rng = float(frame.max() - frame.min())
    assert np.abs(out - frame).max() <= 0.01 * rng


def test_legacy_rate_only(compat, frame):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=50,
                      residual_mode=RESIDUAL_NONE)
    blob = compat.encode_frame(frame, cfg)
    achieved = frame.nbytes / len(blob)
    assert 0.8 * 50 < achieved < 1.5 * 50
    out = compat.decode_frame(blob)
    assert np.isfinite(out).all()


def test_legacy_const_field(compat):
    c = np.full((1, 64, 64), -7.5, np.float32)
    cfg = CodecConfig(dims=(1, 64, 64), base_cr=10,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
    blob = compat.encode_frame(c, cfg)
    assert len(blob) == 56  # 48-byte header + u64 count
    out = compat.decode_frame(blob)
    assert (out == -7.5).all() and out.size == c.size


def test_legacy_multiframe_tiled(compat, frame):
    stack = np.stack([frame[:128, :128] + i for i in range(4)])
    cfg = CodecConfig(dims=stack.shape, base_cr=20,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(stack, cfg)
    out = compat.decode_frame(blob).reshape(stack.shape)
    assert np.abs(out - stack).max() <= 0.5


def test_legacy_nan_raises(compat):
    bad = np.zeros((1, 64, 64), np.float32)
    bad[0, 3, 4] = np.nan
    cfg = CodecConfig(dims=(1, 64, 64), base_cr=10,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
    with pytest.raises(ValueError):
        compat.encode_frame(bad, cfg)


def test_legacy_decode_rejects_corrupt(compat, frame):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(frame, cfg)
    with pytest.raises(ValueError):
        compat.decode_frame(blob[:40])  # truncated header
    with pytest.raises(ValueError):
        compat.decode_frame(blob[:-10])  # truncated payload
    tampered = bytearray(blob)
    tampered[16:24] = struct.pack("<Q", 1 << 60)  # absurd coeffs_size
    with pytest.raises(ValueError):
        compat.decode_frame(bytes(tampered))


# ---------------------------------------------------------------------------
# Containers + dispatch
# ---------------------------------------------------------------------------

def test_legacy_container_roundtrip(compat, frame):
    data = np.stack([frame + i for i in range(3)])
    cfg = CodecConfig(dims=data.shape, base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5,
                      chunk_dims=(1, 160, 384))  # padded edge chunks
    blob = compat.encode_chunked(data, cfg)
    assert blob[:4] == b"EBCK"
    out = compat.decode_container(blob)
    assert out.shape == data.shape
    assert np.abs(out - data).max() <= 0.5


def test_legacy_compat_rel_to_max(compat, frame):
    data = frame[None]
    cfg = CodecConfig(dims=data.shape, base_cr=30,
                      residual_mode=RESIDUAL_RELATIVE_ERROR, error=0.005)
    blob = compat.encode_chunked_compat(data, cfg)
    out = compat.decode(blob).reshape(data.shape)
    rng = float(data.max() - data.min())
    assert np.abs(out - data).max() <= 0.005 * rng


def test_main_decode_dispatches_legacy(compat, frame):
    """ebcc_tpu.decode() must accept reference-format streams directly."""
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(frame, cfg)
    out = decode(blob).reshape(frame.shape)
    assert np.abs(out - frame).max() <= 0.5
    cblob = compat.encode_chunked(frame[None], CodecConfig(
        dims=(1, *frame.shape), base_cr=30,
        residual_mode=RESIDUAL_MAX_ERROR, error=0.5))
    out2 = decode(cblob).reshape(frame.shape)
    assert np.abs(out2 - frame).max() <= 0.5


def test_legacy_unversioned_layout(compat, frame):
    """The pre-"EBCC" layout (ebcc_decode_legacy, c:1147-1213): rebuild a
    v1 stream into the unversioned framing and decode it."""
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(frame, cfg)
    (_, _, _, _, min_bits, max_bits, coeffs_size, rmin_bits, rmax_bits,
     comp_size, tail_size) = struct.unpack_from("<4sBBHIIQIIQQ", blob)
    payload = blob[48:]
    old = struct.pack("<ffQffQ",
                      np.uint32(min_bits).view(np.float32),
                      np.uint32(max_bits).view(np.float32),
                      coeffs_size,
                      np.uint32(rmin_bits).view(np.float32),
                      np.uint32(rmax_bits).view(np.float32),
                      comp_size) + payload
    out = compat.decode(old).reshape(frame.shape)
    # mean adjustment is folded into min/max identically, so the bound holds
    assert np.abs(out - frame).max() <= 0.5


def test_legacy_env_pure_base_disable(compat, frame, monkeypatch):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    monkeypatch.setenv("EBCC_DISABLE_PURE_BASE_COMPRESSION_FALLBACK", "1")
    blob = compat.encode_frame(frame, cfg)
    out = compat.decode_frame(blob)
    assert np.abs(out - frame).max() <= 0.5
    monkeypatch.delenv("EBCC_DISABLE_PURE_BASE_COMPRESSION_FALLBACK")
    blob2 = compat.encode_frame(frame, cfg)
    # with the fallback enabled the stream can only get smaller or equal
    assert len(blob2) <= len(blob)


# ---------------------------------------------------------------------------
# Writer-layout pinning against an INDEPENDENT parse + raw Pillow decode
# (round-2 VERDICT #7: every legacy writer path decodes via Pillow/OpenJPEG
# without going through compat's own reader)
# ---------------------------------------------------------------------------

def _independent_decode_frame(blob, shape):
    """Parse an EBCC v1 frame stream per the REFERENCE layout (48-byte
    header, ebcc_codec.c:190-202) with nothing from compat.legacy, decode
    the J2K tail with raw Pillow, and re-apply residual + rescale."""
    import io
    import zstandard
    from PIL import Image

    (magic, version, flags, _r, min_b, max_b, coeffs_size, rmin_b, rmax_b,
     comp_size, tail_size) = struct.unpack_from("<4sBBHIIQIIQQ", blob)
    assert magic == b"EBCC" and version == 1
    assert 48 + comp_size + tail_size == len(blob)
    minval = np.uint32(min_b).view(np.float32)
    maxval = np.uint32(max_b).view(np.float32)
    if flags & 1:  # const field
        (tot,) = struct.unpack("<Q", blob[48 + comp_size:][:8])
        return np.full(int(tot), minval, np.float32).reshape(shape)
    tail = blob[48 + comp_size:]
    arr = np.asarray(Image.open(io.BytesIO(tail)))
    assert arr.dtype == np.uint16 and arr.ndim == 2
    out = (arr.astype(np.float32) / np.float32(65535)
           * (maxval - minval) + minval)
    if comp_size and coeffs_size:
        coeffs = zstandard.ZstdDecompressor().decompress(
            blob[48:48 + comp_size], max_output_size=int(coeffs_size))
        norm = native_mod.spiht_decode(coeffs, out.shape[0], out.shape[1],
                                       int(coeffs_size) * 8)
        out += (norm * (np.uint32(rmax_b).view(np.float32)
                        - np.uint32(rmin_b).view(np.float32))
                + np.uint32(rmin_b).view(np.float32))
    return out.reshape(shape)


def test_writer_single_frame_independent_decode(compat, frame):
    cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(frame, cfg)
    out = _independent_decode_frame(blob, frame.shape)
    assert np.abs(out - frame).max() <= 0.5
    np.testing.assert_array_equal(
        out, compat.decode_frame(blob).reshape(frame.shape))


def test_writer_multiframe_tiled_independent_decode(compat, frame):
    data = np.stack([frame, frame + 0.5, frame * 1.01])
    cfg = CodecConfig(dims=data.shape, base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
    blob = compat.encode_frame(data, cfg)
    flat = _independent_decode_frame(
        blob, (data.shape[0] * data.shape[1], data.shape[2]))
    out = flat.reshape(data.shape)
    assert np.abs(out - data).max() <= 0.5
    np.testing.assert_array_equal(
        out.reshape(-1), compat.decode(blob).reshape(-1))


def test_writer_container_independent_decode(compat, frame):
    data = frame[None]
    cfg = CodecConfig(dims=data.shape, base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.5,
                      chunk_dims=(1, 128, 128))
    blob = compat.encode_chunked(data, cfg)
    (magic, version, ndims, _r, d0, d1, d2, c0, c1, c2, nchunks,
     csize) = struct.unpack_from("<4sIII3Q3QQQ", blob)
    assert magic == b"EBCK" and version == 1 and ndims == 3
    assert (d0, d1, d2) == data.shape and (c0, c1, c2) == (1, 128, 128)
    # walk [u64 size | frame stream] records; every record must decode
    # independently
    off = 80
    n = 0
    while off < len(blob):
        (sz,) = struct.unpack_from("<Q", blob, off)
        off += 8
        rec = blob[off:off + sz]
        off += sz
        sub = _independent_decode_frame(rec, (-1,))
        assert sub.size in (128 * 128,)
        n += 1
    assert n == nchunks == 6  # ceil(256/128) * ceil(384/128)
    out = compat.decode(blob).reshape(data.shape)
    assert np.abs(out - data).max() <= 0.5


def test_writer_const_field_independent_decode(compat):
    data = np.full((1, 64, 64), 3.25, np.float32)
    cfg = CodecConfig(dims=data.shape, base_cr=30,
                      residual_mode=RESIDUAL_MAX_ERROR, error=0.01)
    blob = compat.encode_frame(data, cfg)
    out = _independent_decode_frame(blob, data.shape)
    np.testing.assert_array_equal(out, data)


# ---------------------------------------------------------------------------
# Legacy decoder fuzz (decode posture parity: ebcc_codec.c:1226-1258 —
# exceptions only, never crashes or garbage-length output)
# ---------------------------------------------------------------------------

class TestLegacyDecoderFuzz:
    @pytest.fixture(scope="class")
    def legacy_stream(self, compat, frame):
        cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                          residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
        return compat.encode_frame(frame, cfg)

    def _try(self, compat, blob, frame):
        try:
            out = compat.decode(bytes(blob))
        except Exception:
            return  # loud failure is the contract
        # silent success must at least produce a sane array
        assert out.size <= 4 * frame.size

    def test_truncations(self, compat, legacy_stream, frame):
        for cut in (0, 3, 47, 48, 60, len(legacy_stream) // 2,
                    len(legacy_stream) - 1):
            self._try(compat, legacy_stream[:cut], frame)

    def test_byte_flips(self, compat, legacy_stream, frame):
        rng = np.random.default_rng(0)
        buf = bytearray(legacy_stream)
        for _ in range(64):
            i = int(rng.integers(0, len(buf)))
            old = buf[i]
            buf[i] ^= int(rng.integers(1, 256))
            self._try(compat, buf, frame)
            buf[i] = old

    def test_header_field_garbage(self, compat, legacy_stream, frame):
        rng = np.random.default_rng(1)
        for off in (4, 5, 6, 8, 16, 24, 32, 40):
            buf = bytearray(legacy_stream)
            buf[off:off + 4] = rng.bytes(4)
            self._try(compat, buf, frame)

    def test_random_garbage(self, compat, frame):
        rng = np.random.default_rng(2)
        for size in (0, 4, 48, 200):
            blob = bytearray(rng.bytes(size))
            blob[:4] = b"EBCC"
            self._try(compat, blob, frame)
            blob[:4] = b"EBCK"
            self._try(compat, blob, frame)

    def test_container_truncations(self, compat, frame):
        cfg = CodecConfig(dims=(1, *frame.shape), base_cr=30,
                          residual_mode=RESIDUAL_MAX_ERROR, error=0.5,
                          chunk_dims=(1, 128, 128))
        blob = compat.encode_chunked(frame[None], cfg)
        for cut in (10, 79, 80, 88, 200, len(blob) - 3):
            self._try(compat, blob[:cut], frame)
