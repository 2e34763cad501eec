"""Property sweep A/B vs the REFERENCE binary (round-3 VERDICT #4).

Broadens tests/test_reference_ab.py's five fixed scenarios into a
parametrized matrix: randomized/odd shapes (up to the full 721x1440 ERA5
frame), targets across three decades, modes NONE/MAX_ERROR/RELATIVE_ERROR,
plain + EBCK + compat + unversioned-legacy layouts, BOTH directions —
plus the reference's own container edge cases
(/root/reference/tests/test_c_api.py:174-300) re-run against the live
reference binary built from its unmodified sources
(compat/reference_bin.py).

Bit-identity contract: on any stream either side produced, our legacy
decoder and the reference decoder share the parse, the J2K library
(libopenjp2 via Pillow on both sides of the shim) and a bit-exact SPIHT
mirror — so their float outputs must agree EXACTLY, not approximately.

Bound semantics: the reference's feasibility check runs before its
mean-error adjustment (ebcc_codec.c:783 vs 863-868), so reference-encoded
streams may overshoot the target slightly; its own suite tolerates 1.5x
(reference tests/benchmarks/test_compression_benchmarks.py:43).  Our
writer verifies post-adjustment, so ours-encoded assertions stay exact.
"""

import struct

import numpy as np
import pytest

from ebcc_tpu import CodecConfig

MODE_NONE, MODE_MAX, MODE_REL = 0, 1, 2


@pytest.fixture(scope="module")
def ref():
    rb = pytest.importorskip("ebcc_tpu.compat.reference_bin")
    try:
        rb.load()
    except Exception as e:
        pytest.skip(f"reference binary unavailable: {e}")
    return rb


@pytest.fixture(scope="module")
def compat():
    pytest.importorskip("PIL")
    from ebcc_tpu import compat as c
    from ebcc_tpu import native as native_mod
    try:
        native_mod.load()
    except Exception:
        pytest.skip("native toolchain unavailable")
    return c


def synth(shape, seed):
    """Smooth synthetic field + mild noise: the reference's ramp family
    (test_c_api.py make_data) with a randomized orientation, normalized to
    a fixed range of 100 so every error target in the sweep stays FEASIBLE
    (the codec family's hard floor is the uint16 scaling step range/65535
    ~= 0.0015 here; an unnormalized steep ramp can push that step past the
    tightest targets and turn the test into a best-effort lottery)."""
    rng = np.random.default_rng(seed)
    idx = np.indices(shape, dtype=np.float32)
    a, b, c = rng.uniform(0.2, 100.0, 3).astype(np.float32)
    data = idx[0] * a + idx[1] * b + idx[2] * c
    lo, hi = float(data.min()), float(data.max())
    data = (data - lo) * (100.0 / max(hi - lo, 1e-9))
    data += rng.normal(scale=0.25, size=shape).astype(np.float32)
    return np.ascontiguousarray(data, np.float32)


def era5(shape):
    base = np.load("/root/reference/data/test_data.npy").astype(np.float32)
    d0, h, w = shape
    out = np.stack([base[:h, :w] + 0.3 * i for i in range(d0)])
    return np.ascontiguousarray(out)


def abs_bound(data, mode, error):
    if mode == MODE_REL:
        return error * float(data.max() - data.min())
    return error


# ---------------------------------------------------------------------------
# Randomized shape/target/mode sweep, plain frame streams, both directions
# ---------------------------------------------------------------------------

SWEEP = [
    # (shape, mode, error, era5?) — shapes include odd sizes and the full
    # ERA5 frame; targets span 3 decades; all three residual modes.
    ((1, 64, 64), MODE_MAX, 0.05, False),
    ((1, 64, 64), MODE_MAX, 5.0, False),
    ((1, 97, 131), MODE_MAX, 0.5, False),
    ((1, 97, 131), MODE_REL, 0.01, False),
    ((2, 129, 65), MODE_MAX, 0.5, False),
    ((2, 129, 65), MODE_REL, 0.001, False),
    ((3, 48, 80), MODE_MAX, 0.05, False),
    ((3, 48, 80), MODE_NONE, 0.0, False),
    ((1, 256, 384), MODE_MAX, 0.5, True),
    ((1, 256, 384), MODE_MAX, 0.005, True),
    ((1, 256, 384), MODE_REL, 0.01, True),
    ((1, 256, 384), MODE_NONE, 0.0, True),
    ((2, 173, 211), MODE_MAX, 0.5, True),
    ((1, 721, 1440), MODE_MAX, 0.5, True),   # the full BASELINE frame
]


@pytest.mark.parametrize("shape,mode,error,use_era5", SWEEP)
def test_reference_stream_sweep(ref, compat, shape, mode, error, use_era5):
    """reference encode -> both decoders bit-agree; bound (ref semantics)."""
    data = era5(shape) if use_era5 else synth(shape, hash(shape) & 0xFFFF)
    blob = ref.encode(data, base_cr=30, mode=mode, error=error)
    ours = compat.decode(blob).reshape(data.shape)
    theirs = ref.decode(blob).reshape(data.shape)
    np.testing.assert_array_equal(ours, theirs)
    assert np.isfinite(ours).all()
    if mode != MODE_NONE:
        assert np.abs(ours - data).max() <= 1.5 * abs_bound(data, mode, error)


# Ours -> reference: REL was previously untested in this direction
# (round-3 VERDICT weak#5); exact bound on our writer.
OUR_SWEEP = [
    ((1, 64, 64), MODE_MAX, 0.05, False),
    ((1, 97, 131), MODE_MAX, 0.5, False),
    ((1, 97, 131), MODE_REL, 0.01, False),
    ((2, 129, 65), MODE_MAX, 5.0, False),
    ((3, 48, 80), MODE_NONE, 0.0, False),
    ((1, 256, 384), MODE_REL, 0.001, True),
    ((1, 256, 384), MODE_MAX, 0.05, True),
    ((1, 721, 1440), MODE_MAX, 0.5, True),
]


@pytest.mark.parametrize("shape,mode,error,use_era5", OUR_SWEEP)
def test_our_stream_sweep(ref, compat, shape, mode, error, use_era5):
    """our legacy writer -> reference decoder; bound exact; decoders agree."""
    data = era5(shape) if use_era5 else synth(shape, hash(shape) & 0xFFFF)
    cfg = CodecConfig(dims=shape, base_cr=30, residual_mode=mode, error=error)
    blob = compat.encode_frame(data, cfg)
    out = ref.decode(blob).reshape(data.shape)
    np.testing.assert_array_equal(out, compat.decode(blob).reshape(data.shape))
    if mode != MODE_NONE:
        assert np.abs(out - data).max() <= abs_bound(data, mode, error)


def test_our_unversioned_stream_decodes_with_reference(ref, compat):
    """Rewrap our v1 stream into the pre-"EBCC" unversioned framing
    (ebcc_decode_legacy, reference c:1147-1213) and feed it to the
    REFERENCE decoder — previously only our own decoder was tested on it."""
    data = era5((1, 256, 384))
    cfg = CodecConfig(dims=data.shape, base_cr=30, residual_mode=MODE_MAX,
                      error=0.5)
    blob = compat.encode_frame(data, cfg)
    (_, _, _, _, min_bits, max_bits, coeffs_size, rmin_bits, rmax_bits,
     comp_size, tail_size) = struct.unpack_from("<4sBBHIIQIIQQ", blob)
    old = struct.pack("<ffQffQ",
                      np.uint32(min_bits).view(np.float32),
                      np.uint32(max_bits).view(np.float32),
                      coeffs_size,
                      np.uint32(rmin_bits).view(np.float32),
                      np.uint32(rmax_bits).view(np.float32),
                      comp_size) + blob[48:]
    out = ref.decode(old).reshape(data.shape)
    assert np.abs(out - data).max() <= 0.5
    np.testing.assert_array_equal(out, compat.decode(old).reshape(data.shape))


# ---------------------------------------------------------------------------
# Container edge cases (reference tests/test_c_api.py:174-300), run against
# the live reference binary; our decoder must bit-agree on every layout.
# ---------------------------------------------------------------------------

def _header(compat, blob):
    from ebcc_tpu.compat import legacy
    return legacy._CHUNK_HEADER.unpack(blob[:legacy._CHUNK_HEADER.size])


CONTAINER_CASES = [
    # (shape, chunk_dims, expected_chunk_dims, num_chunks)
    ((2, 32, 32), (1, 32, 32), (1, 32, 32), 2),     # slab split
    ((3, 33, 35), (2, 32, 32), (2, 32, 32), 8),     # padded edge chunks
    ((2, 32, 32), (4, 32, 32), (4, 32, 32), 1),     # contiguous chunk > dim
    ((2, 33, 35), (1, 64, 64), (1, 64, 64), 2),     # non-contig chunk > dim
    ((2, 32, 32), (0, 0, 0), (2, 32, 32), 1),       # zero dims -> full array
]


@pytest.mark.parametrize("shape,chunk,want_chunk,want_n", CONTAINER_CASES)
def test_reference_container_edge_cases(ref, compat, shape, chunk,
                                        want_chunk, want_n):
    data = synth(shape, 7)
    blob = ref.encode(data, base_cr=2.0, mode=MODE_MAX, error=0.01,
                      chunked="chunking", chunk_dims=chunk)
    (magic, version, ndims, _, d0, d1, d2, c0, c1, c2, num_chunks,
     chunk_size) = _header(compat, blob)
    assert magic == b"EBCK" and version == 1 and ndims == 3
    assert (d0, d1, d2) == shape
    assert (c0, c1, c2) == want_chunk
    assert num_chunks == want_n
    assert chunk_size == int(np.prod(want_chunk))
    ours = compat.decode(blob).reshape(shape)
    theirs = ref.decode(blob, chunked=True).reshape(shape)
    np.testing.assert_array_equal(ours, theirs)
    assert np.abs(ours - data).max() <= 1.5 * 0.01


@pytest.mark.parametrize("shape,chunk,want_chunk,want_n", CONTAINER_CASES)
def test_our_container_edge_cases_decode_with_reference(
        ref, compat, shape, chunk, want_chunk, want_n):
    """Mirror direction: our chunked writer's container on the same grids
    must parse and decode with the reference's chunked decoder."""
    data = synth(shape, 11)
    cfg = CodecConfig(dims=shape, base_cr=2.0, residual_mode=MODE_MAX,
                      error=0.01,
                      chunk_dims=shape if chunk == (0, 0, 0) else chunk)
    blob = compat.encode_chunked(data, cfg)
    out = ref.decode(blob, chunked=True).reshape(shape)
    np.testing.assert_array_equal(
        out, compat.decode(blob).reshape(shape))
    assert np.abs(out - data).max() <= 0.01


def test_reference_compat_default_tiling(ref, compat):
    """compat mode, zero chunk dims -> internal (1, <=1024, <=1024) tiles:
    a 2048-row array splits into (1, 1024, 32) x 2 (reference
    test_c_api.py:260-273)."""
    shape = (1, 2048, 32)
    data = synth(shape, 3)
    blob = ref.encode(data, base_cr=2.0, mode=MODE_NONE, error=0.0,
                      chunked="compat")
    (_, _, _, _, d0, d1, d2, c0, c1, c2, num_chunks, chunk_size) = \
        _header(compat, blob)
    assert (c0, c1, c2) == (1, 1024, 32)
    assert num_chunks == 2 and chunk_size == 1024 * 32
    np.testing.assert_array_equal(
        compat.decode(blob).reshape(shape),
        ref.decode(blob, chunked=True).reshape(shape))


def test_reference_compat_rel_to_max(ref, compat):
    """compat mode converts RELATIVE to MAX via the GLOBAL range before
    chunking (reference c:1078-1087) so the bound is uniform across
    chunks."""
    shape = (2, 32, 32)
    data = synth(shape, 5)
    rel = 0.01
    blob = ref.encode(data, base_cr=2.0, mode=MODE_REL, error=rel,
                      chunked="compat")
    (_, _, _, _, _, _, _, c0, c1, c2, num_chunks, _) = _header(compat, blob)
    assert (c0, c1, c2) == (1, 32, 32) and num_chunks == 2
    ours = compat.decode(blob).reshape(shape)
    np.testing.assert_array_equal(
        ours, ref.decode(blob, chunked=True).reshape(shape))
    rng = float(data.max() - data.min())
    assert np.abs(ours - data).max() <= 1.5 * rel * rng


def test_reference_chunked_decoder_accepts_plain_payload(ref, compat):
    """A plain EBCC frame stream is accepted by the chunked decoder on
    both sides (magic dispatch, reference c:1326-1329)."""
    shape = (2, 32, 32)
    data = synth(shape, 9)
    blob = ref.encode(data, base_cr=2.0, mode=MODE_MAX, error=0.01)
    assert not blob.startswith(b"EBCK")
    theirs = ref.decode(blob, chunked=True).reshape(shape)
    np.testing.assert_array_equal(
        compat.decode(blob).reshape(shape), theirs)
    assert np.abs(theirs - data).max() <= 1.5 * 0.01


def test_our_compat_container_decodes_with_reference(ref, compat):
    """Our encode_chunked_compat (default tiling + global REL->MAX) must
    decode with the reference's chunked decoder."""
    shape = (2, 64, 48)
    data = synth(shape, 13)
    cfg = CodecConfig(dims=shape, base_cr=2.0, residual_mode=MODE_REL,
                      error=0.01)
    blob = compat.encode_chunked_compat(data, cfg)
    out = ref.decode(blob, chunked=True).reshape(shape)
    np.testing.assert_array_equal(out, compat.decode(blob).reshape(shape))
    rng = float(data.max() - data.min())
    assert np.abs(out - data).max() <= 0.01 * rng
