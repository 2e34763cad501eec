"""Competitive/consistency comparison benchmarks.

Parity role: reference tests/benchmarks/test_comparison_benchmarks.py
compares EBCC against SPERR/SZ/SZ3 through hdf5plugin/enstools (env-gated
there; those codecs are not in this image, so the suite gates the same
way).  Always-on comparisons here: the batched TPU codec vs (a) this
package's own native serial C++ codec — the architectural stand-in for the
reference's serial C codec — and (b) lossless zstd, which any error-bounded
codec must beat at nontrivial bounds.
"""

import subprocess
import time

import numpy as np
import pytest

from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR, decode, encode
from ebcc_tpu import native as native_mod


@pytest.fixture(scope="module")
def native():
    try:
        native_mod.load()
    except (RuntimeError, FileNotFoundError, subprocess.CalledProcessError):
        pytest.skip("native toolchain unavailable")
    return native_mod


def test_tpu_vs_native_serial_cr(native, base_test_data):
    """Equal bounds => comparable stream sizes (same algorithm family)."""
    data = np.ascontiguousarray(base_test_data[:256, :256])[None]
    config = CodecConfig(dims=data.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
    blob_tpu = encode(data, config)
    blob_nat = native.native_encode(data, config)
    for blob in (blob_tpu, blob_nat):
        out = decode(blob).reshape(data.shape)
        assert np.abs(out - data).max() <= 0.1
    ratio = len(blob_nat) / len(blob_tpu)
    assert 0.8 < ratio < 1.25, (len(blob_tpu), len(blob_nat))


def test_batched_vs_serial_throughput_sane(native, base_test_data):
    """Consistency floor on the CPU mesh: the batched path must stay within
    a small factor of the serial native codec here (the devices comparison —
    where the batched path wins by 1-2 orders of magnitude — is bench.py's
    job on real hardware).  Notably the serial NATIVE codec itself already
    runs ~2.5x faster than the reference C codec's recorded speeds: the
    cut-scan search needs no J2K re-encode trials."""
    frames = np.stack([base_test_data[:256, :256] + i for i in range(8)])
    config = CodecConfig(dims=frames.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                         chunk_dims=(1, 256, 256))
    from ebcc_tpu import encode_chunked

    encode_chunked(frames, config)  # warm compile

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_batched = best_of(lambda: encode_chunked(frames, config))
    t_serial = best_of(lambda: native.native_encode_chunked(frames, config))
    # The native serial codec is itself heavily optimized (warm-started cut
    # searches run ~12 Mpts/s on this box); 8x is the consistency floor for
    # the XLA:CPU batched path, which exists for TPUs, not this comparison.
    assert t_batched < t_serial * 8, (t_batched, t_serial)


def test_beats_lossless_zstd(base_test_data):
    import zstandard

    data = np.ascontiguousarray(base_test_data[:256, :256])[None]
    lossless = zstandard.ZstdCompressor(level=9).compress(data.tobytes())
    config = CodecConfig(dims=data.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=0.01)
    blob = encode(data, config)
    assert len(blob) < len(lossless)


def test_against_third_party_codecs(base_test_data, tmp_path):
    """Competitive comparison vs SZ3 and SZ at an equal absolute bound
    (reference data/logs.txt rows; its suite reaches them through
    hdf5plugin/enstools).  Gated on hdf5plugin (installed in CI; not in
    every image).  Asserts: both respect the bound, and this codec's
    stream is within 25% of (typically smaller than) the better of the
    two on the real ERA5 frame."""
    hdf5plugin = pytest.importorskip("hdf5plugin")
    h5py = pytest.importorskip("h5py")

    data = base_test_data.astype(np.float32)
    target = 0.5
    sizes = {}
    for name, filt in (
        ("sz3", getattr(hdf5plugin, "SZ3", None)),
        ("sz", getattr(hdf5plugin, "SZ", None)),
        ("sperr", getattr(hdf5plugin, "Sperr", None)),
    ):
        if filt is None:
            continue
        path = tmp_path / f"{name}.h5"
        try:
            with h5py.File(path, "w") as f:
                f.create_dataset("v", data=data,
                                 **filt(absolute=target))
            with h5py.File(path, "r") as f:
                out = f["v"][...]
        except Exception:
            continue  # codec missing from this hdf5plugin build
        assert np.abs(out - data).max() <= target * 1.05, name
        sizes[name] = path.stat().st_size
    if not sizes:
        pytest.skip("no SZ-family codec usable in this hdf5plugin build")

    config = CodecConfig(dims=(1,) + data.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=target,
                         entropy_backend="auto")
    blob = encode(data[None], config)
    out = decode(blob).reshape(data.shape)
    assert np.abs(out - data).max() <= target
    best = min(sizes.values())
    assert len(blob) < best * 1.25, (len(blob), sizes)


def test_against_sperr(base_test_data, tmp_path):
    """SPERR at an equal absolute bound (reference
    tests/benchmarks/compress_sperr.py:1-19 drives hdf5plugin.Sperr with
    absolute=10.0 on the ERA5 geopotential cube; its recorded size there
    was 6.18 MB vs EBCC's 1.81, data/logs.txt:17-20).  Gated on an
    hdf5plugin build that actually ships the Sperr filter; skips here,
    activates in CI the moment the plugin lands.  Contract: both codecs
    respect the bound, and this codec's stream is no larger than SPERR's
    (the reference beats SPERR 3.4x at this operating point — matching it
    is the loosest defensible floor)."""
    hdf5plugin = pytest.importorskip("hdf5plugin")
    h5py = pytest.importorskip("h5py")
    sperr = getattr(hdf5plugin, "Sperr", None)
    if sperr is None:
        pytest.skip("hdf5plugin build has no Sperr filter")

    data = base_test_data.astype(np.float32)
    target = 0.5
    path = tmp_path / "sperr.h5"
    try:
        with h5py.File(path, "w") as f:
            f.create_dataset("v", data=data, chunks=data.shape,
                             **sperr(absolute=target))
        with h5py.File(path, "r") as f:
            out = f["v"][...]
    except Exception as e:
        pytest.skip(f"Sperr filter unusable in this build: {e!r}")
    assert np.abs(out - data).max() <= target * 1.05
    sperr_size = path.stat().st_size

    config = CodecConfig(dims=(1,) + data.shape, base_cr=30,
                         residual_mode=RESIDUAL_MAX_ERROR, error=target,
                         entropy_backend="auto")
    blob = encode(data[None], config)
    ours = decode(blob).reshape(data.shape)
    assert np.abs(ours - data).max() <= target
    assert len(blob) <= sperr_size, (len(blob), sperr_size)
