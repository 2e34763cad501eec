"""Pointwise-relative error mode (RESIDUAL_POINTWISE_RELATIVE_ERROR).

Beyond-reference capability (its enum stops at range-relative,
ebcc_codec.h:23-27): bound |x̂ - x| <= eps * |x| on EVERY sample — what
magnitude-spanning fields (humidity, ozone, precipitation) need, where a
range-relative bound lets small values drown.  Implemented as a
log-domain MAX_ERROR encode (stream flag bit6) with the float32 log/exp
margin subtracted from the target, so the existing scans guarantee the
bound exactly; temporal and allow_nan compose unchanged.
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import CodecConfig, decode, decode_chunked, encode, encode_chunked
from ebcc_tpu.config import (
    RESIDUAL_POINTWISE_RELATIVE_ERROR,
    RESIDUAL_RELATIVE_ERROR,
)
from ebcc_tpu.core import stream


@pytest.fixture(scope="module")
def humidity_like():
    """A strictly positive field spanning ~5 orders of magnitude (the
    specific-humidity shape this mode exists for)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:144, 0:256].astype(np.float32)
    logf = (-8 + 6 * np.sin(yy / 23) * np.cos(xx / 31)
            + 0.3 * rng.normal(size=(144, 256)))
    return np.exp(logf).astype(np.float32)


def _cfg(shape, eps, **kw):
    return CodecConfig(dims=shape, error=eps,
                       residual_mode=RESIDUAL_POINTWISE_RELATIVE_ERROR, **kw)


class TestPointwiseBound:
    @pytest.mark.parametrize("eps", [1e-1, 1e-2, 1e-3])
    def test_bound_every_sample(self, humidity_like, eps):
        x = humidity_like[None]
        blob = encode(x, _cfg(x.shape, eps))
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.log_domain
        out = decode(blob)
        assert (np.abs(out - x) / x).max() <= eps

    def test_range_relative_cannot(self, humidity_like):
        """The motivating comparison: range-relative at the same fraction
        violates the pointwise bound by orders of magnitude here."""
        x = humidity_like[None]
        eps = 1e-2
        blob = encode(x, CodecConfig(dims=x.shape, error=eps,
                                     residual_mode=RESIDUAL_RELATIVE_ERROR))
        out = decode(blob)
        assert (np.abs(out - x) / x).max() > 10 * eps

    def test_positivity_required(self, humidity_like):
        x = humidity_like[None] - 0.5
        with pytest.raises(ValueError):
            encode(x, _cfg(x.shape, 1e-2))
        z = humidity_like[None].copy()
        z[0, 0, 0] = 0.0
        with pytest.raises(ValueError):
            encode(z, _cfg(z.shape, 1e-2))

    def test_error_fraction_validated(self):
        with pytest.raises(ValueError):
            CodecConfig(dims=(1, 64, 64), error=1.5,
                        residual_mode=RESIDUAL_POINTWISE_RELATIVE_ERROR)
        with pytest.raises(ValueError):
            CodecConfig(dims=(1, 64, 64), error=0.0,
                        residual_mode=RESIDUAL_POINTWISE_RELATIVE_ERROR)
        with pytest.raises(ValueError):
            # below the float32 log/exp margin
            encode(np.ones((1, 64, 64), np.float32) + 0.5,
                   _cfg((1, 64, 64), 1e-6))

    def test_tiny_magnitudes(self):
        """Near-denormal values still meet the bound (log handles them)."""
        rng = np.random.default_rng(1)
        x = (10.0 ** rng.uniform(-30, -20, (1, 64, 64))).astype(np.float32)
        eps = 1e-2
        out = decode(encode(x, _cfg(x.shape, eps)))
        assert (np.abs(out - x) / x).max() <= eps


class TestPointwiseComposition:
    def test_chunked_and_temporal(self, humidity_like):
        frames = np.stack([humidity_like * np.float32(1 + 0.01 * t)
                           for t in range(4)])
        eps = 1e-2
        cfg = _cfg(frames.shape, eps, temporal=True,
                   chunk_dims=(4, 144, 128))
        blob = encode_chunked(frames, cfg)
        hd = stream.split_frame_stream(stream.iter_chunked(blob)[1][0])[0]
        assert hd.log_domain and hd.temporal
        out = decode_chunked(blob)
        assert (np.abs(out - frames) / frames).max() <= eps

    def test_masked(self, humidity_like):
        x = humidity_like[None].copy()
        m = np.random.default_rng(2).random(x.shape) < 0.15
        x[m] = np.nan
        eps = 1e-2
        out = decode(encode(x, _cfg(x.shape, eps, allow_nan=True)))
        assert np.isnan(out[m]).all()
        valid = ~m
        ref = humidity_like[None]
        assert (np.abs(out[valid] - ref[valid]) / ref[valid]).max() <= eps

    def test_streaming_pipeline_byte_identical(self, humidity_like):
        import io as _io

        from ebcc_tpu.io import pipeline
        frames = np.stack([humidity_like * np.float32(1 + 0.01 * t)
                           for t in range(3)])
        cfg = _cfg(frames.shape, 1e-2, chunk_dims=(1, 144, 256))
        buf = _io.BytesIO()
        pipeline.compress_stream(frames, cfg, buf)
        assert buf.getvalue() == encode_chunked(frames, cfg)

    def test_sharded(self, humidity_like):
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices (virtual CPU mesh)")
        from ebcc_tpu.parallel import (decode_chunked_sharded,
                                       encode_chunked_sharded)
        frames = np.stack([humidity_like * np.float32(1 + 0.01 * t)
                           for t in range(4)])
        cfg = _cfg(frames.shape, 1e-2, chunk_dims=(1, 144, 128))
        blob = encode_chunked_sharded(frames, cfg)
        # NOT asserting byte-identity with the unsharded container: XLA
        # compiles ulp-different f32 arithmetic per sharding layout, and on
        # this rough log-domain data those ulps straddle floor-quantization
        # boundaries (the smooth-data identity tests in test_parallel.py
        # keep pinning that nothing STRUCTURAL diverges).  The contract is
        # flags + the bound, which every program verifies with its own
        # arithmetic.
        hd = stream.split_frame_stream(stream.iter_chunked(blob)[1][0])[0]
        assert hd.log_domain
        out = decode_chunked_sharded(blob)
        assert (np.abs(out - frames) / frames).max() <= 1e-2

    def test_region_decode(self, humidity_like):
        frames = np.stack([humidity_like * np.float32(1 + 0.01 * t)
                           for t in range(4)])
        cfg = _cfg(frames.shape, 1e-2, chunk_dims=(2, 72, 64))
        blob = encode_chunked(frames, cfg)
        sub = ebcc_tpu.decode_chunked_region(blob,
                                             ((1, 3), (30, 100), (60, 200)))
        ref = frames[1:3, 30:100, 60:200]
        assert (np.abs(sub - ref) / ref).max() <= 1e-2


@pytest.fixture(scope="module")
def native():
    import subprocess

    from ebcc_tpu import native as native_mod
    try:
        native_mod.load()
    except (RuntimeError, FileNotFoundError,
            subprocess.CalledProcessError):
        pytest.skip("native toolchain unavailable")
    return native_mod


class TestPointwiseNative:
    def test_native_roundtrip_and_cross(self, native, humidity_like):
        x = humidity_like[None]
        eps = 1e-2
        cfg = _cfg(x.shape, eps)
        nb = native.native_encode(x, cfg)
        assert stream.split_frame_stream(nb)[0].log_domain
        nout = native.native_decode(nb).reshape(x.shape)
        assert (np.abs(nout - x) / x).max() <= eps
        # cross-codec: the f32 margin absorbs the ulp differences, so the
        # FULL bound (not bound + ATOL) holds across codecs by design.
        assert (np.abs(decode(nb) - x) / x).max() <= eps
        jb = encode(x, cfg)
        njout = native.native_decode(jb).reshape(x.shape)
        assert (np.abs(njout - x) / x).max() <= eps

    def test_native_rejects_nonpositive(self, native, humidity_like):
        x = humidity_like[None] - 0.5
        with pytest.raises(Exception):
            native.native_encode(x, _cfg(x.shape, 1e-2))

    def test_hdf5_filter_cd_values(self, native, humidity_like):
        """The cd_values vocabulary carries mode 3 end-to-end."""
        from ebcc_tpu.api.filter_wrapper import EBCC_Filter, populate_config
        f = EBCC_Filter(base_cr=30, height=144, width=256,
                        residual_opt=("pointwise_relative_error_target",
                                      1e-2))
        cd = f.hdf_filter_opts
        cfg = populate_config(np.array(cd, np.uint32), 144 * 256 * 4)
        assert cfg.residual_mode == RESIDUAL_POINTWISE_RELATIVE_ERROR
        assert cfg.error == pytest.approx(1e-2)
