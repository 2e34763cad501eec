"""End-to-end codec property tests.

Test-strategy parity (SURVEY §4): (a) round-trips against real ERA5 data,
(b) the HARD guarantee ``max_error <= target`` (the reference's tests allow
1.5x observed slack; ours must hold exactly because the encoder verifies the
bound with the decoder's own arithmetic), (c) CR floors, (d) edge cases
(const fields, padded edge chunks, chunk-dim defaults)."""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import (
    CodecConfig,
    EncodeOptions,
    RESIDUAL_MAX_ERROR,
    RESIDUAL_NONE,
    RESIDUAL_RELATIVE_ERROR,
    decode,
    decode_chunked,
    encode,
    encode_chunked,
    encode_chunked_compat,
)


def _roundtrip(data, config, opts=None):
    blob = encode(data, config, opts)
    out = decode(blob)
    return blob, out.reshape(data.shape)


class TestMaxErrorMode:
    @pytest.mark.parametrize("target", [0.5, 0.1, 0.02])
    def test_bound_holds_small(self, small_frame, target):
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=target)
        blob, out = _roundtrip(data, config)
        assert np.abs(out - data).max() <= target

    def test_bound_holds_medium_and_compresses(self, medium_frame):
        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob, out = _roundtrip(data, config)
        assert np.abs(out - data).max() <= 0.1
        assert data.nbytes / len(blob) > 2  # CR floor (ref benchmarks)

    def test_monotone_size_vs_target(self, medium_frame):
        """Tighter targets must not produce smaller streams
        (parity: error-bound accuracy sweep, ref benchmarks tb:125-154)."""
        data = medium_frame[None]
        sizes = []
        for tgt in [1.0, 0.1, 0.01]:
            config = CodecConfig(dims=data.shape, base_cr=30,
                                 residual_mode=RESIDUAL_MAX_ERROR, error=tgt)
            blob, out = _roundtrip(data, config)
            assert np.abs(out - data).max() <= tgt
            sizes.append(len(blob))
        assert sizes == sorted(sizes)

    def test_3d_stack(self, stacked_3d):
        config = CodecConfig(dims=stacked_3d.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob, out = _roundtrip(stacked_3d, config)
        assert np.abs(out - stacked_3d).max() <= 0.1


class TestRelativeErrorMode:
    def test_bound_scales_with_range(self, medium_frame):
        data = medium_frame[None]
        rel = 0.01
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_RELATIVE_ERROR, error=rel)
        blob, out = _roundtrip(data, config)
        rng = data.max() - data.min()
        assert np.abs(out - data).max() <= rel * rng


class TestRateMode:
    def test_rate_respected(self, medium_frame, base_cr):
        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=base_cr,
                             residual_mode=RESIDUAL_NONE)
        blob, out = _roundtrip(data, config)
        achieved = data.nbytes / len(blob)
        # Must not undershoot the requested rate (stream must fit the budget)
        assert achieved >= base_cr * 0.95
        # ... and should not wildly overshoot either (quality left on table);
        # plane granularity allows up to ~one-plane overshoot.
        assert np.isfinite(out).all()

    def test_budget_utilization(self, medium_frame, base_cr):
        """Partial-plane rate fill (FLAG_BASE_PARTIAL): the payload must
        land within a few percent of the byte budget, not an octave below
        (J2K rate-allocation quality parity, ref tcp_rates ebcc_codec.c:116).
        """
        from ebcc_tpu.core import stream as stream_mod

        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=base_cr,
                             residual_mode=RESIDUAL_NONE)
        blob = ebcc_tpu.encode(data, config)
        budget = data.nbytes // base_cr
        assert len(blob) <= budget
        assert len(blob) >= 0.90 * budget

    def test_rmse_monotone_in_rate(self, medium_frame):
        """More budget must never hurt quality."""
        data = medium_frame[None]
        rmses = []
        for cr in (200, 100, 50, 10):
            config = CodecConfig(dims=data.shape, base_cr=cr,
                                 residual_mode=RESIDUAL_NONE)
            _, out = _roundtrip(data, config)
            rmses.append(float(np.sqrt(np.mean((out - data) ** 2))))
        assert all(a >= b * 0.999 for a, b in zip(rmses, rmses[1:])), rmses

    def test_partial_stream_native_decode_parity(self, medium_frame):
        """The native decoder must reconstruct FLAG_BASE_PARTIAL streams
        identically (to f32 rounding) to the device decoder."""
        from ebcc_tpu import native
        from ebcc_tpu.core import stream as stream_mod

        try:
            native.load()
        except Exception:
            pytest.skip("native library unavailable")
        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=100,
                             residual_mode=RESIDUAL_NONE)
        blob = ebcc_tpu.encode(data, config)
        hd, _, _ = stream_mod.split_frame_stream(blob)
        assert hd.flags & stream_mod.FLAG_BASE_PARTIAL, \
            "expected a partial-plane stream at this operating point"
        from ebcc_tpu.core import codec as codec_mod

        dev = codec_mod._decode_streams([blob])[0]
        nat = native.native_decode(blob).reshape(dev.shape)
        from ebcc_tpu.core.kernels import DECODER_EPS_REL
        atol = DECODER_EPS_REL * float(np.asarray(dev).max()
                                       - np.asarray(dev).min())
        np.testing.assert_allclose(nat, dev, atol=atol)


class TestEdgeCases:
    def test_const_field(self, constant_frame):
        """Parity: const-field shortcut (ref c:678) + CR>5 + tiny atol
        (ref test_zarr.py:183-210)."""
        config = CodecConfig(dims=constant_frame.shape, base_cr=100,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.01)
        blob, out = _roundtrip(constant_frame, config)
        assert np.abs(out - constant_frame).max() <= 1e-6
        assert constant_frame.nbytes / len(blob) > 5

    def test_nan_rejected(self, small_frame):
        data = small_frame[None].copy()
        data[0, 3, 4] = np.nan
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        with pytest.raises(ValueError, match="NaN or Inf"):
            encode(data, config)

    def test_invalid_dims_rejected(self):
        with pytest.raises(ValueError):
            CodecConfig(dims=(1, 64), base_cr=30)
        data = np.zeros((1, 8, 8), np.float32)
        config = CodecConfig(dims=(1, 8, 8), base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        with pytest.raises(ValueError):
            encode(data, config)

    def test_small_leading_dim_merged(self):
        """dims (8, 8, 64): d1 < 32 merges leading dims into a 64-row frame
        (parity with reference flattening, ebcc_codec.c:661-669)."""
        rng = np.random.default_rng(0)
        data = rng.normal(size=(8, 8, 64)).astype(np.float32)
        config = CodecConfig(dims=data.shape, base_cr=10,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.05)
        blob = encode(data, config)
        out = decode(blob).reshape(data.shape)
        assert np.abs(out - data).max() <= 0.05


class TestChunked:
    def test_roundtrip_exact_grid(self, base_test_data):
        data = np.ascontiguousarray(base_test_data[:128, :256])[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 64, 64))
        blob = encode_chunked(data, config)
        out = decode_chunked(blob)
        assert out.shape == data.shape
        assert np.abs(out - data).max() <= 0.1

    def test_padded_edge_chunks(self, base_test_data):
        """Chunk grid not dividing dims -> edge-replicate padding
        (parity: test_c_api.py:194-208)."""
        data = np.ascontiguousarray(base_test_data[:100, :150])[None]
        config = CodecConfig(dims=data.shape, base_cr=20,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 64, 64))
        blob = encode_chunked(data, config)
        out = decode_chunked(blob)
        assert out.shape == data.shape
        assert np.abs(out - data).max() <= 0.1

    def test_zero_chunk_dims_default_full(self, small_frame):
        """chunk_dims (0,0,0) -> whole array as one chunk
        (parity: test_c_api.py:245-257)."""
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=20,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob = encode_chunked(data, config)
        from ebcc_tpu.core import stream as stream_mod
        hdr, streams = stream_mod.iter_chunked(blob)
        assert hdr.num_chunks == 1
        assert hdr.chunk_dims == data.shape
        out = decode_chunked(blob)
        assert np.abs(out - data).max() <= 0.1

    def test_chunk_dims_larger_than_data(self, small_frame):
        """Chunk dims exceeding data dims (parity: test_c_api.py:211-242)."""
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=20,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 96, 96))
        blob = encode_chunked(data, config)
        out = decode_chunked(blob)
        assert np.abs(out - data).max() <= 0.1

    def test_compat_default_tiling_and_rel_conversion(self, base_test_data):
        """compat: default (1, <=1024, <=1024) tiles + REL->MAX via GLOBAL
        range (parity: test_c_api.py:260-288)."""
        data = np.stack([base_test_data[:256, :256] + i for i in range(3)])
        rel = 0.005
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_RELATIVE_ERROR, error=rel)
        blob = encode_chunked_compat(data, config)
        from ebcc_tpu.core import stream as stream_mod
        hdr, _ = stream_mod.iter_chunked(blob)
        assert hdr.chunk_dims == (1, 256, 256)
        out = decode_chunked(blob)
        global_rng = data.max() - data.min()
        assert np.abs(out - data).max() <= rel * global_rng

    def test_plain_stream_accepted_by_chunked_decoder(self, small_frame):
        """Parity: test_c_api.py:291-300."""
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=20,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob = encode(data, config)
        out = decode_chunked(blob)
        assert np.abs(out.reshape(data.shape) - data).max() <= 0.1


class TestEnvOptions:
    def test_quantile_zero_forces_pure_base(self, small_frame, monkeypatch):
        """EBCC_INIT_BASE_ERROR_QUANTILE=0 => quantile target 1.0 => stream
        has no residual layer (parity: ref c:634-650, 738)."""
        monkeypatch.setenv("EBCC_INIT_BASE_ERROR_QUANTILE", "0")
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.05)
        blob = encode(data, config, EncodeOptions.from_env())
        from ebcc_tpu.core import stream as stream_mod
        hdr, _, _ = stream_mod.split_frame_stream(blob)
        assert not hdr.has_residual
        out = decode(blob).reshape(data.shape)
        assert np.abs(out - data).max() <= 0.05

    def test_disable_mean_adjustment(self, small_frame, monkeypatch):
        monkeypatch.setenv("EBCC_DISABLE_MEAN_ADJUSTMENT", "1")
        data = small_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.05)
        blob = encode(data, config, EncodeOptions.from_env())
        from ebcc_tpu.core import stream as stream_mod
        hdr, _, _ = stream_mod.split_frame_stream(blob)
        assert not (hdr.flags & stream_mod.FLAG_MEAN_ADJUSTED)
        out = decode(blob).reshape(data.shape)
        assert np.abs(out - data).max() <= 0.05


class TestMeanAdjustmentBoundGuard:
    """Regression: the skip-residual path verifies the UNCENTERED error
    (reference c:737 parity) but used to apply the mean adjustment
    unconditionally (reference c:863-868 behavior) — when the mean has
    opposite sign to the error extreme the SHIPPED error exceeded the
    target.  Found on a smooth near-polar ERA5 64x64 chunk."""

    def _failing_chunk(self, base_test_data):
        x = base_test_data
        rows = np.minimum(np.arange(11 * 64, 11 * 64 + 64), x.shape[0] - 1)
        cols = np.arange(8 * 64, 8 * 64 + 64) % x.shape[1]
        return np.ascontiguousarray(x[np.ix_(rows, cols)])[None]

    def test_smooth_chunk_bound_exact(self, base_test_data):
        chunk = self._failing_chunk(base_test_data)
        config = CodecConfig(dims=chunk.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
        blob = encode(chunk, config)
        out = decode(blob).reshape(chunk.shape)
        assert np.abs(out - chunk).max() <= 0.5

    def test_smooth_chunk_bound_exact_native(self, base_test_data):
        from ebcc_tpu import native as native_mod
        try:
            native_mod.load()
        except Exception:
            pytest.skip("native toolchain unavailable")
        chunk = self._failing_chunk(base_test_data)
        config = CodecConfig(dims=chunk.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.5)
        blob = native_mod.native_encode(chunk, config)
        out = native_mod.native_decode(blob).reshape(chunk.shape)
        assert np.abs(out - chunk).max() <= 0.5

    def test_adverse_mean_synthetic(self):
        """Synthetic construction with a skewed error distribution: smooth
        low-amplitude field whose quantization errors are one-sided."""
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        chunk = (242.0 + 0.7 * np.sin(yy / 40.0) ** 2
                 + 0.01 * np.cos(xx / 5.0)).astype(np.float32)[None]
        for err in (0.5, 0.3):
            config = CodecConfig(dims=chunk.shape, base_cr=30,
                                 residual_mode=RESIDUAL_MAX_ERROR, error=err)
            blob = encode(chunk, config)
            out = decode(blob).reshape(chunk.shape)
            assert np.abs(out - chunk).max() <= err


class TestU16Upload:
    """EBCC_U16_UPLOAD=1: frames cross the link as u16 with the grid slack
    subtracted from the device target — the shipped bound stays exact."""

    def test_bound_holds_and_path_active(self, medium_frame, monkeypatch):
        monkeypatch.setenv("EBCC_U16_UPLOAD", "1")
        data = medium_frame[None]
        from ebcc_tpu.core.codec import _u16_upload_ok
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        minv = np.asarray([data.min()], np.float32)
        maxv = np.asarray([data.max()], np.float32)
        assert _u16_upload_ok(minv, maxv, config)  # rule engages here
        blob = encode(data, config, EncodeOptions.from_env())
        out = decode(blob).reshape(data.shape)
        assert np.abs(out - data).max() <= 0.1

    def test_tight_target_falls_back_to_f32(self, medium_frame, monkeypatch):
        """A target within ~32x of the u16 grid slack must take the f32
        path (and then match the default-path stream byte for byte)."""
        monkeypatch.setenv("EBCC_U16_UPLOAD", "1")
        data = medium_frame[None]
        rng = float(data.max() - data.min())
        tight = rng / 65535.0  # well under 32x slack
        from ebcc_tpu.core.codec import _u16_upload_ok
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=tight)
        minv = np.asarray([data.min()], np.float32)
        maxv = np.asarray([data.max()], np.float32)
        assert not _u16_upload_ok(minv, maxv, config)
        blob = encode(data, config, EncodeOptions.from_env())
        monkeypatch.delenv("EBCC_U16_UPLOAD")
        assert blob == encode(data, config, EncodeOptions.from_env())

    def test_relative_mode_and_chunked(self, base_test_data, monkeypatch):
        monkeypatch.setenv("EBCC_U16_UPLOAD", "1")
        data = np.ascontiguousarray(base_test_data[:128, :192])[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_RELATIVE_ERROR,
                             error=1e-2, chunk_dims=(1, 64, 64))
        blob = encode_chunked(data, config, EncodeOptions.from_env())
        out = decode_chunked(blob)
        bound = 1e-2 * float(data.max() - data.min())
        assert np.abs(out - data).max() <= bound


class TestConcurrency:
    def test_concurrent_public_encodes(self, small_frame):
        """Two threads driving the public API concurrently (each spawns its
        own internal pipeline pools) must not deadlock or cross streams."""
        from concurrent.futures import ThreadPoolExecutor

        def work(shift):
            data = small_frame[None] + np.float32(shift)
            config = CodecConfig(dims=data.shape, base_cr=30,
                                 residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
            blob = encode(data, config)
            out = decode(blob).reshape(data.shape)
            return float(np.abs(out - data).max())

        with ThreadPoolExecutor(max_workers=2) as pool:
            errs = list(pool.map(work, [0.0, 5.0]))
        assert all(e <= 0.1 for e in errs)


class TestDeterminism:
    def test_encode_deterministic(self, medium_frame):
        """Archives must be reproducible: identical inputs and config give
        byte-identical streams (single platform)."""
        data = medium_frame[None]
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        assert encode(data, config) == encode(data, config)

    def test_chunked_deterministic(self, base_test_data):
        data = np.stack([base_test_data[:64, :64] + i for i in range(5)])
        config = CodecConfig(dims=data.shape, base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 64, 64))
        assert encode_chunked(data, config) == encode_chunked(data, config)


class TestRoundtripPipelined:
    def test_roundtrip_matches_sequential(self, base_test_data):
        """roundtrip_frames_device: streams byte-identical to
        encode_frames_device and decoded output equal to
        decode_frames_device, across sub-batch pipelining."""
        import jax
        from ebcc_tpu.core import codec as codec_mod
        from ebcc_tpu.config import EncodeOptions

        data = np.stack([base_test_data[:128, :128] + 0.5 * i
                         for i in range(6)])[:, None]
        config = CodecConfig(dims=(6, 128, 128), base_cr=30,
                             residual_mode=RESIDUAL_MAX_ERROR, error=0.1,
                             chunk_dims=(1, 128, 128))
        opts = EncodeOptions.from_env()
        x_dev = jax.device_put(data)
        streams, dec = codec_mod.roundtrip_frames_device(
            x_dev, config, opts, max_batch=2)
        ref_streams = codec_mod.encode_frames_device(x_dev, config, opts,
                                                     max_batch=2)
        assert streams == ref_streams
        ref_dec = codec_mod.decode_frames_device(ref_streams, max_batch=2)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref_dec))
        assert np.abs(np.asarray(dec) - data).max() <= 0.1


from ebcc_tpu.core import codec as codec_mod


class TestSparsePayloadPacker:
    """build_layer_payload_sparse (C sparse_to_planes + numpy fallback) must
    emit byte-identical payloads to the dense build_layer_payload — the
    assembler switched to the sparse builder because the dense scatter +
    per-plane packbits cost dense-grid work per candidate."""

    def test_parity_random(self, monkeypatch):
        rng = np.random.default_rng(7)
        for _ in range(20):
            d0 = int(rng.choice([1, 2]))
            hp = int(rng.choice([32, 96, 736]))
            wp = int(rng.choice([32, 64, 1472]))
            sc = d0 * hp * wp
            nnz = int(rng.integers(0, min(sc, 4000)))
            pos = np.sort(rng.choice(sc, size=nnz,
                                     replace=False)).astype(np.int32)
            vals = rng.integers(-4000, 4000, nnz).astype(np.int32)
            stored_cut = int(rng.integers(0, 3))
            cut = stored_cut + int(rng.integers(0, 3))
            dense = np.zeros(sc, np.int32)
            dense[pos] = vals
            ref = codec_mod.build_layer_payload(
                dense.reshape(d0, hp, wp), stored_cut, cut, 20)
            got = codec_mod.build_layer_payload_sparse(
                pos, vals, (d0, hp, wp), stored_cut, cut, 20)
            assert ref == got
            # monkeypatch (not direct os.environ mutation): restores any
            # pre-existing value instead of deleting it for later tests.
            monkeypatch.setenv("EBCC_NO_NATIVE_PACK", "1")
            got_np = codec_mod.build_layer_payload_sparse(
                pos, vals, (d0, hp, wp), stored_cut, cut, 20)
            monkeypatch.delenv("EBCC_NO_NATIVE_PACK")
            assert ref == got_np

    def test_empty_and_int16(self):
        out = codec_mod.build_layer_payload_sparse(
            np.zeros(0, np.int32), np.zeros(0, np.int16), (1, 32, 32), 0, 2,
            20)
        assert out == (b"", 18, 0)
        pos = np.array([5, 40], np.int32)
        vals = np.array([-300, 7], np.int16)
        dense = np.zeros(1024, np.int32)
        dense[pos] = vals
        ref = codec_mod.build_layer_payload(dense.reshape(1, 32, 32), 1, 2,
                                            20)
        got = codec_mod.build_layer_payload_sparse(
            pos, vals, (1, 32, 32), 1, 2, 20)
        assert ref == got
