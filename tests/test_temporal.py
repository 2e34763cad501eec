"""Temporal (closed-loop predictive) mode tests.

No reference counterpart — the reference intra-codes every chunk
(ebcc_codec.c:1007-1046).  The contract under test: per-frame max-error
bound EXACT on every frame (closed-loop prediction from reconstructions,
so quantization error must not accumulate), self-describing streams, CR
gain on temporally-correlated stacks, and robustness of the delta section
parser.
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import (
    CodecConfig,
    RESIDUAL_MAX_ERROR,
    RESIDUAL_NONE,
    RESIDUAL_RELATIVE_ERROR,
    decode,
    decode_chunked,
    encode,
    encode_chunked,
)
from ebcc_tpu.core import stream


def _subpixel_shift(a, s):
    i = int(np.floor(s))
    f = np.float32(s - i)
    return (1 - f) * np.roll(a, i, axis=1) + f * np.roll(a, i + 1, axis=1)


@pytest.fixture(scope="module")
def drifting_stack(base_test_data):
    """(8, 181, 360) stack: the real frame advected sub-pixel per step
    plus a slow drift — the hourly-reanalysis shape temporal prediction
    exists for."""
    crop = base_test_data[:181, :360]
    return np.stack([_subpixel_shift(crop, 0.7 * t) + 0.12 * t
                     for t in range(8)]).astype(np.float32)


def _temporal_cfg(shape, err=0.1, **kw):
    return CodecConfig(dims=shape, residual_mode=RESIDUAL_MAX_ERROR,
                       error=err, temporal=True, **kw)


class TestTemporalRoundTrip:
    def test_bound_exact_every_frame(self, drifting_stack):
        err = 0.1
        blob = encode(drifting_stack, _temporal_cfg(drifting_stack.shape, err))
        out = decode(blob)
        per_frame = np.abs(out - drifting_stack).max(axis=(1, 2))
        assert (per_frame <= err).all(), per_frame

    def test_stream_is_temporal_and_smaller(self, drifting_stack):
        err = 0.1
        blob_t = encode(drifting_stack,
                        _temporal_cfg(drifting_stack.shape, err))
        blob_i = encode(drifting_stack, CodecConfig(
            dims=drifting_stack.shape, residual_mode=RESIDUAL_MAX_ERROR,
            error=err))
        blob_pf = encode_chunked(drifting_stack, CodecConfig(
            dims=drifting_stack.shape, residual_mode=RESIDUAL_MAX_ERROR,
            error=err, chunk_dims=(1, *drifting_stack.shape[1:])))
        hd, _, _ = stream.split_frame_stream(blob_t)
        assert hd.temporal and hd.n_frames == drifting_stack.shape[0]
        # the whole point: prediction beats intra on correlated stacks —
        # both the joint multi-frame chunk and the reference-style
        # per-frame chunking (measured ~1.4x / ~1.7x here)
        assert len(blob_t) < 0.85 * len(blob_i)
        assert len(blob_t) < 0.75 * len(blob_pf)

    def test_relative_mode(self, drifting_stack):
        cfg = CodecConfig(dims=drifting_stack.shape,
                          residual_mode=RESIDUAL_RELATIVE_ERROR,
                          error=1e-3, temporal=True)
        blob = encode(drifting_stack, cfg)
        out = decode(blob)
        rng = float(drifting_stack.max() - drifting_stack.min())
        assert np.abs(out - drifting_stack).max() <= 1e-3 * rng

    def test_large_delta_range_vs_tight_target(self, base_test_data):
        """Deltas much larger than the target (the adaptive-quantization
        regime: a fixed [0,255] delta grid cannot resolve this bound)."""
        crop = base_test_data[:96, :128]
        frames = np.stack([crop + 50.0 * t for t in range(5)])
        # add structure so the delta is not constant
        frames += np.linspace(0, 1, 96 * 128, dtype=np.float32).reshape(
            1, 96, 128) * np.arange(5, dtype=np.float32)[:, None, None]
        err = 0.05
        blob = encode(frames, _temporal_cfg(frames.shape, err))
        out = decode(blob)
        assert np.abs(out - frames).max() <= err

    def test_static_frames_ship_skips(self, medium_frame):
        """Identical frames after frame 0 must cost almost nothing."""
        frames = np.repeat(medium_frame[None], 6, axis=0).copy()
        err = 0.1
        blob_t = encode(frames, _temporal_cfg(frames.shape, err))
        blob_1 = encode(medium_frame[None], CodecConfig(
            dims=(1, *medium_frame.shape),
            residual_mode=RESIDUAL_MAX_ERROR, error=err))
        records, payloads = stream.split_temporal_section(
            blob_t, stream.split_frame_stream(blob_t)[0])
        assert all(r.comp_size == 0 and r.rmin == 0.0 and r.rmax == 0.0
                   for r in records)
        # 5 skip frames cost 5 records (16 B each) over the intra stream
        assert len(blob_t) <= len(blob_1) + 5 * stream.DELTA_RECORD_SIZE
        out = decode(blob_t)
        assert np.abs(out - frames).max() <= err

    def test_const_chunk(self):
        frames = np.full((4, 64, 64), 2.5, np.float32)
        blob = encode(frames, _temporal_cfg(frames.shape, 0.01))
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.const_field and not hd.temporal
        out = decode(blob)
        assert (out == 2.5).all()

    def test_single_frame_chunk_falls_back_to_intra(self, medium_frame):
        data = medium_frame[None]
        cfg_t = _temporal_cfg(data.shape, 0.1)
        cfg_i = CodecConfig(dims=data.shape,
                            residual_mode=RESIDUAL_MAX_ERROR, error=0.1)
        blob_t = encode(data, cfg_t)
        assert blob_t == encode(data, cfg_i)

    @pytest.mark.parametrize("backend", ["cab", "auto"])
    def test_entropy_backends_on_delta_payloads(self, drifting_stack,
                                                backend):
        """Delta payloads flow through the same per-layer entropy choice as
        the base/residual layers; CAB must round-trip them and win bytes on
        this stack."""
        err = 0.1
        blob = encode(drifting_stack,
                      _temporal_cfg(drifting_stack.shape, err,
                                    entropy_backend=backend))
        blob_z = encode(drifting_stack,
                        _temporal_cfg(drifting_stack.shape, err))
        out = decode(blob)
        assert np.abs(out - drifting_stack).max() <= err
        assert len(blob) < len(blob_z)
        from ebcc_tpu.core import entropy
        records, _ = stream.split_temporal_section(
            blob, stream.split_frame_stream(blob)[0])
        assert any(r.entropy == entropy.BACKEND_NATIVE_CAB for r in records
                   if r.comp_size)

    def test_rate_mode_rejects_temporal(self):
        with pytest.raises(ValueError):
            CodecConfig(dims=(4, 64, 64), residual_mode=RESIDUAL_NONE,
                        temporal=True)


class TestTemporalChunked:
    def test_chunked_container(self, drifting_stack):
        err = 0.1
        cfg = _temporal_cfg(drifting_stack.shape, err,
                            chunk_dims=(4, 181, 360))
        blob = encode_chunked(drifting_stack, cfg)
        out = decode_chunked(blob)
        assert out.shape == drifting_stack.shape
        assert np.abs(out - drifting_stack).max() <= err

    def test_mixed_const_and_temporal_chunks(self):
        """A container can hold const chunks (plain streams) next to
        temporal chunks; batched decode must handle the mix."""
        rng = np.random.default_rng(3)
        a = np.cumsum(rng.normal(size=(4, 64, 64)), axis=0)
        import scipy.ndimage as ndi
        a = ndi.gaussian_filter(a, (0, 3, 3)).astype(np.float32)
        data = np.concatenate([a, np.full((4, 64, 64), 1.5, np.float32)],
                              axis=2)  # (4, 64, 128): right half const
        cfg = _temporal_cfg(data.shape, 0.05, chunk_dims=(4, 64, 64))
        blob = encode_chunked(data, cfg)
        out = decode_chunked(blob)
        assert np.abs(out - data).max() <= 0.05
        assert (out[:, :, 64:] == 1.5).all()

    def test_no_state_leak_across_batch_entries(self, drifting_stack):
        """Identical chunks encoded in ONE batch must yield byte-identical
        streams (the temporal scan carries per-chunk state; any cross-entry
        leak would desync them).  Note: byte-identity across DIFFERENT
        batch shapes is not part of the contract — XLA may compile
        ulp-different float arithmetic per shape, and temporal feeds
        reconstructions back into the data path (the bound still holds on
        every route because each program verifies it with its own
        arithmetic)."""
        err = 0.1
        half = drifting_stack[:, :, :180]
        data = np.concatenate([half, half], axis=2)  # two identical chunks
        cfg = _temporal_cfg(data.shape, err, chunk_dims=(8, 181, 180))
        blob = encode_chunked(data, cfg)
        _, streams = stream.iter_chunked(blob)
        assert streams[0] == streams[1]
        out = decode_chunked(blob)
        assert np.abs(out - data).max() <= err


def test_compat_default_tiles_keep_temporal_active(drifting_stack):
    """encode_chunked_compat's reference-parity default is per-frame tiles,
    which would silently disable temporal prediction — with temporal=True
    the default leading chunk dim must span frames (the CLI path)."""
    from ebcc_tpu import encode_chunked_compat
    err = 0.1
    cfg = CodecConfig(dims=drifting_stack.shape,
                      residual_mode=RESIDUAL_MAX_ERROR, error=err,
                      temporal=True)
    blob = encode_chunked_compat(drifting_stack, cfg)
    hd, _, _ = stream.split_frame_stream(stream.iter_chunked(blob)[1][0])
    assert hd.temporal
    out = decode_chunked(blob)
    assert np.abs(out - drifting_stack).max() <= err


class TestTemporalAlternateRoutes:
    """Every encode route must carry temporal configs byte-identically to
    encode_chunked — sharded SPMD and the streaming file pipeline both
    flow through the same device program + assembly."""

    @pytest.fixture()
    def stack16(self, drifting_stack):
        # (8, 128, 256) -> 16 chunks of (4, 64, 64)
        return np.ascontiguousarray(drifting_stack[:, :128, :256])

    def _cfg(self, data):
        return _temporal_cfg(data.shape, 0.1, chunk_dims=(4, 64, 64))

    def test_sharded_byte_identical(self, stack16):
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices (virtual CPU mesh)")
        from ebcc_tpu.parallel import (decode_chunked_sharded,
                                       encode_chunked_sharded)
        cfg = self._cfg(stack16)
        blob_s = encode_chunked_sharded(stack16, cfg)
        assert blob_s == encode_chunked(stack16, cfg)
        out = decode_chunked_sharded(blob_s)
        assert np.abs(out - stack16).max() <= 0.1

    def test_sharded_decode_is_spmd(self, stack16):
        """Temporal decode must stay sharded (entries are chunk-major, so
        mesh-padded chunk counts align shard boundaries to chunks): the
        device output must have >1 addressable shard, each holding whole
        chunks."""
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices (virtual CPU mesh)")
        from ebcc_tpu.core import codec as codec_mod
        from ebcc_tpu.core import stream as stream_mod
        from ebcc_tpu.parallel import encode_chunked_sharded
        from ebcc_tpu.parallel import mesh as mesh_lib
        cfg = self._cfg(stack16)
        blob = encode_chunked_sharded(stack16, cfg)
        hdr, streams = stream_mod.iter_chunked(blob)
        mesh = mesh_lib.make_mesh()
        out, _, _, _ = codec_mod._decode_streams_device(
            list(streams), sharding=mesh_lib.batch_sharding(mesh))
        shards = out.addressable_shards
        assert len(shards) == len(jax.devices())
        # each shard holds WHOLE chunks: (chunks/devices, T, h, w)
        assert all(s.data.shape[1:] == (4, 64, 64) for s in shards)
        counts = codec_mod._chunk_grid(hdr.dims, hdr.chunk_dims)
        chunks = np.asarray(out)[: len(streams)].reshape(
            len(streams), *hdr.chunk_dims)
        full = codec_mod._scatter_chunks(chunks, hdr.dims, hdr.chunk_dims,
                                         counts)
        assert np.abs(full - stack16).max() <= 0.1

    def test_streaming_pipeline_byte_identical(self, stack16):
        import io as _io

        from ebcc_tpu.io import pipeline
        cfg = self._cfg(stack16)
        buf = _io.BytesIO()
        pipeline.compress_stream(stack16, cfg, buf)
        assert buf.getvalue() == encode_chunked(stack16, cfg)
        out = pipeline.decompress_stream(_io.BytesIO(buf.getvalue()))
        assert np.abs(out - stack16).max() <= 0.1


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


class TestTemporalNative:
    """The native C++ codec carries the full temporal capability: encode
    (closed-loop, self-seeded by decoding its own frame-0 stream), decode
    (sequential accumulation), and cross-codec round-trips at the EXACT
    bound: the encoders budget 2*T inter-decoder divergence allowances
    (docs/FORMAT.md "Decoder conformance"), so accumulation over the
    prediction chain is already paid for."""

    def test_native_roundtrip_bound_exact(self, native, drifting_stack):
        err = 0.1
        cfg = _temporal_cfg(drifting_stack.shape, err)
        blob = native.native_encode(drifting_stack, cfg)
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.temporal
        out = native.native_decode(blob).reshape(drifting_stack.shape)
        assert np.abs(out - drifting_stack).max() <= err

    def test_native_encode_jax_decode(self, native, drifting_stack):
        err = 0.1
        blob = native.native_encode(
            drifting_stack, _temporal_cfg(drifting_stack.shape, err))
        out = decode(blob)
        assert np.abs(out - drifting_stack).max() <= err

    def test_jax_encode_native_decode(self, native, drifting_stack):
        err = 0.1
        blob = encode(drifting_stack,
                      _temporal_cfg(drifting_stack.shape, err))
        out = native.native_decode(blob).reshape(drifting_stack.shape)
        assert np.abs(out - drifting_stack).max() <= err

    def test_native_const_frame0_nonconst_chunk(self, native,
                                                drifting_stack):
        """Native may intra-code a const FRAME 0 inside a live chunk
        (const+temporal stream); both decoders must handle it."""
        err = 0.1
        data = drifting_stack.copy()
        data[0] = 7.25
        blob = native.native_encode(data, _temporal_cfg(data.shape, err))
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.temporal and hd.const_field
        nat = native.native_decode(blob).reshape(data.shape)
        assert np.abs(nat - data).max() <= err
        jx = decode(blob)
        assert np.abs(jx - data).max() <= err

    def test_native_relative_mode_uses_global_range(self, native,
                                                    drifting_stack):
        cfg = CodecConfig(dims=drifting_stack.shape,
                          residual_mode=RESIDUAL_RELATIVE_ERROR,
                          error=1e-3, temporal=True)
        blob = native.native_encode(drifting_stack, cfg)
        out = native.native_decode(blob).reshape(drifting_stack.shape)
        rng = float(drifting_stack.max() - drifting_stack.min())
        assert np.abs(out - drifting_stack).max() <= 1e-3 * rng

    def test_native_routing_on_temporal_config(self, native,
                                               drifting_stack,
                                               monkeypatch):
        """EBCC_ENCODE/DECODE_BACKEND=native must route temporal encodes
        through the native codec (it is a full-capability mirror)."""
        err = 0.1
        monkeypatch.setenv("EBCC_ENCODE_BACKEND", "native")
        monkeypatch.setenv("EBCC_DECODE_BACKEND", "native")
        cfg = _temporal_cfg(drifting_stack.shape, err)
        blob = encode(drifting_stack, cfg)
        assert blob == native.native_encode(drifting_stack, cfg)
        out = decode(blob)
        assert np.abs(out - drifting_stack).max() <= err


class TestTemporalRobustDecode:
    def _blob(self, drifting_stack):
        return encode(drifting_stack, _temporal_cfg(drifting_stack.shape,
                                                    0.1))

    def test_truncated_delta_section(self, drifting_stack):
        blob = self._blob(drifting_stack)
        with pytest.raises(stream.StreamError):
            decode(blob[:-7])

    def test_trailing_garbage(self, drifting_stack):
        blob = self._blob(drifting_stack)
        with pytest.raises(stream.StreamError):
            decode(blob + b"xx")

    def test_record_field_flips_never_crash(self, drifting_stack):
        blob = bytearray(self._blob(drifting_stack))
        hd = stream.split_frame_stream(bytes(blob))[0]
        start = (stream.FRAME_HEADER_SIZE + hd.base_comp_size
                 + hd.res_comp_size)
        for off in range(start, start + stream.DELTA_RECORD_SIZE * 2):
            mutated = bytearray(blob)
            mutated[off] ^= 0xFF
            try:
                decode(bytes(mutated))
            except (stream.StreamError, ValueError):
                pass  # raising is fine; crashing/hanging is not


class TestTemporalRealSequence:
    """Real multi-timestep ERA5 sequence (round-4 VERDICT #6): the
    synthetic advected frames used by the bench could flatter temporal
    mode; this gate measures it on 8 consecutive reanalysis hours.

    The fixture cannot ship in-repo (no egress in the test image, and the
    reference's own temperature.nc carries a single timestep); fetch it
    with ``python scripts/download_era5.py --temporal`` and point
    ``EBCC_TEMPORAL_FIXTURE`` at the resulting era5_temporal_8f.npy (or
    drop it in data/).  Skipped when absent — mirroring how the reference
    env-gates its live comparison codecs
    (tests/benchmarks/test_comparison_benchmarks.py:10-21)."""

    def _sequence(self):
        import os
        from pathlib import Path

        cand = os.environ.get("EBCC_TEMPORAL_FIXTURE")
        paths = [cand] if cand else []
        paths.append(Path(__file__).resolve().parents[1]
                     / "data" / "era5_temporal_8f.npy")
        for p in paths:
            if p and Path(p).exists():
                seq = np.load(p).astype(np.float32)
                if seq.ndim == 3 and seq.shape[0] >= 2:
                    return seq
        pytest.skip("real temporal fixture absent; run "
                    "scripts/download_era5.py --temporal")

    def test_real_sequence_temporal_beats_intra(self):
        seq = self._sequence()
        err = 0.1
        tcfg = CodecConfig(dims=seq.shape, residual_mode=RESIDUAL_MAX_ERROR,
                           error=err, chunk_dims=seq.shape, temporal=True)
        icfg = CodecConfig(dims=seq.shape, base_cr=30,
                           residual_mode=RESIDUAL_MAX_ERROR, error=err,
                           chunk_dims=(1,) + seq.shape[1:])
        tblob = encode_chunked(seq, tcfg)
        iblob = encode_chunked(seq, icfg)
        out = decode_chunked(tblob)
        assert np.abs(out - seq).max() <= err
        t_cr = seq.nbytes / len(tblob)
        i_cr = seq.nbytes / len(iblob)
        print(f"real-sequence temporal CR {t_cr:.2f} vs intra {i_cr:.2f}")
        # Hourly reanalysis frames are strongly correlated; temporal must
        # win on them or the mode's headline is synthetic-only.
        assert t_cr > i_cr
