"""Masked-data (allow_nan) tests.

Beyond-reference capability: the reference hard-exits on NaN input
(check_nan_inf, ebcc_codec.c:598-605), which makes it unusable on the
masked fields climate archives are full of (land/sea masks, sensor
dropouts).  Contract under test: NaN samples restore EXACTLY as NaN, the
error bound holds on every valid sample, the mask costs little (it
entropy-codes tightly), Inf still raises, and the section parser is
robust.  The native C++ codec mirrors the full capability.
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


@pytest.fixture(scope="module")
def coast(base_test_data):
    """(161, 288) crop + an irregular 'ocean' mask (blob + border strip):
    the land/sea-mask shape this feature exists for."""
    crop = np.ascontiguousarray(base_test_data[:161, :288])
    yy, xx = np.mgrid[0:161, 0:288]
    mask = (((yy - 70) ** 2 + (xx - 120) ** 2 < 2200)
            | (xx > 270) | ((yy < 12) & (xx < 60)))
    return crop, mask


def _masked_cfg(shape, err=0.1, **kw):
    return CodecConfig(dims=shape, residual_mode=RESIDUAL_MAX_ERROR,
                       error=err, allow_nan=True, **kw)


class TestMaskedRoundTrip:
    def test_nan_restored_and_bound_on_valid(self, coast):
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        err = 0.1
        blob = encode(data, _masked_cfg(data.shape, err))
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.masked
        out = decode(blob)
        assert np.isnan(out[0][mask]).all()
        assert np.isfinite(out[0][~mask]).all()
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= err

    def test_no_nan_means_no_section(self, coast):
        """allow_nan on finite data must be a no-op (byte-identical)."""
        crop, _ = coast
        data = crop[None]
        blob_a = encode(data, _masked_cfg(data.shape))
        blob_p = encode(data, CodecConfig(
            dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR, error=0.1))
        assert blob_a == blob_p
        assert not stream.split_frame_stream(blob_a)[0].masked

    def test_without_allow_nan_raises(self, coast):
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        with pytest.raises(ValueError):
            encode(data, CodecConfig(dims=data.shape,
                                     residual_mode=RESIDUAL_MAX_ERROR,
                                     error=0.1))

    def test_inf_always_raises(self, coast):
        crop, _ = coast
        data = crop[None].copy()
        data[0, 5, 5] = np.inf
        with pytest.raises(ValueError):
            encode(data, _masked_cfg(data.shape))

    def test_mask_section_is_small(self, coast):
        """A structured mask entropy-codes far below its 1-bit/sample raw
        size, and the whole masked stream equals the encode of the FILLED
        frame plus exactly that section (the mask is a pure trailing
        add-on)."""
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        blob_m = encode(data, _masked_cfg(data.shape))
        hd = stream.split_frame_stream(blob_m)[0]
        _, payload = stream.split_mask_section(blob_m, hd)
        assert len(payload) < mask.size // 8 / 4  # >=4x over raw bits
        filled = crop.copy()
        filled[mask] = crop[~mask].mean(dtype=np.float64).astype(np.float32)
        blob_f = encode(filled[None], _masked_cfg(data.shape))
        assert len(blob_m) == (len(blob_f) + len(payload)
                               + stream.MASK_SECTION_HEADER_SIZE)

    def test_all_nan_chunk(self):
        data = np.full((2, 64, 64), np.nan, np.float32)
        blob = encode(data, _masked_cfg(data.shape, 0.05))
        out = decode(blob)
        assert np.isnan(out).all()

    def test_all_nan_frame_fills_with_chunk_mean(self, coast):
        """A fully masked frame inside a live chunk must fill with the
        CHUNK's valid mean, not 0.0 — a 0.0 fill inflated the relative
        range (and broke the pointwise mode's positivity on valid input)."""
        crop, _ = coast
        data = np.stack([crop, np.full_like(crop, np.nan)])
        cfg = CodecConfig(dims=data.shape,
                          residual_mode=RESIDUAL_RELATIVE_ERROR,
                          error=1e-3, allow_nan=True)
        out = decode(encode(data, cfg))
        assert np.isnan(out[1]).all()
        rng = float(crop.max() - crop.min())  # the VALID range
        assert np.abs(out[0] - crop).max() <= 1e-3 * rng

    def test_all_nan_frame_composes_with_pointwise(self, coast):
        from ebcc_tpu.config import RESIDUAL_POINTWISE_RELATIVE_ERROR
        crop, _ = coast
        pos = np.abs(crop) + 1.0
        data = np.stack([pos, np.full_like(pos, np.nan)])
        cfg = CodecConfig(dims=data.shape,
                          residual_mode=RESIDUAL_POINTWISE_RELATIVE_ERROR,
                          error=1e-2, allow_nan=True)
        out = decode(encode(data, cfg))
        assert np.isnan(out[1]).all()
        assert (np.abs(out[0] - pos) / pos).max() <= 1e-2

    def test_per_frame_varying_mask(self, coast):
        """The bitmap covers every frame independently."""
        crop, mask = coast
        data = np.stack([crop, crop + 1.0]).copy()
        data[0][mask] = np.nan
        data[1][~mask] = np.nan
        blob = encode(data, _masked_cfg(data.shape))
        out = decode(blob)
        assert np.isnan(out[0][mask]).all() and np.isnan(out[1][~mask]).all()
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= 0.1
        assert np.abs(out[1][mask] - (crop + 1.0)[mask]).max() <= 0.1

    def test_relative_mode_range_from_valid(self, coast):
        """REL->ABS must derive the range from the VALID samples (the
        filled values lie inside it, so the device-global range equals the
        valid range)."""
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        cfg = CodecConfig(dims=data.shape,
                          residual_mode=RESIDUAL_RELATIVE_ERROR,
                          error=1e-3, allow_nan=True)
        blob = encode(data, cfg)
        out = decode(blob)
        rng = float(np.nanmax(data) - np.nanmin(data))
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= 1e-3 * rng

    def test_rate_mode_masked(self, coast):
        """allow_nan composes with rate mode (the mask section rides any
        stream)."""
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        cfg = CodecConfig(dims=data.shape, base_cr=20,
                          residual_mode=RESIDUAL_NONE, allow_nan=True)
        out = decode(encode(data, cfg))
        assert np.isnan(out[0][mask]).all()
        assert np.isfinite(out[0][~mask]).all()


class TestMaskedChunked:
    def test_chunked_only_touched_chunks_carry_sections(self, coast):
        crop, mask = coast
        data = np.stack([crop, crop]).copy()
        data[0][mask] = np.nan  # frame 1 fully valid
        cfg = _masked_cfg(data.shape, 0.1, chunk_dims=(1, 161, 288))
        blob = encode_chunked(data, cfg)
        _, streams = stream.iter_chunked(blob)
        flags = [stream.split_frame_stream(s)[0].masked for s in streams]
        assert flags == [True, False]
        out = decode_chunked(blob)
        assert np.isnan(out[0][mask]).all()
        assert not np.isnan(out[1]).any()
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= 0.1

    def test_temporal_masked(self, coast):
        crop, mask = coast
        frames = np.stack([np.roll(crop, 2 * t, axis=1) for t in range(5)])
        fm = np.broadcast_to(mask, frames.shape).copy()
        data = frames.copy()
        data[fm] = np.nan
        cfg = _masked_cfg(data.shape, 0.1, temporal=True)
        blob = encode(data, cfg)
        hd = stream.split_frame_stream(blob)[0]
        assert hd.masked and hd.temporal
        out = decode(blob)
        assert np.isnan(out[fm]).all()
        assert np.abs(out[~fm] - frames[~fm]).max() <= 0.1

    def test_streaming_pipeline(self, coast):
        import io as _io

        from ebcc_tpu.io import pipeline
        crop, mask = coast
        data = np.stack([crop + t for t in range(3)]).copy()
        data[:, mask] = np.nan
        cfg = _masked_cfg(data.shape, 0.1, chunk_dims=(1, 161, 288))
        buf = _io.BytesIO()
        pipeline.compress_stream(data, cfg, buf)
        assert buf.getvalue() == encode_chunked(data, cfg)
        out = pipeline.decompress_stream(_io.BytesIO(buf.getvalue()))
        assert np.isnan(out[:, mask]).all()

    def test_sharded(self, coast):
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices (virtual CPU mesh)")
        from ebcc_tpu.parallel import (decode_chunked_sharded,
                                       encode_chunked_sharded)
        crop, mask = coast
        data = np.stack([crop + t for t in range(4)]).copy()
        data[:, mask] = np.nan
        cfg = _masked_cfg(data.shape, 0.1, chunk_dims=(1, 161, 144))
        blob = encode_chunked_sharded(data, cfg)
        assert blob == encode_chunked(data, cfg)
        out = decode_chunked_sharded(blob)
        assert np.isnan(out[:, mask]).all()
        valid = ~np.broadcast_to(mask, data.shape)
        ref = np.stack([crop + t for t in range(4)])
        assert np.abs(out[valid] - ref[valid]).max() <= 0.1

    def test_encode_frames_device_numpy_input(self, coast):
        """Numpy input through the frames-device entry gets the full gate
        (mask/fill + sections), with and without the pipelined split."""
        from ebcc_tpu.core import codec as codec_mod
        crop, mask = coast
        batch = np.stack([crop[None]] * 3).copy()  # (3, 1, h, w)
        batch[:, 0][:, mask] = np.nan
        cfg = _masked_cfg((1, *crop.shape))
        for mb in (None, 2):
            streams = codec_mod.encode_frames_device(batch, cfg,
                                                     max_batch=mb)
            assert all(stream.split_frame_stream(s)[0].masked
                       for s in streams)
            out = decode(streams[0])
            assert np.isnan(out[0][mask]).all()

    def test_roundtrip_frames_device_pipelined(self, coast):
        """The pipelined (max_batch) roundtrip must mask numpy NaN input
        exactly like the single-batch branch (regression: it skipped the
        fill and produced unmasked garbage)."""
        from ebcc_tpu.core import codec as codec_mod
        crop, mask = coast
        batch = np.stack([crop[None]] * 4).copy()
        batch[:, 0][:, mask] = np.nan
        cfg = _masked_cfg((1, *crop.shape))
        streams, dec = codec_mod.roundtrip_frames_device(batch, cfg,
                                                         max_batch=2)
        assert all(stream.split_frame_stream(s)[0].masked for s in streams)
        out = np.asarray(dec)
        assert np.isnan(out[:, 0][:, mask]).all()
        assert np.abs(out[:, 0][:, ~mask]
                      - crop[~mask]).max() <= 0.1

    def test_device_resident_decode_restores_nan(self, coast):
        """decode_frames_device applies the mask ON DEVICE."""
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        blob = encode(data, _masked_cfg(data.shape))
        from ebcc_tpu.core import codec as codec_mod
        out_dev = codec_mod.decode_frames_device([blob])
        out = np.asarray(out_dev)[0]
        assert np.isnan(out[0][mask]).all()
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= 0.1


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


class TestMaskedNative:

    def _data(self, coast):
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        return crop, mask, data

    def test_native_roundtrip(self, native, coast):
        crop, mask, data = self._data(coast)
        cfg = _masked_cfg(data.shape)
        blob = native.native_encode(data, cfg)
        assert stream.split_frame_stream(blob)[0].masked
        out = native.native_decode(blob).reshape(data.shape)
        assert np.isnan(out[0][mask]).all()
        assert np.abs(out[0][~mask] - crop[~mask]).max() <= 0.1

    def test_cross_codec(self, native, coast):
        crop, mask, data = self._data(coast)
        cfg = _masked_cfg(data.shape)
        jx = decode(native.native_encode(data, cfg))
        assert np.isnan(jx[0][mask]).all()
        assert np.abs(jx[0][~mask] - crop[~mask]).max() <= 0.1
        nat = native.native_decode(encode(data, cfg)).reshape(data.shape)
        assert np.isnan(nat[0][mask]).all()
        assert np.abs(nat[0][~mask] - crop[~mask]).max() <= 0.1

    def test_native_rejects_nan_without_flag(self, native, coast):
        _, _, data = self._data(coast)
        cfg = CodecConfig(dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR,
                          error=0.1)
        with pytest.raises(Exception):
            native.native_encode(data, cfg)

    def test_native_temporal_masked(self, native, coast):
        crop, mask = coast
        frames = np.stack([np.roll(crop, 2 * t, axis=1) for t in range(4)])
        fm = np.broadcast_to(mask, frames.shape).copy()
        data = frames.copy()
        data[fm] = np.nan
        cfg = _masked_cfg(data.shape, 0.1, temporal=True)
        blob = native.native_encode(data, cfg)
        hd = stream.split_frame_stream(blob)[0]
        assert hd.masked and hd.temporal
        out = native.native_decode(blob).reshape(data.shape)
        assert np.isnan(out[fm]).all()
        assert np.abs(out[~fm] - frames[~fm]).max() <= 0.1


class TestMaskedRobustDecode:
    def _blob(self, coast):
        crop, mask = coast
        data = crop[None].copy()
        data[0][mask] = np.nan
        return encode(data, _masked_cfg(data.shape))

    def test_truncated_mask_section(self, coast):
        blob = self._blob(coast)
        with pytest.raises(stream.StreamError):
            decode(blob[:-3])

    def test_trailing_garbage(self, coast):
        blob = self._blob(coast)
        with pytest.raises(stream.StreamError):
            decode(blob + b"x")

    def test_mask_header_flips_never_crash(self, coast):
        blob = bytearray(self._blob(coast))
        hd = stream.split_frame_stream(bytes(blob))[0]
        start = stream.mask_section_start(bytes(blob), hd)
        for off in range(start, min(len(blob),
                                    start + stream.MASK_SECTION_HEADER_SIZE
                                    + 4)):
            mutated = bytearray(blob)
            mutated[off] ^= 0xFF
            try:
                decode(bytes(mutated))
            except (stream.StreamError, ValueError):
                pass  # raising is fine; crashing/hanging is not
