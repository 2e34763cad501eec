"""Lossless mode (RESIDUAL_LOSSLESS): bit-exact float32 round trips.

Beyond-reference capability (the reference is lossy-only): archives keep
some variables exact.  Coder: order-preserving float->uint32 map, 1-D
wrapping delta, zstd (measured better than byte-shuffle variants on
ERA5, docs/RESULTS.md).  Contract: EVERY bit pattern round-trips —
NaN payloads, Inf, -0.0, denormals — and the mode rides the full
container machinery (chunked, region, append, streaming, sharded,
native C++).
"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import (
    CodecConfig,
    RESIDUAL_LOSSLESS,
    decode,
    decode_chunked,
    decode_chunked_region,
    encode,
    encode_chunked,
)
from ebcc_tpu.core import stream


def _cfg(shape, **kw):
    return CodecConfig(dims=shape, residual_mode=RESIDUAL_LOSSLESS, **kw)


def _bits_equal(a, b):
    return np.array_equal(a.view(np.uint32), b.view(np.uint32))


class TestLosslessRoundTrip:
    def test_bit_exact_on_real_data(self, base_test_data):
        data = base_test_data[None]
        blob = encode(data, _cfg(data.shape))
        hd, _, _ = stream.split_frame_stream(blob)
        assert hd.lossless
        out = decode(blob)
        assert _bits_equal(out, data)
        assert len(blob) < 0.6 * data.nbytes  # CR ~2.6 on ERA5

    def test_every_bit_pattern(self):
        """NaN (several payloads), Inf, -0.0, denormals, extremes."""
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2 ** 32, (1, 64, 64), dtype=np.uint32)
        specials = np.array([0x7FC00001, 0xFFC00002, 0x7F800000,
                             0xFF800000, 0x80000000, 0x00000001,
                             0x7F7FFFFF, 0xFF7FFFFF], np.uint32)
        bits.reshape(-1)[: specials.size] = specials
        data = bits.view(np.float32)
        out = decode(encode(data, _cfg(data.shape)))
        assert _bits_equal(out, data)

    def test_nan_passthrough_no_allow_nan_needed(self, base_test_data):
        data = base_test_data[None].copy()
        data[0, :10, :10] = np.nan
        out = decode(encode(data, _cfg(data.shape)))
        assert _bits_equal(out, data)

    def test_incompressible_data_stores(self):
        rng = np.random.default_rng(1)
        data = rng.random((1, 64, 64), dtype=np.float32)
        blob = encode(data, _cfg(data.shape))
        assert len(blob) <= data.nbytes + stream.FRAME_HEADER_SIZE + 1024
        assert _bits_equal(decode(blob), data)

    def test_temporal_rejected(self):
        with pytest.raises(ValueError):
            CodecConfig(dims=(4, 64, 64), residual_mode=RESIDUAL_LOSSLESS,
                        temporal=True)


class TestLosslessContainer:
    @pytest.fixture(scope="class")
    def frames(self, base_test_data):
        crop = np.ascontiguousarray(base_test_data[:128, :256])
        f = np.stack([crop + 0.1 * t for t in range(4)])
        f[0, 3, 3] = np.nan
        return f

    def test_chunked(self, frames):
        cfg = _cfg(frames.shape, chunk_dims=(2, 64, 64))
        blob = encode_chunked(frames, cfg)
        assert _bits_equal(decode_chunked(blob), frames)

    def test_region(self, frames):
        cfg = _cfg(frames.shape, chunk_dims=(2, 64, 64))
        blob = encode_chunked(frames, cfg)
        sub = decode_chunked_region(blob, ((1, 3), (10, 100), (20, 200)))
        assert _bits_equal(sub, np.ascontiguousarray(
            frames[1:3, 10:100, 20:200]))

    def test_append(self, frames, tmp_path):
        from ebcc_tpu.io import append_chunked_file
        cfg = _cfg(frames.shape, chunk_dims=(2, 64, 64))
        p = tmp_path / "ll.etpk"
        p.write_bytes(encode_chunked(frames, cfg))
        append_chunked_file(str(p), frames[:2] + 5.0, cfg)
        out = decode_chunked(p.read_bytes())
        assert _bits_equal(out[4:], frames[:2] + 5.0)

    def test_streaming_byte_identical(self, frames):
        import io as _io

        from ebcc_tpu.io import pipeline
        cfg = _cfg(frames.shape, chunk_dims=(2, 64, 64))
        buf = _io.BytesIO()
        pipeline.compress_stream(frames, cfg, buf)
        assert buf.getvalue() == encode_chunked(frames, cfg)

    def test_sharded_byte_identical(self, frames):
        jax = pytest.importorskip("jax")
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices (virtual CPU mesh)")
        from ebcc_tpu.parallel import (decode_chunked_sharded,
                                       encode_chunked_sharded)
        cfg = _cfg(frames.shape, chunk_dims=(2, 64, 64))
        blob = encode_chunked_sharded(frames, cfg)
        # host coder => no XLA arithmetic => identity IS contractual here
        assert blob == encode_chunked(frames, cfg)
        assert _bits_equal(decode_chunked_sharded(blob), frames)

    def test_device_resident_entries(self, frames):
        import jax

        from ebcc_tpu.core import codec as codec_mod
        cfg = _cfg((2, 128, 256))
        finite = np.nan_to_num(frames).astype(np.float32)
        x_dev = jax.device_put(finite.reshape(2, 2, 128, 256))
        streams = codec_mod.encode_frames_device(x_dev, cfg)
        out = np.asarray(codec_mod.decode_frames_device(streams))
        assert _bits_equal(out, finite.reshape(2, 2, 128, 256))
        # the pipelined split (max_batch) must route lossless through the
        # host coder too, not the device encode pipeline
        s2 = codec_mod.encode_frames_device(x_dev, cfg, max_batch=1)
        assert s2 == streams
        _, dec = codec_mod.roundtrip_frames_device(x_dev, cfg, max_batch=1)
        assert _bits_equal(np.asarray(dec), finite.reshape(2, 2, 128, 256))


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


class TestLosslessNative:
    def test_cross_codec_bit_exact(self, native, base_test_data):
        data = base_test_data[None].copy()
        data[0, 5, 5] = np.nan
        cfg = _cfg(data.shape)
        nb = native.native_encode(data, cfg)
        assert stream.split_frame_stream(nb)[0].lossless
        assert _bits_equal(native.native_decode(nb).reshape(data.shape),
                           data)
        assert _bits_equal(decode(nb), data)
        jb = encode(data, cfg)
        assert _bits_equal(native.native_decode(jb).reshape(data.shape),
                           data)

    def test_frame_diff_predictor_cross_codec(self, native,
                                              base_test_data):
        """Correlated multi-frame chunks must pick predictor id 3 (frame
        diff) and stay bit-exact across BOTH coder pairs — the only test
        that forces the id-3 encode and inverse loops in each codec."""
        crop = np.ascontiguousarray(base_test_data[:128, :192])
        data = np.stack([crop + 0.01 * t for t in range(4)])
        cfg = _cfg(data.shape)
        jb = encode(data, cfg)
        nb = native.native_encode(data, cfg)
        assert stream.split_frame_stream(jb)[0].base_levels == 3
        assert stream.split_frame_stream(nb)[0].base_levels == 3
        assert _bits_equal(decode(nb), data)
        assert _bits_equal(native.native_decode(jb).reshape(data.shape),
                           data)

    def test_interim_predictor_ids_rejected(self, native, base_test_data):
        """Ids 0/1 (interim pre-release coders) must fail loudly in both
        decoders, never silently misdecode."""
        data = base_test_data[None, :64, :64]
        blob = bytearray(encode(np.ascontiguousarray(data), _cfg(data.shape)))
        # base_levels lives at offset 40 (magic + 4B + 4I + 4f)
        assert blob[40] == 2
        for bad_id in (0, 1):
            mutated = bytearray(blob)
            mutated[40] = bad_id
            with pytest.raises(stream.StreamError):
                decode(bytes(mutated))
            with pytest.raises(Exception):
                native.native_decode(bytes(mutated))

    def test_cd_values_vocabulary(self, native):
        from ebcc_tpu.api.filter_wrapper import EBCC_Filter, populate_config
        f = EBCC_Filter(base_cr=30, height=64, width=64,
                        residual_opt=("lossless", 0))
        cfg = populate_config(np.array(f.hdf_filter_opts, np.uint32),
                              64 * 64 * 4)
        assert cfg.residual_mode == RESIDUAL_LOSSLESS

    def test_fuzz_never_crashes(self, native, base_test_data):
        data = base_test_data[None][:, :64, :64].copy()
        blob = bytearray(encode(np.ascontiguousarray(data),
                                _cfg((1, 64, 64))))
        rng = np.random.default_rng(4)
        for _ in range(30):
            pos = int(rng.integers(0, len(blob)))
            bad = bytearray(blob)
            bad[pos] ^= int(rng.integers(1, 256))
            for dec in (decode, native.native_decode):
                try:
                    dec(bytes(bad))
                except Exception:
                    pass
