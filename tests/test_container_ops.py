"""Container-level storage operations: random-access region decode and
append-along-time.

Beyond-reference at the standalone level: the reference relies entirely on
HDF5 chunking for random access and growth (SURVEY §3.1); a standalone
ETPK container gets both here, built on the same chunk independence
(ebcc_codec.c:1007-1019 parity property)."""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import (
    CodecConfig,
    RESIDUAL_MAX_ERROR,
    decode_chunked,
    decode_chunked_region,
    encode_chunked,
)
from ebcc_tpu.core import stream
from ebcc_tpu.io import append_chunked, append_chunked_file


@pytest.fixture(scope="module")
def container(base_test_data):
    data = np.stack([base_test_data[:200, :300] + 0.2 * t
                     for t in range(6)])
    cfg = CodecConfig(dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR,
                      error=0.1, chunk_dims=(2, 64, 64))
    return encode_chunked(data, cfg), data, cfg


class TestRegionDecode:
    ERR = 0.1 + 1e-4  # bound + cross-batch-shape ulp tolerance

    @pytest.mark.parametrize("region", [
        ((1, 4), (30, 130), (100, 260)),       # interior, chunk-straddling
        ((0, 6), (0, 200), (0, 300)),          # whole array
        ((5, 6), (199, 200), (299, 300)),      # single edge sample
        ((0, 1), (64, 128), (64, 128)),        # exactly one chunk
    ])
    def test_bound_and_shape(self, container, region):
        blob, data, _ = container
        sub = decode_chunked_region(blob, region)
        sl = tuple(slice(*r) for r in region)
        assert sub.shape == data[sl].shape
        assert np.abs(sub - data[sl]).max() <= self.ERR

    def test_slice_form(self, container):
        blob, data, _ = container
        sub = decode_chunked_region(
            blob, (slice(2, 3), slice(None), slice(64, 128)))
        assert np.abs(sub - data[2:3, :, 64:128]).max() <= self.ERR

    def test_only_intersecting_chunks_touched(self, container, monkeypatch):
        """A one-chunk region must entropy-decode exactly one stream."""
        from ebcc_tpu.core import codec as codec_mod
        blob, _, _ = container
        seen = []
        orig = codec_mod._parse_streams

        def spy(streams):
            seen.append(len(streams))
            return orig(streams)

        monkeypatch.setattr(codec_mod, "_parse_streams", spy)
        decode_chunked_region(blob, ((0, 2), (0, 64), (0, 64)))
        assert sum(seen) == 1

    def test_out_of_range_raises(self, container):
        blob, _, _ = container
        for bad in [((0, 7), (0, 1), (0, 1)), ((1, 1), (0, 1), (0, 1)),
                    ((-1, 1), (0, 1), (0, 1))]:
            with pytest.raises(ValueError):
                decode_chunked_region(blob, bad)
        with pytest.raises(stream.StreamError):
            decode_chunked_region(b"ETPU" + b"\0" * 100, ((0, 1),) * 3)

    def test_native_route(self, container, monkeypatch):
        blob, data, _ = container
        from ebcc_tpu import native as native_mod
        try:
            native_mod.load()
        except Exception:
            pytest.skip("native toolchain unavailable")
        monkeypatch.setenv("EBCC_DECODE_BACKEND", "native")
        sub = decode_chunked_region(blob, ((1, 3), (30, 90), (50, 150)))
        assert np.abs(sub - data[1:3, 30:90, 50:150]).max() <= 0.1

    def test_temporal_container(self, container):
        _, data, _ = container
        tcfg = CodecConfig(dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR,
                           error=0.1, temporal=True, chunk_dims=(6, 64, 64))
        tb = encode_chunked(data, tcfg)
        sub = decode_chunked_region(tb, ((2, 5), (10, 100), (70, 140)))
        assert np.abs(sub - data[2:5, 10:100, 70:140]).max() <= self.ERR

    def test_masked_container(self, container):
        _, data, _ = container
        holed = data.copy()
        holed[:, 20:40, 80:120] = np.nan
        cfg = CodecConfig(dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR,
                          error=0.1, allow_nan=True, chunk_dims=(2, 64, 64))
        blob = encode_chunked(holed, cfg)
        sub = decode_chunked_region(blob, ((0, 2), (0, 64), (64, 192)))
        assert np.isnan(sub[:, 20:40, 16:56]).all()
        valid = ~np.isnan(holed[0:2, 0:64, 64:192])
        assert np.abs(sub[valid] - data[0:2, 0:64, 64:192][valid]
                      ).max() <= self.ERR


class TestAppend:
    def _more(self, data, k=4):
        return np.stack([data[-1] + 0.2 * (t + 1) for t in range(k)])

    def test_append_bytes(self, container):
        blob, data, cfg = container
        more = self._more(data)
        grown = append_chunked(blob, more, cfg)
        out = decode_chunked(grown)
        ref = np.concatenate([data, more])
        assert out.shape == ref.shape
        assert np.abs(out - ref).max() <= 0.1
        # the old records are byte-identical (only the header + tail differ)
        _, old = stream.iter_chunked(blob)
        _, new = stream.iter_chunked(grown)
        assert new[: len(old)] == list(old)

    def test_append_file_in_place(self, container, tmp_path):
        blob, data, cfg = container
        p = tmp_path / "arc.etpk"
        p.write_bytes(blob)
        more = self._more(data, 3)
        appended = append_chunked_file(str(p), more, cfg)
        assert appended > 0
        grown = p.read_bytes()
        # identical to the bytes-level op
        assert grown == append_chunked(blob, more, cfg)
        out = decode_chunked(grown)
        assert np.abs(out - np.concatenate([data, more])).max() <= 0.1

    def test_append_then_region(self, container, tmp_path):
        blob, data, cfg = container
        p = tmp_path / "arc2.etpk"
        p.write_bytes(blob)
        more = self._more(data, 2)
        append_chunked_file(str(p), more, cfg)
        sub = decode_chunked_region(p.read_bytes(),
                                    ((6, 8), (0, 64), (0, 64)))
        assert np.abs(sub - more[:, 0:64, 0:64]).max() <= 0.1 + 1e-4

    def test_shape_mismatch_raises(self, container):
        blob, data, cfg = container
        with pytest.raises(ValueError):
            append_chunked(blob, data[:, :100, :], cfg)

    def test_unaligned_leading_dim_refused(self, base_test_data):
        data = np.stack([base_test_data[:64, :64]] * 3)  # 3 % 2 != 0
        cfg = CodecConfig(dims=data.shape, residual_mode=RESIDUAL_MAX_ERROR,
                          error=0.1, chunk_dims=(2, 64, 64))
        blob = encode_chunked(data, cfg)
        with pytest.raises(ValueError):
            append_chunked(blob, data[:2], cfg)

    def test_repair_after_interrupted_append(self, container, tmp_path):
        """A killed append leaves the old header + trailing bytes (every
        reader rejects loudly); repair_chunked_file restores the old
        archive exactly."""
        from ebcc_tpu.io import repair_chunked_file
        blob, data, cfg = container
        p = tmp_path / "torn.etpk"
        p.write_bytes(blob + b"\x11" * 137)  # simulate the torn tail
        with pytest.raises(stream.StreamError):
            decode_chunked(p.read_bytes())
        assert repair_chunked_file(str(p)) == 137
        assert p.read_bytes() == blob
        assert repair_chunked_file(str(p)) == 0  # idempotent

    def test_repeated_appends(self, container, tmp_path):
        blob, data, cfg = container
        p = tmp_path / "arc3.etpk"
        p.write_bytes(blob)
        total = [data]
        for k in range(3):
            more = self._more(total[-1], 2)
            append_chunked_file(str(p), more, cfg)
            total.append(more)
        out = decode_chunked(p.read_bytes())
        ref = np.concatenate(total)
        assert out.shape == ref.shape
        assert np.abs(out - ref).max() <= 0.1
