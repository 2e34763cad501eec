"""Zarr v3 array storage through the registered numcodecs codec.

Parity: reference ``tests/test_zarr.py:62-151`` — an actual
``zarr.create_array`` round trip via ``AnyNumcodecsArrayBytesCodec`` (so the
``numcodecs.register_codec`` line is exercised, not just direct
encode/decode), plus CR and error-target sweeps through the array path.

zarr / any_numcodecs are optional extras (pyproject ``[zarr]``); each test
skips cleanly when they are absent and runs in the packaging CI.
"""

import numpy as np
import pytest

from ebcc_tpu.api.filter_wrapper import EBCC_Filter
from ebcc_tpu.api.zarr_filter import EBCCZarrFilter


def _field(h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(5)
    return (270 + 10 * np.sin(yy / 9) * np.cos(xx / 7)
            + rng.normal(scale=0.1, size=(h, w))).astype(np.float32)


def _zarr_filter(h, w, atol=1e-2, base_cr=10):
    f = EBCC_Filter(base_cr=base_cr, height=h, width=w,
                    residual_opt=("max_error_target", atol), data_dim=2)
    return EBCCZarrFilter(f.hdf_filter_opts)


class TestRegistration:
    def test_codec_registered_and_config_roundtrip(self):
        numcodecs = pytest.importorskip("numcodecs")
        filt = _zarr_filter(64, 64)
        cls = numcodecs.registry.get_codec(
            {"id": filt.codec_id, **{k: v for k, v in
                                     filt.get_config().items() if k != "id"}})
        assert isinstance(cls, EBCCZarrFilter)
        assert np.array_equal(cls.arglist, filt.arglist)


class TestZarrArray:
    def test_zarr_array_roundtrip(self, tmp_path):
        """Reference tests/test_zarr.py:62-95: store through a real zarr v3
        array with the codec as serializer; bound must hold on read-back."""
        zarr = pytest.importorskip("zarr")
        any_numcodecs = pytest.importorskip("any_numcodecs")

        data = _field()
        atol = 1e-2
        filt = _zarr_filter(*data.shape, atol=atol)
        z = zarr.create_array(
            store=str(tmp_path / "t.zarr"),
            data=data,
            chunks=data.shape,
            serializer=any_numcodecs.AnyNumcodecsArrayBytesCodec(filt),
            compressors=None,
            overwrite=True,
        )
        out = z[:]
        assert out.shape == data.shape
        assert np.abs(out - data).max() <= atol

    def test_zarr_array_reopen(self, tmp_path):
        """The stored array must be readable by a FRESH zarr open (codec
        resolved from the registry via its persisted metadata)."""
        zarr = pytest.importorskip("zarr")
        any_numcodecs = pytest.importorskip("any_numcodecs")

        data = _field()
        atol = 1e-2
        store = str(tmp_path / "t.zarr")
        zarr.create_array(
            store=store, data=data, chunks=data.shape,
            serializer=any_numcodecs.AnyNumcodecsArrayBytesCodec(
                _zarr_filter(*data.shape, atol=atol)),
            compressors=None, overwrite=True)
        out = zarr.open_array(store, mode="r")[:]
        assert np.abs(out - data).max() <= atol

    @pytest.mark.parametrize("base_cr", [2, 5, 10])
    def test_cr_sweep(self, tmp_path, base_cr):
        zarr = pytest.importorskip("zarr")
        any_numcodecs = pytest.importorskip("any_numcodecs")
        import os

        data = _field()
        atol = 1e-2
        store = tmp_path / f"cr{base_cr}.zarr"
        z = zarr.create_array(
            store=str(store), data=data, chunks=data.shape,
            serializer=any_numcodecs.AnyNumcodecsArrayBytesCodec(
                _zarr_filter(*data.shape, atol=atol, base_cr=base_cr)),
            compressors=None, overwrite=True)
        assert np.abs(z[:] - data).max() <= atol
        stored = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(store) for f in fs)
        assert data.nbytes / stored > 1.0

    @pytest.mark.parametrize("target", [1e-2, 1e-1])
    def test_error_target_sweep(self, tmp_path, target):
        zarr = pytest.importorskip("zarr")
        any_numcodecs = pytest.importorskip("any_numcodecs")

        data = _field()
        z = zarr.create_array(
            store=str(tmp_path / "t.zarr"), data=data, chunks=data.shape,
            serializer=any_numcodecs.AnyNumcodecsArrayBytesCodec(
                _zarr_filter(*data.shape, atol=target)),
            compressors=None, overwrite=True)
        # exact-bound design goal (reference allows 1.5x observed)
        assert np.abs(z[:] - data).max() <= target


class TestDirectCodec:
    """Direct encode/decode sweeps (reference tests/test_zarr.py:97-151) —
    run even without zarr installed."""

    @pytest.mark.parametrize("shape", [(32, 32), (64, 32), (32, 64)])
    def test_shapes(self, shape):
        data = _field(*shape)
        filt = _zarr_filter(*shape)
        out = filt.decode(filt.encode(data)).reshape(shape)
        assert np.abs(out - data).max() <= 1e-2
