"""Zarr/numcodecs example (parity: reference examples/example_zarr.py).

Without the optional ``zarr``/``numcodecs`` packages the codec still works
directly (encode/decode of raveled float32 buffers); with them it plugs
into the Zarr v3 serializer stack the same way the reference does via
zarr-any-numcodecs.

Run:  python examples/example_zarr.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebcc_tpu.api.filter_wrapper import EBCC_Filter
from ebcc_tpu.api.zarr_filter import EBCCZarrFilter


def main():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    data = (270 + 10 * np.sin(yy / 9) * np.cos(xx / 7)
            + rng.normal(scale=0.1, size=(256, 256))).astype(np.float32)[None]

    filt = EBCC_Filter(base_cr=30, height=256, width=256,
                       residual_opt=("max_error_target", 0.1), data_dim=3)
    codec = EBCCZarrFilter(filt.hdf_filter_opts)

    buf = codec.encode(data)
    out = codec.decode(buf).reshape(data.shape)
    err = float(np.abs(out - data).max())
    print(f"codec roundtrip: {data.nbytes} -> {len(buf)} bytes "
          f"(CR {data.nbytes / len(buf):.1f}), max error {err:.4f}")
    assert err <= 0.1

    try:
        import zarr  # noqa: F401
        from zarr_any_numcodecs import AnyNumcodecsArrayBytesCodec

        z = zarr.create_array(
            store={}, shape=data.shape, chunks=data.shape,
            dtype=np.float32,
            serializer=AnyNumcodecsArrayBytesCodec(codec))
        z[...] = data
        zar = z[...]
        print("zarr v3 array roundtrip max error:",
              float(np.abs(zar - data).max()))
    except ImportError:
        print("zarr / zarr-any-numcodecs not installed; direct codec "
              "round-trip shown above.")


if __name__ == "__main__":
    main()
