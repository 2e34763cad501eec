"""Beyond-reference modes: temporal prediction + masked (NaN) data.

Neither capability exists in the reference (its chunks are always
intra-coded and its NaN check hard-exits, ebcc_codec.c:598-605, 1007-1046).

  1. temporal=True — each frame of a multi-frame chunk is coded as an
     error-bounded delta against the PREVIOUS frame's reconstruction;
     quantization error never accumulates, the per-frame bound stays
     exact, and correlated stacks compress 1.4-2.1x further.
  2. allow_nan=True — NaN samples (land/sea masks, sensor dropouts) are
     masked out of the encode and restored exactly on decode; the bound
     applies to the valid samples.

Run:  python examples/example_advanced_modes.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_frame():
    path = "/root/reference/data/test_data.npy"
    if os.path.exists(path):
        return np.load(path).astype(np.float32)[:256, :512]
    yy, xx = np.mgrid[0:256, 0:512].astype(np.float32)
    return (260 + 25 * np.sin(yy / 256 * np.pi) * np.cos(xx / 512 * 2 * np.pi)
            ).astype(np.float32)


def main():
    import ebcc_tpu
    from ebcc_tpu import CodecConfig, RESIDUAL_MAX_ERROR

    frame = load_frame()
    err = 0.1

    # --- temporal: a drifting 8-frame stack (hourly-reanalysis shape:
    # sub-pixel advection per step plus a slow drift) ---
    def shift(a, s):
        i, f = int(np.floor(s)), np.float32(s - np.floor(s))
        return (1 - f) * np.roll(a, i, axis=1) + f * np.roll(a, i + 1, axis=1)

    frames = np.stack([shift(frame, 0.7 * t) + 0.05 * t
                       for t in range(8)]).astype(np.float32)
    intra = CodecConfig(dims=frames.shape, residual_mode=RESIDUAL_MAX_ERROR,
                        error=err)
    temporal = CodecConfig(dims=frames.shape,
                           residual_mode=RESIDUAL_MAX_ERROR, error=err,
                           temporal=True)
    blob_i = ebcc_tpu.encode(frames, intra)
    blob_t = ebcc_tpu.encode(frames, temporal)
    out = ebcc_tpu.decode(blob_t)
    worst = np.abs(out - frames).max(axis=(1, 2))
    print(f"temporal: {len(blob_t)} B vs intra {len(blob_i)} B "
          f"({len(blob_i) / len(blob_t):.2f}x); per-frame max err "
          f"{worst.max():.4f} <= {err}")
    assert (worst <= err).all()

    # --- masked: an ocean-like NaN region ---
    yy, xx = np.mgrid[0: frame.shape[0], 0: frame.shape[1]]
    mask = (yy - 120) ** 2 + 2 * (xx - 250) ** 2 < 15000
    holed = frame[None].copy()
    holed[0][mask] = np.nan
    cfg = CodecConfig(dims=holed.shape, residual_mode=RESIDUAL_MAX_ERROR,
                      error=err, allow_nan=True)
    blob = ebcc_tpu.encode(holed, cfg)
    out = ebcc_tpu.decode(blob)
    assert np.isnan(out[0][mask]).all()
    ok = np.abs(out[0][~mask] - frame[~mask]).max()
    print(f"masked: {mask.sum()} NaN samples restored exactly; valid max "
          f"err {ok:.4f} <= {err}; stream {len(blob)} B")
    assert ok <= err

    # --- pointwise-relative bound on a magnitude-spanning field ---
    from ebcc_tpu import RESIDUAL_POINTWISE_RELATIVE_ERROR
    rng = np.random.default_rng(0)
    hum = np.exp(rng.uniform(-12, -2, (1, 256, 512))).astype(np.float32)
    eps = 1e-2
    pcfg = CodecConfig(dims=hum.shape, error=eps,
                       residual_mode=RESIDUAL_POINTWISE_RELATIVE_ERROR)
    pout = ebcc_tpu.decode(ebcc_tpu.encode(hum, pcfg))
    rel = (np.abs(pout - hum) / hum).max()
    print(f"pointwise-relative: field spans {hum.min():.1e}..{hum.max():.1e}, "
          f"max |out/in - 1| = {rel:.4f} <= {eps}")
    assert rel <= eps

    # --- lossless: bit-exact round trip (NaN/Inf included) ---
    from ebcc_tpu import RESIDUAL_LOSSLESS
    exact = frame[None].copy()
    exact[0, 0, 0] = np.nan
    lcfg = CodecConfig(dims=exact.shape, residual_mode=RESIDUAL_LOSSLESS)
    lblob = ebcc_tpu.encode(exact, lcfg)
    lout = ebcc_tpu.decode(lblob)
    assert np.array_equal(lout.view(np.uint32), exact.view(np.uint32))
    print(f"lossless: bit-exact (incl. the NaN), "
          f"CR {exact.nbytes / len(lblob):.2f}")

    # --- both at once ---
    fstack = frames.copy()
    fstack[:, mask] = np.nan
    both = CodecConfig(dims=fstack.shape, residual_mode=RESIDUAL_MAX_ERROR,
                       error=err, temporal=True, allow_nan=True)
    out = ebcc_tpu.decode(ebcc_tpu.encode(fstack, both))
    assert np.isnan(out[:, mask]).all()
    print("temporal + masked compose")


if __name__ == "__main__":
    main()
