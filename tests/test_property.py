"""Randomized property battery: the error-bound and round-trip contracts
must hold across arbitrary shapes, ranges, targets, and backends — not
just the curated fixtures.  (Test-strategy parity: the reference sweeps a
few fixed parameter sets, SURVEY §4; this goes wider with a seeded
generator so failures reproduce.)"""

import numpy as np
import pytest

import ebcc_tpu
from ebcc_tpu import (CodecConfig, RESIDUAL_MAX_ERROR,
                      RESIDUAL_RELATIVE_ERROR)

_CASES = []
_rng = np.random.default_rng(2026)
for i in range(10):
    d0 = int(_rng.integers(1, 4))
    h = int(_rng.integers(33, 200))
    w = int(_rng.integers(40, 260))
    mode = RESIDUAL_MAX_ERROR if i % 2 == 0 else RESIDUAL_RELATIVE_ERROR
    err = float(10 ** _rng.uniform(-3, -0.5)) if mode == RESIDUAL_MAX_ERROR \
        else float(10 ** _rng.uniform(-3, -1.5))
    scale = float(10 ** _rng.uniform(-2, 4))
    off = float(_rng.uniform(-1e4, 1e4))
    backend = ("zstd", "cab", "auto")[i % 3]
    _CASES.append((i, d0, h, w, mode, err, scale, off, backend))


@pytest.mark.parametrize("seed,d0,h,w,mode,err,scale,off,backend", _CASES)
def test_random_roundtrip_bound(seed, d0, h, w, mode, err, scale, off,
                                backend):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(yy / 13.0) * np.cos(xx / 17.0)
            + 0.2 * rng.normal(size=(h, w)))
    x = np.stack([(off + scale * (base + 0.1 * k)).astype(np.float32)
                  for k in range(d0)])
    cfg = CodecConfig(dims=x.shape, base_cr=float(rng.uniform(5, 60)),
                      residual_mode=mode, error=err,
                      entropy_backend=backend)
    blob = ebcc_tpu.encode(x, cfg)
    out = ebcc_tpu.decode(blob).reshape(x.shape)
    bound = err if mode == RESIDUAL_MAX_ERROR else err * float(
        x.max() - x.min())
    maxe = float(np.abs(out - x).max())
    assert maxe <= bound * (1 + 1e-6), (maxe, bound)
    # container route must agree byte-for-byte on a single-chunk config
    blob2 = ebcc_tpu.encode_chunked(x, cfg)
    out2 = ebcc_tpu.decode_chunked(blob2).reshape(x.shape)
    assert float(np.abs(out2 - x).max()) <= bound * (1 + 1e-6)
