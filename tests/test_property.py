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
for i in range(14):
    d0 = int(_rng.integers(1, 4)) if i < 10 else int(_rng.integers(2, 6))
    h = int(_rng.integers(33, 200))
    w = int(_rng.integers(40, 260))
    mode = RESIDUAL_MAX_ERROR if i % 2 == 0 else RESIDUAL_RELATIVE_ERROR
    err = float(10 ** _rng.uniform(-3, -0.5)) if mode == RESIDUAL_MAX_ERROR \
        else float(10 ** _rng.uniform(-3, -1.5))
    scale = float(10 ** _rng.uniform(-2, 4))
    off = float(_rng.uniform(-1e4, 1e4))
    backend = ("zstd", "cab", "auto")[i % 3]
    # cases 10+: randomly exercise the beyond-reference modes too
    temporal = i >= 10 and i % 2 == 0
    allow_nan = i >= 10 and i % 2 == 1
    _CASES.append((i, d0, h, w, mode, err, scale, off, backend, temporal,
                   allow_nan))


@pytest.mark.parametrize(
    "seed,d0,h,w,mode,err,scale,off,backend,temporal,allow_nan", _CASES)
def test_random_roundtrip_bound(seed, d0, h, w, mode, err, scale, off,
                                backend, temporal, allow_nan):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(yy / 13.0) * np.cos(xx / 17.0)
            + 0.2 * rng.normal(size=(h, w)))
    x = np.stack([(off + scale * (base + 0.1 * k)).astype(np.float32)
                  for k in range(d0)])
    nan_mask = None
    if allow_nan:
        nan_mask = rng.random((d0, h, w)) < 0.15
        x = x.copy()
        x[nan_mask] = np.nan
    cfg = CodecConfig(dims=x.shape, base_cr=float(rng.uniform(5, 60)),
                      residual_mode=mode, error=err,
                      entropy_backend=backend, temporal=temporal,
                      allow_nan=allow_nan)
    blob = ebcc_tpu.encode(x, cfg)
    out = ebcc_tpu.decode(blob).reshape(x.shape)
    valid = ~nan_mask if nan_mask is not None else np.ones(x.shape, bool)
    bound = err if mode == RESIDUAL_MAX_ERROR else err * float(
        np.nanmax(x) - np.nanmin(x))
    if nan_mask is not None:
        assert np.isnan(out[nan_mask]).all()
    maxe = float(np.abs(out[valid] - x[valid]).max())
    assert maxe <= bound * (1 + 1e-6), (maxe, bound)
    # container route must hold the same bound on a single-chunk config
    blob2 = ebcc_tpu.encode_chunked(x, cfg)
    out2 = ebcc_tpu.decode_chunked(blob2).reshape(x.shape)
    assert float(np.abs(out2[valid] - x[valid]).max()) <= bound * (1 + 1e-6)
