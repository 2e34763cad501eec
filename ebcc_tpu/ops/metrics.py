"""Batched error metrics as fused device reductions.

Parity: the reference computes all of these with serial full-array scans
(``get_data_range``/``get_max_relative_error``/``get_max_error``/
``get_mean_error``/``get_error_target_quantile``/``findMinMaxf``, reference
``src/ebcc_codec.c:450-533``).  Here each is a single fused XLA reduction over
the trailing spatial axes, batched over frames/chunks, so the per-chunk serial
loop disappears and the reductions ride the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_SPATIAL = (-1, -2)


def minmax(x):
    """Per-batch (min, max) over trailing HxW (reference ``findMinMaxf``)."""
    return x.min(axis=_SPATIAL), x.max(axis=_SPATIAL)


def data_range(x):
    lo, hi = minmax(x)
    return hi - lo


def max_abs_error(x, recon):
    return jnp.abs(x - recon).max(axis=_SPATIAL)


def mean_error(x, recon):
    """Signed mean of (x - recon) — drives the mean-error adjustment
    (reference ebcc_codec.c:494-501, 863-868)."""
    return (x - recon).mean(axis=_SPATIAL, dtype=jnp.float64 if x.dtype == jnp.float64 else jnp.float32)


def centered_max_abs_error(x, recon):
    """max |err - mean(err)| — the max error AFTER the mean-error adjustment
    is folded into the stored min/max.  Using this as the feasibility
    criterion makes the error bound hold post-adjustment (the reference
    checks the bound pre-adjustment, ebcc_codec.c:783, and only then shifts
    min/max, which can overshoot; we tighten that)."""
    err = x - recon
    m = err.mean(axis=_SPATIAL, keepdims=True)
    return jnp.abs(err - m).max(axis=_SPATIAL), jnp.squeeze(m, axis=_SPATIAL)


def error_quantile(x, recon, error_target):
    """Fraction of points with |err| <= target (reference
    ``get_error_target_quantile``, ebcc_codec.c:503-513)."""
    err = jnp.abs(x - recon)
    tgt = jnp.asarray(error_target)
    while tgt.ndim < err.ndim:
        tgt = tgt[..., None]
    bad = (err > tgt).sum(axis=_SPATIAL)
    n = x.shape[-1] * x.shape[-2]
    return 1.0 - bad.astype(jnp.float32) / n


def check_finite(x):
    """True iff all entries are finite (reference ``check_nan_inf``,
    ebcc_codec.c:598-605, which hard-exits; we surface a flag)."""
    return jnp.isfinite(x).all()
