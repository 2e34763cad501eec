"""Batched error metrics as fused device reductions.

Parity: the reference computes all of these with serial full-array scans
(``get_data_range``/``get_max_relative_error``/``get_max_error``/
``get_mean_error``/``get_error_target_quantile``/``findMinMaxf``, reference
``src/ebcc_codec.c:450-533``).  Here each is a single fused XLA reduction
over all non-batch axes, batched over frames/chunks, so the per-chunk
serial loop disappears and the reductions ride the VPU.  These are the
metric primitives the encode programs' feasibility scans are built from
(``core.kernels``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axes(x):
    """All axes except the leading batch axis."""
    return tuple(range(1, x.ndim))


def minmax(x):
    """Per-batch (min, max) (reference ``findMinMaxf``)."""
    return x.min(axis=_axes(x)), x.max(axis=_axes(x))


def data_range(x):
    lo, hi = minmax(x)
    return hi - lo


def max_abs_error(x, recon):
    """Per-batch max |x - recon| (reference ``get_max_error``)."""
    return jnp.abs(x - recon).max(axis=_axes(x))


def mean_error(x, recon):
    """Signed mean of (x - recon) — drives the mean-error adjustment
    (reference ebcc_codec.c:494-501, 863-868)."""
    return (x - recon).mean(axis=_axes(x))


def centered_max_abs_error(x, recon):
    """(max |err - mean(err)|, mean(err)) — the max error AFTER the
    mean-error adjustment is folded into the stored min/max.  Using this as
    the feasibility criterion makes the error bound hold post-adjustment
    (the reference checks the bound pre-adjustment, ebcc_codec.c:783, and
    only then shifts min/max, which can overshoot; we tighten that)."""
    err = x - recon
    m = err.mean(axis=_axes(x))
    bshape = (-1,) + (1,) * (x.ndim - 1)
    return jnp.abs(err - m.reshape(bshape)).max(axis=_axes(x)), m


def error_quantile(x, recon, error_target):
    """Fraction of points with |err| <= per-batch target (reference
    ``get_error_target_quantile``, ebcc_codec.c:503-513)."""
    err = jnp.abs(x - recon)
    tgt = jnp.asarray(error_target).reshape((-1,) + (1,) * (x.ndim - 1))
    n = 1
    for d in x.shape[1:]:
        n *= d
    bad = (err > tgt).sum(axis=_axes(x))
    return 1.0 - bad.astype(jnp.float32) / n


def check_finite(x):
    """True iff all entries are finite (reference ``check_nan_inf``,
    ebcc_codec.c:598-605, which hard-exits; we surface a flag)."""
    return jnp.isfinite(x).all()
