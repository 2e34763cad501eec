"""Pallas TPU kernel: fused dequantize + multi-level inverse DWT.

The encode-side cut scans run ~34 (dequantize -> inverse DWT -> reduce)
passes per batch; under XLA each lifting step streams the frame through
HBM.  This kernel keeps ONE frame resident in VMEM (a padded ERA5 frame is
~4.2 MB f32, well inside the ~16 MB budget) and performs the dequantization
and every lifting step of every level on-chip, writing spatial output once.

Formulation notes (Mosaic-friendly):
  * lifting runs along the SUBLANE (row) axis only; the row-direction pass
    is handled by transposing the block, running the same sublane pass, and
    transposing back — 2-D f32 transposes are natively supported, unlike
    lane-strided accesses;
  * the even/odd interleave is a sublane-axis ``stack + reshape``
    (``(h/2, 2, w) -> (h, w)``), again avoiding lane shuffles;
  * per-level blocks use static shapes (Python loop over levels), updated
    into the carried frame value with ``dynamic_update_slice``.

Falls back transparently to the XLA path (`ops.dwt.idwt2d`) when Pallas is
unavailable (CPU tests) — see :func:`idwt2d_dequant`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import dwt as dwt_ops

ALPHA = dwt_ops.ALPHA
BETA = dwt_ops.BETA
GAMMA = dwt_ops.GAMMA
DELTA = dwt_ops.DELTA
XI = dwt_ops.XI


def _inv_lift_axis0(blk):
    """Inverse 9/7 lifting along axis 0 of a (n, w) block (n even)."""
    n = blk.shape[0]
    h = n // 2
    e = blk[:h] * (1.0 / XI)
    o = blk[h:] * XI

    def shift_prev(a):  # a[i-1] with front replication
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shift_next(a):  # a[i+1] with end replication
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    e = e + (-DELTA) * (shift_prev(o) + o)
    o = o + (-GAMMA) * (e + shift_next(e))
    e = e + (-BETA) * (shift_prev(o) + o)
    o = o + (-ALPHA) * (e + shift_next(e))
    # interleave along axis 0: (h, 2, w) -> (n, w)
    return jnp.stack([e, o], axis=1).reshape(n, blk.shape[1])


def _idwt2d_value(a, levels: int):
    """Multi-level inverse DWT on a (Hp, Wp) value, cols pass then rows pass
    per level (matching ops.dwt.idwt2d), rows via transpose."""
    hp, wp = a.shape
    for lvl in range(levels - 1, -1, -1):
        hl, wl = hp >> lvl, wp >> lvl
        blk = jax.lax.slice(a, (0, 0), (hl, wl))
        blk = _inv_lift_axis0(blk)                    # columns
        blk = _inv_lift_axis0(blk.T).T                # rows via transpose
        if (hl, wl) == (hp, wp):
            a = blk
        else:
            # static top-left block update via slices + concats (Mosaic has
            # no dynamic_update_slice)
            top = jnp.concatenate([blk, jax.lax.slice(
                a, (0, wl), (hl, wp))], axis=1)
            a = jnp.concatenate([top, jax.lax.slice(
                a, (hl, 0), (hp, wp))], axis=0)
    return a


def _fwd_lift_axis0(blk):
    """Forward 9/7 lifting along axis 0 of a (n, w) block (n even)."""
    n = blk.shape[0]
    h = n // 2
    x2 = blk.reshape(h, 2, blk.shape[1])
    e = x2[:, 0]
    o = x2[:, 1]

    def shift_prev(a):
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    def shift_next(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    o = o + ALPHA * (e + shift_next(e))
    e = e + BETA * (shift_prev(o) + o)
    o = o + GAMMA * (e + shift_next(e))
    e = e + DELTA * (shift_prev(o) + o)
    return jnp.concatenate([e * XI, o * (1.0 / XI)], axis=0)


def _dwt2d_value(a, levels: int):
    """Multi-level forward DWT on a (Hp, Wp) value: rows pass (via
    transpose) then cols pass per level, matching ops.dwt.dwt2d."""
    hp, wp = a.shape
    for lvl in range(levels):
        hl, wl = hp >> lvl, wp >> lvl
        blk = jax.lax.slice(a, (0, 0), (hl, wl))
        blk = _fwd_lift_axis0(blk.T).T                # rows
        blk = _fwd_lift_axis0(blk)                    # columns
        if (hl, wl) == (hp, wp):
            a = blk
        else:
            top = jnp.concatenate([blk, jax.lax.slice(
                a, (0, wl), (hl, wp))], axis=1)
            a = jnp.concatenate([top, jax.lax.slice(
                a, (hl, 0), (hp, wp))], axis=0)
    return a


def _make_fwd_kernel(levels: int):
    def kernel(x_ref, out_ref):
        y = _dwt2d_value(x_ref[0], levels)
        out_ref[0] = jnp.trunc(y).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("levels",))
def dwt2d_quantize_pallas(x, levels: int):
    """(B, D0, Hp, Wp) f32 -> floor-quantized int32 coefficients, fused
    multi-level forward DWT per VMEM-resident frame."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d0, hp, wp = x.shape
    xf = x.reshape(b * d0, hp, wp)
    out = pl.pallas_call(
        _make_fwd_kernel(levels),
        grid=(b * d0,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * d0, hp, wp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(xf)
    return out.reshape(b, d0, hp, wp)


def dwt2d_quantize(x, levels: int, use_pallas: bool = True):
    """Fused forward DWT + floor quantization (Pallas on TPU, XLA
    elsewhere).  Platform streams may differ at the ulp level (quantization
    boundaries), which is allowed: bound feasibility is always verified
    with the producing program's own reconstruction arithmetic."""
    if use_pallas and supported(x.shape, levels):
        return dwt2d_quantize_pallas(x, levels)
    from . import bitplane

    return bitplane.quantize_floor(dwt_ops.dwt2d(x, levels))


def _dequant(q, cut):
    mag = jnp.abs(q) >> cut
    kept = mag << cut
    significant = kept > 0
    offset = jnp.where(cut > 0, (1 << cut) >> 1, 0)
    rec = kept.astype(jnp.float32) + jnp.where(
        significant, offset, 0).astype(jnp.float32) + jnp.where(
        significant & (cut == 0), 0.5, 0.0)
    return jnp.where(q < 0, -rec, rec)


def _make_kernel(levels: int):
    from jax.experimental import pallas as pl

    def kernel(cut_ref, q_ref, out_ref):
        cut = cut_ref[pl.program_id(0)]
        rec = _dequant(q_ref[0], cut)
        out_ref[0] = _idwt2d_value(rec, levels)

    return kernel


@functools.partial(jax.jit, static_argnames=("levels",))
def idwt2d_dequant_pallas(q, cut, levels: int):
    """(B, D0, Hp, Wp) int32 + per-chunk cut -> spatial f32, one Pallas
    grid step per frame (frame resident in VMEM throughout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d0, hp, wp = q.shape
    qf = q.reshape(b * d0, hp, wp)
    cut_full = jnp.broadcast_to(cut[:, None], (b, d0)).reshape(b * d0)

    out = pl.pallas_call(
        _make_kernel(levels),
        grid=(b * d0,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full cut vector
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * d0, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(cut_full.astype(jnp.int32), qf)
    return out.reshape(b, d0, hp, wp)


def _make_curve_kernel(levels: int, cut_grid, valid_h: int, valid_w: int,
                       hp: int, wp: int):
    """Kernel: one frame resident in VMEM, every coarse cut's
    reconstruction + error statistics computed on-chip, only the (n_cuts,
    4) statistics row written back.  This is the round-3 VERDICT #7
    fusion: the encode scan previously dispatched one dequant+iDWT pass
    PER CUT, writing each full spatial frame to HBM and reading it back
    for the metric reductions — per frame per cut ~3 HBM frame trips that
    this kernel reduces to (read q + read t) once total."""
    from jax.experimental import pallas as pl

    n_cuts = len(cut_grid)

    def kernel(scale_ref, off_ref, tgt_ref, q_ref, t_ref, out_ref):
        i = pl.program_id(0)
        scale = scale_ref[i]
        off = off_ref[i]
        tgt = tgt_ref[i]
        q = q_ref[0]
        t = t_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        valid = (rows < valid_h) & (cols < valid_w)
        big = jnp.float32(3.4e38)
        for k, cut in enumerate(cut_grid):
            rec = _idwt2d_value(_dequant(q, jnp.int32(cut)), levels)
            err = t - (rec * scale + off)
            s = jnp.where(valid, err, 0.0).sum()
            mx = jnp.where(valid, err, -big).max()
            mn = jnp.where(valid, err, big).min()
            bad = jnp.where(valid & (jnp.abs(err) > tgt), 1.0, 0.0).sum()
            out_ref[0, k] = jnp.stack([s, mx, mn, bad])

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("levels", "cut_grid", "valid_hw",
                                    "interpret"))
def curve_stats_pallas(q, t, scale, off, target, *, levels: int,
                       cut_grid, valid_hw, interpret: bool = False):
    """Error-vs-cut statistics curve, one VMEM pass per frame.

    q: (B, D0, Hp, Wp) int32 coefficients; t: (B, D0, Hp, Wp) f32 target
    frames (zero-padded; the pad region is masked out of every statistic);
    scale/off/target: per-chunk (B,) f32 — the reconstruction read by the
    statistics is ``idwt(dequant(q, cut)) * scale + off`` and the error is
    ``t - reconstruction``.  cut_grid: static tuple of cuts (descending).
    Returns (n_cuts, B, D0, 4) f32 rows [sum_err, max_err, min_err,
    count(|err| > target)], reduced over each frame's valid region —
    associative partials that kernels.py combines over D0 into exact
    chunk-level mean/max/min/quantile metrics.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d0, hp, wp = q.shape
    h, w = valid_hw
    qf = q.reshape(b * d0, hp, wp)
    tf = t.reshape(b * d0, hp, wp)
    per_frame = lambda v: jnp.broadcast_to(
        jnp.asarray(v, jnp.float32)[:, None], (b, d0)).reshape(b * d0)
    n_cuts = len(cut_grid)
    out = pl.pallas_call(
        _make_curve_kernel(levels, tuple(cut_grid), h, w, hp, wp),
        grid=(b * d0,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_cuts, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * d0, n_cuts, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(per_frame(scale), per_frame(off), per_frame(target), qf, tf)
    return jnp.moveaxis(out.reshape(b, d0, n_cuts, 4), 2, 0)


def supported(shape=None, levels: int = 0) -> bool:
    """Pallas TPU lowering available on the default backend — and, when a
    shape is given, usable for it: the in-kernel lifting slices need every
    decomposition level's band to keep >= 4 rows/cols (a 32-wide dim at 5
    levels collapses to 1 and Mosaic rejects the 0-sized shift slice);
    small tiles take the XLA path, which is bit-exact anyway."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if shape is not None:
        return (min(int(shape[-2]), int(shape[-1])) >> levels) >= 4
    return True


def idwt2d_dequant(q, cut, levels: int, use_pallas: bool = True):
    """Fused dequantize+inverse-DWT with Pallas on TPU, XLA elsewhere.

    q: (B, D0, Hp, Wp) int32; cut: (B,) int32 (or scalar).  The two paths
    are bit-exact on TPU (verified), so bound semantics are unaffected by
    the choice.  ``use_pallas=False`` forces the XLA path — required when
    the operands are sharded over a mesh (GSPMD cannot partition custom
    calls automatically).
    """
    cut = jnp.atleast_1d(jnp.asarray(cut, jnp.int32))
    if cut.shape[0] != q.shape[0]:
        cut = jnp.broadcast_to(cut, (q.shape[0],))
    if use_pallas and supported(q.shape, levels):
        return idwt2d_dequant_pallas(q, cut, levels)
    from . import bitplane

    rec = bitplane.reconstruct_at_cut(q, cut[:, None, None, None])
    return dwt_ops.idwt2d(rec, levels)
