"""Host<->device transfer compaction for bitplane stacks.

Why this exists: host<->device bandwidth is the end-to-end bottleneck for an
accelerator codec (PCIe on a real TPU host; a far slower tunnel in this
development environment), and the dense bitplane stacks produced by the
encoder are mostly zero.  The zero structure follows the Mallat layout:
bit-plane p can only be nonzero where ``|q| >= 2^p``, and magnitudes decay
from the coarse (top-left) corner outward — so each plane's nonzero support
is confined to its leading rows.

The scheme (row-granularity compaction):
  * The encode program reports each plane's nonzero ROW extent
    (:func:`plane_row_extents`) — a few dozen ints.
  * The host builds an int32 row-index array covering exactly the needed
    rows of the flattened ``(P*B*D0*Hp, Wb)`` plane stack and uploads it
    (sub-MB).
  * ``pack_rows`` is ONE device gather with a large (Wb-byte) slice per
    index — memcpy-fast on TPU, unlike element-granularity gather — and the
    result crosses the link in ONE transfer.
  * The host scatters the rows back into dense stacks with one numpy fancy
    index (:func:`rows_to_dense`).
  * The decode direction mirrors it: :func:`dense_to_rows` on host,
    ``scatter_rows`` on device.

This moves ~3-6 bits per grid point instead of the dense stack's 14+, with
no element-level gather/scatter anywhere.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def bucket_rows(n: int) -> int:
    """Round a row count up to a small ladder (1.25x steps over powers of
    two) so pack/scatter programs compile a handful of variants."""
    if n <= 512:
        return 512
    cap = 512
    while True:
        for m in (cap, cap + cap // 4, cap + cap // 2, cap + 3 * cap // 4):
            if n <= m:
                return m
        cap *= 2


def plane_row_extents(planes):
    """Device-side per-plane nonzero ROW extent.

    planes: (P, B, D0, Hp, Wb) uint8 -> (P,) int32: the max-over-batch count
    of leading rows containing any nonzero byte (0 => plane empty).
    """
    nz = planes != 0
    hp = planes.shape[3]
    row_any = nz.any(axis=(1, 2, 4))  # (P, Hp)
    return (row_any * (jnp.arange(hp, dtype=jnp.int32) + 1)).max(
        axis=1).astype(jnp.int32)


def build_row_index(plane_rows: Sequence[int], extents: Sequence[int],
                    b: int, d0: int, hp: int) -> np.ndarray:
    """Host-side: int32 indices into the flattened (P*B*D0*Hp, Wb) row
    space covering rows [0, extent_p) of every (plane, batch, frame)."""
    parts = []
    bd = np.arange(b * d0, dtype=np.int64)
    for p, r in zip(plane_rows, extents):
        if r <= 0:
            continue
        rows = np.arange(r, dtype=np.int64)
        parts.append(((p * b * d0 + bd)[:, None] * hp + rows[None, :]).ravel())
    if not parts:
        return np.zeros(0, np.int32)
    return np.concatenate(parts).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("cap_rows",))
def pack_rows(planes_comb, row_idx, *, cap_rows: int):
    """Gather the indexed rows of a plane stack into one (cap_rows, Wb)
    buffer.  ``row_idx`` is (cap_rows,) int32, padded with 0 (padding rows
    are fetched but ignored by the host)."""
    p, b, d0, hp, wb = planes_comb.shape
    flat = planes_comb.reshape(p * b * d0 * hp, wb)
    return jnp.take(flat, row_idx, axis=0)


@functools.partial(jax.jit, static_argnames=("cap_rows", "shape"))
def scatter_rows(buffer, row_idx, *, cap_rows: int, shape):
    """Inverse of :func:`pack_rows`: scatter buffer rows into a zeroed
    dense (P,B,D0,Hp,Wb) stack.  ``row_idx`` padding must be -1 (dropped)."""
    p, b, d0, hp, wb = shape
    flat = jnp.zeros((p * b * d0 * hp, wb), jnp.uint8)
    flat = flat.at[row_idx].set(buffer, mode="drop")
    return flat.reshape(shape)


def pad_index(row_idx: np.ndarray, cap_rows: int, fill: int) -> np.ndarray:
    out = np.full(cap_rows, fill, np.int32)
    out[: row_idx.size] = row_idx
    return out


def rows_to_dense(buffer: np.ndarray, row_idx: np.ndarray, shape) -> np.ndarray:
    """Host-side: (n_rows, Wb) buffer + indices -> dense (P,B,D0,Hp,Wb)."""
    p, b, d0, hp, wb = shape
    out = np.zeros((p * b * d0 * hp, wb), np.uint8)
    out[row_idx] = buffer[: row_idx.size]
    return out.reshape(shape)


def dense_to_rows(planes_comb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side mirror of the device pack for the decode direction:
    dense (P,B,D0,Hp,Wb) -> (row_idx, row buffer)."""
    p, b, d0, hp, wb = planes_comb.shape
    nz = planes_comb.any(axis=(1, 2, 4))  # (P, Hp)
    extents = []
    plane_rows = []
    for pr in range(p):
        rows = np.nonzero(nz[pr])[0]
        if rows.size:
            plane_rows.append(pr)
            extents.append(int(rows.max()) + 1)
    row_idx = build_row_index(plane_rows, extents, b, d0, hp)
    flat = planes_comb.reshape(p * b * d0 * hp, wb)
    return row_idx, np.ascontiguousarray(flat[row_idx])
