"""Backend-generic array primitives (NumPy or jax.numpy).

The mapping kernels are written once against this tiny API and run under
both backends: NumPy for fast host verification/fallback, JAX for TPU.
Everything is fixed-shape + masks (no data-dependent shapes), so the same
code traces under jit.
"""

from __future__ import annotations

import numpy as np


def is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def cummax(xp, x, axis: int = -1):
    if is_jax(xp):
        import jax.lax

        return jax.lax.cummax(x, axis=axis % x.ndim)
    return np.maximum.accumulate(x, axis=axis)


def take_along(xp, a, idx, axis: int = -1):
    return xp.take_along_axis(a, idx, axis=axis)


def batched_searchsorted(xp, a, v, side: str = "left"):
    """Row-wise searchsorted: a (..., n) sorted rows, v (..., m) queries.

    Returns int32 indices with numpy searchsorted semantics, vectorized over
    leading axes via branchless power-of-two descent (log2(n) gathers).
    """
    n = a.shape[-1]
    m = v.shape[-1]
    out_shape = tuple(np.broadcast_shapes(a.shape[:-1], v.shape[:-1])) + (m,)
    pos = xp.zeros(out_shape, dtype=xp.int32)
    if n == 0:
        return pos
    for b in reversed(range(int(n).bit_length())):
        cand = pos + (1 << b)
        ok = cand <= n
        # element a[cand-1] (clamped); compare against v
        gather_idx = xp.clip(cand - 1, 0, n - 1)
        av = take_along(xp, xp.broadcast_to(a, out_shape[:-1] + (n,)), gather_idx, axis=-1)
        if side == "right":
            le = av <= v
        else:
            le = av < v
        pos = xp.where(ok & le, cand, pos)
    return pos


def pairmin_scan(xp, h, p, reverse: bool = False):
    """Inclusive cumulative lexicographic min over (h asc, p desc) pairs
    along the last axis, via doubling (log2(n) steps)."""
    n = h.shape[-1]
    if reverse:
        h = h[..., ::-1]
        p = p[..., ::-1]
    d = 1
    while d < n:
        sh = xp.concatenate([h[..., :d], h[..., :-d]], axis=-1)
        sp = xp.concatenate([p[..., :d], p[..., :-d]], axis=-1)
        # positions < d must not combine with wrapped values: neutralize the
        # wrapped prefix to the identity element (+inf hash, -1 pos)
        idx = xp.arange(n)
        maskfill = idx < d
        inf = xp.asarray(np.uint32(0xFFFFFFFF))
        sh = xp.where(maskfill, inf, sh)
        sp = xp.where(maskfill, -1, sp)
        take = (sh < h) | ((sh == h) & (sp > p))
        h = xp.where(take, sh, h)
        p = xp.where(take, sp, p)
        d *= 2
    if reverse:
        h = h[..., ::-1]
        p = p[..., ::-1]
    return h, p


def sort_rows(xp, keys, values=(), num_keys=None):
    """Sort each row by lexicographic (keys[0] primary).

    keys: tuple of (..., n) arrays.  Returns (sorted_keys, sorted_values).
    """
    ks = list(keys)
    order = xp.lexsort(tuple(reversed(ks)), axis=-1)
    out_k = tuple(take_along(xp, k, order, -1) for k in ks)
    out_v = tuple(take_along(xp, v, order, -1) for v in values)
    return out_k, out_v, order
