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


_UMAX_ = np.uint32(0xFFFFFFFF)


def _shift_right_pair(xp, h, p, s: int, fill_h, fill_p):
    """(h,p) shifted right by s along the last axis, identity-filled."""
    if s == 0:
        return h, p
    lead = h.shape[:-1]
    fh = xp.full(lead + (s,), fill_h, h.dtype)
    fp = xp.full(lead + (s,), fill_p, p.dtype)
    return (xp.concatenate([fh, h[..., :-s]], axis=-1),
            xp.concatenate([fp, p[..., :-s]], axis=-1))


def sliding_pairmin(xp, key_h, key_p, w: int):
    """win[i] = lexicographic min of (hash asc, pos desc) over
    [max(0, i-w+1), i] along the last axis.

    Sparse-table doubling: build power-of-two span minima with static
    shifts, then combine two overlapping spans for the final window.  All
    ops are elementwise + static pad/slice — no scans, no gathers — which
    keeps XLA:TPU compile time flat (lax scans/gathers on big arrays
    compile 50-100x slower than this form; measured on v5e).
    """
    def pmin(ah, ap, bh, bp):
        take = (bh < ah) | ((bh == ah) & (bp > ap))
        return xp.where(take, bh, ah), xp.where(take, bp, ap)

    h, p = key_h, key_p
    span = 1
    while span * 2 <= w:
        sh, sp = _shift_right_pair(xp, h, p, span, _UMAX_, -1)
        h, p = pmin(h, p, sh, sp)
        span *= 2
    if span < w:
        sh, sp = _shift_right_pair(xp, h, p, w - span, _UMAX_, -1)
        h, p = pmin(h, p, sh, sp)
    return h, p


def last_event_value(xp, event, val, seed):
    """out[i] = val[j] for the largest j <= i with event[j]; seed if none.

    Hillis-Steele doubling along the last axis (log2(n) static shifts);
    seed may be a traced scalar.
    """
    n = event.shape[-1]
    lead = event.shape[:-1]
    has = event
    v = xp.where(event, val, seed)
    d = 1
    while d < n:
        fh = xp.zeros(lead + (d,), dtype=has.dtype if hasattr(has, "dtype") else bool)
        sh_has = xp.concatenate([fh.astype(bool), has[..., :-d]], axis=-1)
        sv = xp.concatenate([xp.broadcast_to(xp.asarray(seed), lead + (d,)).astype(v.dtype), v[..., :-d]], axis=-1)
        v = xp.where(has, v, xp.where(sh_has, sv, v))
        has = has | sh_has
        d *= 2
    return v, has


def build_prefix_lut(xp, table, n_valid=None):
    """Bucket table for lut_searchsorted: lut[p] = first index i with
    table[i] >= (p << 16), p in [0, 65536].  table is a sorted uint32
    array (pads at UMAX are fine — they land in the last bucket).

    One-time O(M + 65k) cost; afterwards every searchsorted over `table`
    needs only ceil(log2(max bucket size)) gather rounds instead of
    re-sorting the table per query batch (XLA's method="sort" sorts
    table+queries every call — the round-2 L1 bottleneck).  On jax the
    lut is an exclusive-prefix histogram of the top 16 bits (the table
    is sorted, so bucket p starts right after all smaller buckets) —
    one scatter-add instead of an XLA sort-based searchsorted."""
    M = table.shape[0]
    if is_jax(xp):
        hist = xp.zeros(65536, xp.int32).at[
            (table >> xp.uint32(16)).astype(xp.int32)].add(1)
        lut = xp.concatenate(
            [xp.zeros((1,), xp.int32), xp.cumsum(hist).astype(xp.int32)])
    else:
        bounds = (np.arange(65536, dtype=np.uint64) << np.uint64(16)).astype(np.uint32)
        lut = np.searchsorted(table, bounds, side="left").astype(np.int32)
        lut = np.concatenate([lut, np.full(1, M, np.int32)])
    return lut


def lut_rounds(lut_np: np.ndarray) -> int:
    """Binary-descent rounds needed for buckets of lut (static int)."""
    mx = int(np.max(np.diff(lut_np.astype(np.int64)))) if len(lut_np) > 1 else 1
    return max(int(np.ceil(np.log2(max(mx, 1) + 1))), 1)


def lut_searchsorted(xp, table, lut, q, rounds=None, side: str = "left"):
    """searchsorted(table, q, side) via the 2^16-bucket LUT: two LUT
    gathers + binary-descent gather rounds into `table`.

    table (M,) sorted uint32; lut from build_prefix_lut over the SAME
    array; q any shape uint32.  rounds: static int >= log2(max bucket),
    or None (jax only) to derive the round count ON DEVICE from the
    lut's max bucket width (a fori_loop with a traced trip count) — the
    fetch-free form: fetching the lut to size the static unroll costs a
    device->host transfer, and ANY such transfer permanently degrades
    the tunneled client's dispatch latency (utils/jitops docstring)."""
    pre = (q >> xp.uint32(16)).astype(xp.int32)
    lo = lut[pre]
    hi = lut[pre + 1]
    M = table.shape[0]

    def step(lo, hi):
        narrow = lo < hi
        mid = (lo + hi) >> 1
        v = table[xp.clip(mid, 0, max(M - 1, 0))]
        go = (v <= q) if side == "right" else (v < q)
        lo = xp.where(narrow & go, mid + 1, lo)
        hi = xp.where(narrow & ~go, mid, hi)
        return lo, hi

    if rounds is None:
        import jax

        nb = (lut[1:] - lut[:-1]).max()             # max bucket width
        n_rounds = 32 - jax.lax.clz(nb.astype(xp.uint32))  # bit_length(nb)
        lo, hi = jax.lax.fori_loop(
            0, n_rounds.astype(xp.int32),
            lambda i, lh: step(*lh), (lo, hi))
        return lo
    for _ in range(rounds):
        lo, hi = step(lo, hi)
    return lo


def sort_rows(xp, keys, values=(), num_keys=None):
    """Sort each row by lexicographic (keys[0] primary).

    keys: tuple of (..., n) arrays.  Returns (sorted_keys, sorted_values).
    """
    ks = list(keys)
    order = xp.lexsort(tuple(reversed(ks)), axis=-1)
    out_k = tuple(take_along(xp, k, order, -1) for k in ks)
    out_v = tuple(take_along(xp, v, order, -1) for v in values)
    return out_k, out_v, order
