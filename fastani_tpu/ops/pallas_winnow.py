"""Fused Pallas winnowing kernel: murmur3(fwd+rc) + canonical min +
windowed argmin + emit-on-change, entirely VMEM-resident.

Replaces the XLA elementwise pipeline (ops/minimizer.winnow_chunk_kernel)
on TPU: the XLA form materializes every doubling round of the sliding
argmin / last-event propagation through HBM, while here a 16 KB segment is
loaded once and all ~900 integer ops per base run from VMEM.

Semantics are bit-identical to ops/minimizer.winnow_model (the literal
deque restatement of reference commonFunc.hpp:92-167): per position hash
fwd and revcomp k-mers (murmur3 x64_128 low32, seed 42), skip palindromic
k-mers, select the rightmost argmin of the canonical hash over the trailing
w-window, emit on selection change (including across segment and chunk
boundaries, carried in SMEM across sequential grid steps).

Data layout: each grid step processes one ROW of a (B, 8, W8) int32 input
(row-major flattening of W = 8*W8 consecutive bytes).  Neighbour access is
two lane/sublane rolls + selects (`_shift`), never a gather.  Rows carry
(contig id, base offset, length) scalars; consecutive rows of one contig
chain their emit-state through SMEM, so arbitrarily long contigs winnow in
ONE dispatch.
"""

from __future__ import annotations

import functools

import numpy as np

SEED = 42  # commonFunc.hpp:32

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53
_A1 = 0x52DCE729
_A2 = 0x38495AB5
_UMAX32 = 0xFFFFFFFF

# segment geometry: W = 8 * W8 bytes per grid row
W8 = 2176          # 17 * 128 lanes
SEG_W = 8 * W8     # 17408


def pallas_mode():
    """(use_pallas, interpret): env FASTANI_PALLAS_WINNOW=1/0/interpret
    overrides the default (compiled Pallas on TPU, XLA elsewhere)."""
    import os

    env = os.environ.get("FASTANI_PALLAS_WINNOW", "")
    if env == "0":
        return False, False
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if env == "interpret":
        return True, not on_tpu
    if env == "1":
        return True, False
    return on_tpu, False


def _u32(c):
    import jax.numpy as jnp

    return jnp.uint32(c & _UMAX32)


def _split(c):
    return (c >> 32) & _UMAX32, c & _UMAX32


# ---------------------------------------------------------------------------
# u64 arithmetic as u32 (hi, lo) pairs — same contract as ops/hashing.py,
# restated here so the kernel body is self-contained for Mosaic.
# ---------------------------------------------------------------------------

def _umulhi32(a, b):
    import jax.numpy as jnp

    u16 = jnp.uint32(16)
    mask = jnp.uint32(0xFFFF)
    a0 = a & mask
    a1 = a >> u16
    b0 = b & mask
    b1 = b >> u16
    lo_lo = a0 * b0
    mid1 = a1 * b0 + (lo_lo >> u16)
    mid2 = a0 * b1 + (mid1 & mask)
    return a1 * b1 + (mid1 >> u16) + (mid2 >> u16)


def _mulc64(ahi, alo, c: int):
    chi, clo = _split(c)
    chi, clo = _u32(chi), _u32(clo)
    lo = alo * clo
    hi = _umulhi32(alo, clo) + alo * chi + ahi * clo
    return hi, lo


def _add64(ahi, alo, bhi, blo):
    import jax.numpy as jnp

    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return ahi + bhi + carry, lo


def _rotl64(hi, lo, r: int):
    import jax.numpy as jnp

    if r == 32:
        return lo, hi
    if r > 32:
        hi, lo = lo, hi
        r -= 32
    rr, ri = jnp.uint32(r), jnp.uint32(32 - r)
    return (hi << rr) | (lo >> ri), (lo << rr) | (hi >> ri)


def _fmix64(hi, lo):
    import jax.numpy as jnp

    one = jnp.uint32(1)
    # h ^= h >> 33  ==  (hi, lo) ^ (0, hi >> 1)
    lo = lo ^ (hi >> one)
    hi, lo = _mulc64(hi, lo, _F1)
    lo = lo ^ (hi >> one)
    hi, lo = _mulc64(hi, lo, _F2)
    lo = lo ^ (hi >> one)
    return hi, lo


def _mul5_add(hi, lo, addend: int):
    import jax.numpy as jnp

    u2, u30 = jnp.uint32(2), jnp.uint32(30)
    shi = (hi << u2) | (lo >> u30)
    slo = lo << u2
    hi5, lo5 = _add64(shi, slo, hi, lo)
    ahi, alo = _split(addend)
    alo_ = _u32(alo)
    lo = lo5 + alo_
    carry = (lo < lo5).astype(jnp.uint32)
    return hi5 + _u32(ahi) + carry, lo


def _murmur3_low32_block16(w1hi, w1lo, w2hi, w2lo):
    """Low 32 bits of murmur3 x64_128 of a 16-byte key (seed 42).
    Mirrors ops/hashing.murmur3_low32_block16 exactly."""
    import jax.numpy as jnp

    h1hi = jnp.zeros_like(w1lo)
    h1lo = jnp.full_like(w1lo, jnp.uint32(SEED))
    h2hi, h2lo = h1hi, h1lo

    k1hi, k1lo = _mulc64(w1hi, w1lo, _C1)
    k1hi, k1lo = _rotl64(k1hi, k1lo, 31)
    k1hi, k1lo = _mulc64(k1hi, k1lo, _C2)
    h1hi, h1lo = h1hi ^ k1hi, h1lo ^ k1lo
    h1hi, h1lo = _rotl64(h1hi, h1lo, 27)
    h1hi, h1lo = _add64(h1hi, h1lo, h2hi, h2lo)
    h1hi, h1lo = _mul5_add(h1hi, h1lo, _A1)

    k2hi, k2lo = _mulc64(w2hi, w2lo, _C2)
    k2hi, k2lo = _rotl64(k2hi, k2lo, 33)
    k2hi, k2lo = _mulc64(k2hi, k2lo, _C1)
    h2hi, h2lo = h2hi ^ k2hi, h2lo ^ k2lo
    h2hi, h2lo = _rotl64(h2hi, h2lo, 31)
    h2hi, h2lo = _add64(h2hi, h2lo, h1hi, h1lo)
    h2hi, h2lo = _mul5_add(h2hi, h2lo, _A2)

    return _finalize_low32(h1hi, h1lo, h2hi, h2lo, 16)


def _finalize_low32(h1hi, h1lo, h2hi, h2lo, length: int):
    import jax.numpy as jnp

    ln = jnp.uint32(length)
    h1lo = h1lo ^ ln
    h2lo = h2lo ^ ln
    h1hi, h1lo = _add64(h1hi, h1lo, h2hi, h2lo)
    h2hi, h2lo = _add64(h2hi, h2lo, h1hi, h1lo)
    h1hi, h1lo = _fmix64(h1hi, h1lo)
    h2hi, h2lo = _fmix64(h2hi, h2lo)
    # final h1 += h2: only the low word is kept
    return h1lo + h2lo


def _murmur3_low32_tail(w1hi, w1lo, w2hi, w2lo, length: int):
    """Keys shorter than 16 bytes: murmur3's tail-only path (zero-padded
    words).  Mirrors ops/hashing.murmur3_low32_tail."""
    import jax.numpy as jnp

    h1hi = jnp.zeros_like(w1lo)
    h1lo = jnp.full_like(w1lo, jnp.uint32(SEED))
    h2hi, h2lo = h1hi, h1lo
    if length > 8:
        k2hi, k2lo = _mulc64(w2hi, w2lo, _C2)
        k2hi, k2lo = _rotl64(k2hi, k2lo, 33)
        k2hi, k2lo = _mulc64(k2hi, k2lo, _C1)
        h2hi, h2lo = h2hi ^ k2hi, h2lo ^ k2lo
    k1hi, k1lo = _mulc64(w1hi, w1lo, _C1)
    k1hi, k1lo = _rotl64(k1hi, k1lo, 31)
    k1hi, k1lo = _mulc64(k1hi, k1lo, _C2)
    h1hi, h1lo = h1hi ^ k1hi, h1lo ^ k1lo
    return _finalize_low32(h1hi, h1lo, h2hi, h2lo, length)


# ---------------------------------------------------------------------------
# (8, W8) row-major shifted views: 2 rolls + selects, no gathers
# ---------------------------------------------------------------------------

def _shift(x, s: int, fill, col, flat, n_flat: int, w8: int = W8):
    """shifted[i] = x[i - s] over the row-major flattening of (8, w8);
    positions i < s get `fill`.  s may be negative (lookahead) or exceed
    w8.  col/flat are iota arrays shared across calls."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    if s == 0:
        return x
    if s > 0:
        q, rem = divmod(s, w8)
        a = pltpu.roll(x, rem, 1) if rem else x
        a = pltpu.roll(a, q % 8, 0) if q % 8 else a
        b = pltpu.roll(a, 1, 0)
        out = jnp.where(col >= rem, a, b)
        return jnp.where(flat < s, fill, out)
    s = -s
    q, rem = divmod(s, w8)
    a = pltpu.roll(x, (w8 - rem) % w8, 1) if rem else x
    a = pltpu.roll(a, (8 - q % 8) % 8, 0) if q % 8 else a
    b = pltpu.roll(a, 7, 0)
    out = jnp.where(col < w8 - rem, a, b)
    return jnp.where(flat >= n_flat - s, fill, out)


def _comp_bases(b):
    """A<->T, C<->G on ASCII byte values, others unchanged
    (commonFunc.hpp:37-54) — arithmetic, no table gather."""
    import jax.numpy as jnp

    at = (b == 65) | (b == 84)
    cg = (b == 67) | (b == 71)
    return jnp.where(at, 149 - b, jnp.where(cg, 138 - b, b))


def _winnow_row_kernel(k: int, w: int, seg: int, w8: int,
                       ctg_ref, base_ref, len_ref,
                       seq_ref, emit_ref, hash_ref, wpos_ref,
                       carry_sel_ref, carry_ctg_ref):
    """One (8, W8) segment row; carries emit-state across rows of the same
    contig through SMEM (grid steps run in order)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        # SMEM scratch is uninitialized at the first grid step; contig ids
        # are >= 0, so -1 forces a fresh emit-seed for the first row
        carry_ctg_ref[0] = -1
        carry_sel_ref[0] = -2

    my_ctg = ctg_ref[r]

    halo = w - 1
    x = seq_ref[0]                                     # (8, w8) int32 bytes
    col = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 0)
    flat = row8 * w8 + col
    n_flat = 8 * w8

    # uppercase (commonFunc.hpp:57-66)
    x = jnp.where((x >= 97) & (x <= 122), x - 32, x)

    # byte lookaheads b_j[i] = x[i + j], j in [0, k)
    sh = lambda arr, s, fill: _shift(arr, s, fill, col, flat, n_flat, w8)
    bj = [x if j == 0 else sh(x, -j, 0) for j in range(k)]
    cj = [_comp_bases(b) for b in bj]

    def pack(words):
        """LE-pack byte list into (w1hi, w1lo, w2hi, w2lo) u32 words."""
        import jax.numpy as jnp

        acc = [jnp.zeros((8, w8), jnp.uint32) for _ in range(4)]
        for j, b in enumerate(words):
            v = b.astype(jnp.uint32) << jnp.uint32(8 * (j % 4))
            slot = (1, 0, 3, 2)[j // 4]  # (w1lo, w1hi, w2lo, w2hi) order
            acc[slot] = acc[slot] | v
        return acc  # [w1hi, w1lo, w2hi, w2lo]

    mm = (_murmur3_low32_block16 if k == 16
          else functools.partial(_murmur3_low32_tail, length=k))
    hf = mm(*pack(bj))
    # reverse strand: revcomp bytes in reverse order
    hb = mm(*pack(list(reversed(cj))))

    base = base_ref[r]
    true_len = len_ref[r]
    gidx = flat + (base - halo)
    valid = (hf != hb) & (gidx >= 0) & (gidx <= true_len - k)
    h = jnp.where(hf < hb, hf, hb)   # Mosaic lacks arith.minui
    key_h = jnp.where(valid, h, jnp.uint32(_UMAX32))
    key_p = jnp.where(valid, gidx, -1)

    # rightmost argmin over trailing w-window: sparse-table doubling
    def pmin(ah, ap, bh, bp):
        take = (bh < ah) | ((bh == ah) & (bp > ap))
        return jnp.where(take, bh, ah), jnp.where(take, bp, ap)

    wh, wp = key_h, key_p
    span = 1
    while span * 2 <= w:
        wh, wp = pmin(wh, wp, sh(wh, span, jnp.uint32(_UMAX32)),
                      sh(wp, span, -1))
        span *= 2
    if span < w:
        wh, wp = pmin(wh, wp, sh(wh, w - span, jnp.uint32(_UMAX32)),
                      sh(wp, w - span, -1))

    # emit-on-change: propagate last event's selected position, seeded from
    # the previous segment of the same contig (SMEM carry)
    fresh = carry_ctg_ref[0] != my_ctg
    seed = jnp.where(fresh, -2, carry_sel_ref[0])
    # events are confined to this row's scored span [halo, halo+seg);
    # the tail overlap belongs to the NEXT row (it re-scores it), so it
    # must not pollute the carry
    event = valid & (gidx >= w - 1) & (flat >= halo) & (flat < halo + seg)
    lastv = jnp.where(event, wp, seed)
    has = event.astype(jnp.int32)        # Mosaic rolls need 32-bit data
    d = 1
    while d < n_flat:
        sv = sh(lastv, d, seed)
        shas = sh(has, d, 0)
        lastv = jnp.where(has != 0, lastv, jnp.where(shas != 0, sv, lastv))
        has = has | shas
        d *= 2
    prev_sel = sh(lastv, 1, seed)
    emit = event & (wp != prev_sel)

    emit_ref[0] = emit.astype(jnp.int32)
    hash_ref[0] = wh
    wpos_ref[0] = gidx - (w - 1)

    # carry out: last event's selection (seed if this row had no event)
    carry_sel_ref[0] = lastv[7, w8 - 1]
    carry_ctg_ref[0] = my_ctg


@functools.lru_cache(maxsize=None)
def _winnow_call(k: int, w: int, seg: int, w8: int, n_rows: int,
                 interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_winnow_row_kernel, k, w, seg, w8)
    row = pl.BlockSpec((1, 8, w8), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    # whole scalar arrays live in SMEM; the kernel indexes them by
    # program_id (per-step rank-1 blocks do not lower on real TPU)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=(n_rows,),
        in_specs=[scalar, scalar, scalar, row],
        out_specs=(row, row, row),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 8, w8), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, 8, w8), jnp.uint32),
            jax.ShapeDtypeStruct((n_rows, 8, w8), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )


def winnow_rows(seq_rows, ctg, base, true_len, k: int, w: int,
                seg: int = None, interpret: bool = False):
    """Winnow a batch of segment rows.

    seq_rows: (R, SEG_W) int32 byte values covering global positions
        [base[r] - (w-1), base[r] - (w-1) + SEG_W) of contig ctg[r]
        (zero-padded outside the contig).
    ctg:      (R,) int32 contig ids; consecutive equal ids chain the
        emit-carry (rows of one contig MUST be consecutive and ordered).
    base:     (R,) int32 first scored global position of the row.
    true_len: (R,) int32 contig length.

    Returns (emit (R, SEG_W) bool, hash (R, SEG_W) u32, wpos (R, SEG_W)
    i32); only flat positions in [w-1, w-1+seg) per row are scored
    (the leading halo and trailing tail are never emit=True).
    """
    import jax
    import jax.numpy as jnp

    R, width = seq_rows.shape
    assert width % (8 * 128) == 0, width
    w8 = width // 8
    seq3 = seq_rows.reshape(R, 8, w8).astype(jnp.int32)
    if seg is None:
        seg = width - (w - 1) - (k - 1)
    # CRITICAL (axon/tunnel): the scalar operands land in SMEM.  If XLA
    # constant-folds them (callers often build them with arange/zeros
    # inside the enclosing jit), the Mosaic call executes with
    # constant SMEM buffers — which knocks the PJRT client out of async
    # dispatch PERMANENTLY for the whole process: every subsequent
    # dispatch of ANY program then pays the ~25 ms tunnel round trip
    # (measured 0.1 ms -> 25 ms for an unrelated matmul).  The
    # optimization barrier keeps them materialized as computed buffers.
    ctg, base, true_len = jax.lax.optimization_barrier(
        (ctg.astype(jnp.int32), base.astype(jnp.int32),
         true_len.astype(jnp.int32)))
    emit, h, wp = _winnow_call(k, w, seg, w8, R, interpret)(
        ctg, base, true_len, seq3)
    return (emit.reshape(R, width) != 0), h.reshape(R, width), \
        wp.reshape(R, width)
