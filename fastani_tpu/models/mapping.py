"""Dense, batched L1/L2 fragment mapping.

TPU-first reformulation of the reference's mapping engine:

* L1 (reference: computeMap.hpp:252-354) — hash probes become sorted-array
  range lookups; the consecutive-hit scan and candidate merging become
  sort + shift/compare + segment reductions over a fixed-width hit buffer.
* L2 (reference: computeMap.hpp:418-497 + slidingMap.hpp + MIIteratorL2.hpp)
  — the event-driven sliding super-window is enumerated in closed form:
  the iterator's (begin,end) staircase is exactly the sorted merge of
  entry-start events (pos[i]) and entry-enter events (pos[j]-C+1), so all
  visited window states are computed with two searchsorteds per event; the
  winnowed-MinHash shared count S(W) = |{h in QH∩RH(W) with rank < s in
  QH∪RH(W)}| is evaluated for all events at once with masked cumulative
  sums over hash-sorted candidate entries.

All functions are backend-generic (xp = numpy or jax.numpy), fixed-shape +
masks.  The NumPy instantiation doubles as the exact overflow fallback
(caps sized to the data); the JAX instantiation runs under jit on TPU.
Equivalence to the reference semantics is proven against the scalar oracle
in fastani_tpu.utils.refmodel by the unit tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from fastani_tpu.ops import hashing
from fastani_tpu.ops.xputils import (batched_searchsorted, is_jax,
                                     last_event_value, sliding_pairmin,
                                     take_along)

_UMAX = np.uint32(0xFFFFFFFF)
_PINF = np.int32(2**30)  # position infinity (room for +C arithmetic)


# ---------------------------------------------------------------------------
# Winnowing + fragment sketches (batched)
# ---------------------------------------------------------------------------

def kmer_hashes(xp, seqs_u8, k: int):
    if is_jax(xp):
        return _kmer_hashes_jax_nd(seqs_u8, k)
    return hashing.kmer_hashes_np(seqs_u8, k)


def _kmer_hashes_jax_nd(seqs_u8, k: int):
    """JAX k-mer hashing supporting leading batch axes via static slices."""
    import jax.numpy as jnp

    seq_u32 = seqs_u8.astype(jnp.uint32)
    n_out = seqs_u8.shape[-1] - k + 1
    z = jnp.zeros(seqs_u8.shape[:-1] + (n_out,), dtype=jnp.uint32)
    w1lo, w1hi, w2lo, w2hi = z, z, z, z
    for j in range(min(k, 16)):
        b = seq_u32[..., j : j + n_out]
        v = b << jnp.uint32(8 * (j % 4))
        if j < 4:
            w1lo = w1lo | v
        elif j < 8:
            w1hi = w1hi | v
        elif j < 12:
            w2lo = w2lo | v
        else:
            w2hi = w2hi | v
    if k == 16:
        return hashing.murmur3_low32_block16(w1hi, w1lo, w2hi, w2lo)
    return hashing.murmur3_low32_tail(w1hi, w1lo, w2hi, w2lo, k)


def revcomp(xp, seqs_u8):
    if is_jax(xp):
        return hashing.revcomp_jax(seqs_u8)
    return hashing.revcomp_np(seqs_u8)


def _sliding_argmin(xp, key_h, key_p, w: int):
    """win[i] = lexicographic min of (hash asc, pos desc) over
    [max(0, i-w+1), i], along the last axis (sparse-table doubling —
    scan- and gather-free; see xputils.sliding_pairmin)."""
    return sliding_pairmin(xp, key_h, key_p, w)


def _winnow_batched_pallas(seqs_u8, k: int, w: int, true_lens,
                           interpret: bool):
    """winnow_batched via the fused Pallas kernel (ops/pallas_winnow):
    one VMEM-resident pass instead of ~35 HBM-materialized XLA rounds."""
    import jax.numpy as jnp

    from fastani_tpu.ops import pallas_winnow as pw

    F, Lp = seqs_u8.shape
    n = Lp - k + 1
    halo = w - 1
    width = -(-(halo + Lp) // 1024) * 1024
    rows = jnp.concatenate(
        [jnp.zeros((F, halo), jnp.int32), seqs_u8.astype(jnp.int32),
         jnp.zeros((F, width - halo - Lp), jnp.int32)], axis=1)
    ctg = jnp.arange(F, dtype=jnp.int32)
    base = jnp.zeros(F, jnp.int32)
    tl = jnp.asarray(true_lens).astype(jnp.int32).reshape(F)
    emit, h, _ = pw.winnow_rows(rows, ctg, base, tl, k, w,
                                interpret=interpret)
    idx = jnp.arange(n, dtype=jnp.int32)
    return (emit[:, halo:halo + n], h[:, halo:halo + n],
            idx - (w - 1))


def winnow_batched(xp, seqs_u8, k: int, w: int, true_lens):
    """Batched winnowing; seqs (F, Lp) uppercased bytes, true_lens (F,).

    Returns (emit bool, hash u32, wpos i32), each (F, Lp-k+1).  Semantics
    documented and oracle-tested in fastani_tpu.ops.minimizer.
    """
    if is_jax(xp) and seqs_u8.ndim == 2:
        from fastani_tpu.ops import pallas_winnow as pw

        use, interp = pw.pallas_mode()
        if use:
            return _winnow_batched_pallas(seqs_u8, k, w, true_lens, interp)
    n = seqs_u8.shape[-1] - k + 1
    lead = seqs_u8.shape[:-1]
    hf = kmer_hashes(xp, seqs_u8, k)
    hb = kmer_hashes(xp, revcomp(xp, seqs_u8), k)[..., ::-1]
    idx = xp.arange(n, dtype=xp.int32)
    valid = (hf != hb) & (idx <= xp.asarray(true_lens).reshape(lead + (1,)) - k)
    h = xp.minimum(hf, hb)
    key_h = xp.where(valid, h, xp.asarray(_UMAX))
    key_p = xp.where(valid, xp.broadcast_to(idx, lead + (n,)), -1).astype(xp.int32)
    win_h, win_p = _sliding_argmin(xp, key_h, key_p, w)
    event = valid & (idx >= w - 1)
    # emit-on-change vs the previous event's selected position
    # (commonFunc.hpp:152-161), via shift-based last-event propagation
    last_sel, _ = last_event_value(xp, event, win_p, xp.int32(-2))
    prev_sel = xp.concatenate(
        [xp.full(lead + (1,), -2, xp.int32), last_sel[..., :-1]], axis=-1)
    emit = event & (win_p != prev_sel)
    return emit, win_h, idx - (w - 1)


def sketch_fragments(xp, frags_u8, k: int, w: int, scap: int):
    """Fragment sketches: sorted unique minimizer hashes per fragment.

    frags_u8: (F, L) uppercased fragment bytes (full fragments, length L).
    Returns (qh (F, scap) uint32 padded with UMAX, s (F,) int32, overflow
    (F,) bool).  Mirrors computeMap.hpp:260-274 (sort + unique by hash).
    """
    F, L = frags_u8.shape
    lens = xp.full((F,), L, xp.int32)
    emit, h, _ = winnow_batched(xp, frags_u8, k, w, lens)
    n = h.shape[-1]
    n_emit = emit.sum(axis=-1).astype(xp.int32)
    # single-key sort: un-emitted rows pushed to UMAX (an emitted minimizer
    # hash of exactly UMAX needs both strands ~2^-64 — ignored)
    keys0 = xp.where(emit, h, xp.asarray(_UMAX))
    psort = False
    if is_jax(xp):
        from fastani_tpu.ops import pallas_compact, pallas_sort

        n_pad = max(1024, 1 << (n - 1).bit_length())
        psort = pallas_sort.use_pallas_sort(True, n_pad)
    if psort:
        # emitted minimizers are sparse (density ~2/(w+1), ~8% of
        # positions): butterfly-compact them first, then sort only a
        # narrow row — ~8x fewer element-stages than sorting full width.
        # The narrow cap bounds the EMIT count; overflow joins the
        # sketch-cap overflow path (exact host fallback).
        n_cap = 1024
        while n_cap < 4 * scap:
            n_cap *= 2
        if n_cap < n_pad:
            padz = xp.zeros((F, n_pad - n), bool)
            padk = xp.full((F, n_pad - n), _UMAX, xp.uint32)
            (hc,) = pallas_compact.compact_rows(
                xp.concatenate([emit, padz], axis=-1),
                [(xp.concatenate([keys0, padk], axis=-1), _UMAX)])
            hk = pallas_sort.sort_rows_u32(hc[:, :n_cap])
            nw = n_cap
            emit_over = n_emit > n_cap
        else:
            pad = xp.full((F, n_pad - n), _UMAX, xp.uint32)
            hk = pallas_sort.sort_rows_u32(
                xp.concatenate([keys0, pad], axis=-1))
            nw = n_pad
            emit_over = xp.zeros((F,), bool)
    else:
        hk = xp.sort(keys0, axis=-1)
        nw = n
        emit_over = xp.zeros((F,), bool) if is_jax(xp) \
            else np.zeros((F,), bool)
    j = xp.arange(nw, dtype=xp.int32)
    within = j < n_emit[:, None]
    prev = xp.concatenate([xp.full((F, 1), _UMAX, xp.uint32), hk[..., :-1]], axis=-1)
    first = within & ((j == 0) | (hk != prev))
    s = first.sum(axis=-1).astype(xp.int32)
    # compact unique hashes to the front (stable, so ascending hash order
    # is preserved): butterfly compaction delivers the VALUES directly —
    # no partition sort, no gather (computeMap.hpp:268-274 sort+unique)
    if psort:
        from fastani_tpu.ops import pallas_compact

        (qh,) = pallas_compact.compact_rows(first, [(hk, _UMAX)])
        qh = qh[:, :scap]
    else:
        if not is_jax(xp):
            order2 = xp.argsort(xp.where(first, 0, 1).astype(xp.int32),
                                axis=-1, kind="stable")[:, :scap]
        else:
            order2 = xp.argsort(xp.where(first, 0, 1).astype(xp.int32),
                                axis=-1, stable=True)[:, :scap]
        qh = take_along(xp, hk, xp.clip(order2, 0, nw - 1), -1)[:, :scap]
    jj = xp.arange(scap, dtype=xp.int32)
    qh = xp.where(jj < xp.minimum(s, scap)[:, None], qh, xp.asarray(_UMAX))
    overflow = (s > scap) | emit_over
    return qh, s, overflow


# ---------------------------------------------------------------------------
# L1: candidate regions
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class L1Result:
    sid: object      # (F, cand_cap) int32 candidate contig ids
    start: object    # (F, cand_cap) int32 rangeStartPos
    end: object      # (F, cand_cap) int32 rangeEndPos
    valid: object    # (F, cand_cap) bool
    overflow: object  # (F,) bool — hits or candidates exceeded caps
    n_hits: object = None    # (F,) int32 true L1 hit count (pre-cap)
    n_groups: object = None  # (F,) int32 true candidate count (pre-cap)


def _register_pytree(cls):
    import jax.tree_util as jtu

    fields = [f.name for f in dataclasses.fields(cls)]
    jtu.register_pytree_node(
        cls,
        lambda o: ([getattr(o, n) for n in fields], None),
        lambda _, ch: cls(*ch),
    )
    return cls


_register_pytree(L1Result)


def l1_candidates(xp, qh, s, occ_hash, occ_sid, occ_wpos, min_hits_lut,
                  freq_threshold: int, frag_len: int, hits_cap: int, cand_cap: int,
                  n_occ=None, wpos_bits: Optional[int] = None, occ_packed=None,
                  occ_lut=None, occ_rounds: int = 0,
                  m_values: Optional[tuple] = None):
    """Batched L1 stage.  qh (F, scap) sorted unique hashes (UMAX padded).

    n_occ (traced scalar, optional): true entry count when occ arrays are
    padded (pads hold UMAX hashes; the clamp keeps a genuine UMAX query
    hash from matching them).

    wpos_bits (static, optional): when every contig position fits in
    wpos_bits and (max_seqid << wpos_bits) < 2^32 - 1, the (seqId, wpos)
    hit sort is a single packed-uint32 key sort instead of a 2-pass
    lexsort (~2x cheaper; the caller decides from index metadata).
    """
    F, scap = qh.shape
    M = occ_hash.shape[0]
    jj = xp.arange(scap, dtype=xp.int32)
    qvalid = jj < s[:, None]
    if is_jax(xp) and occ_lut is not None:
        # bucket-LUT probe: the occurrence table is static per index, so a
        # one-time 2^16-bucket LUT + a few binary-descent gather rounds
        # replace XLA's method="sort" searchsorted, which re-sorts the
        # whole ~M-entry table on EVERY batch (the round-2 L1 bottleneck)
        from fastani_tpu.ops.xputils import lut_searchsorted

        lo = lut_searchsorted(xp, occ_hash, occ_lut, qh, occ_rounds, "left")
        hi = lut_searchsorted(xp, occ_hash, occ_lut, qh, occ_rounds, "right")
    elif is_jax(xp):
        # the sort-based lowering beats the default scan on TPU (~3x); one
        # fused call: right-bound of integer hash h == left-bound of h+1
        # (UMAX wrap lands in the pad region, removed by the n_occ clamp)
        q2 = xp.concatenate([qh, qh + xp.uint32(1)], axis=-1)
        r = xp.searchsorted(occ_hash, q2, side="left", method="sort").astype(xp.int32)
        lo, hi = r[:, :scap], r[:, scap:]
    else:
        lo = xp.searchsorted(occ_hash, qh, side="left").astype(xp.int32)
        hi = xp.searchsorted(occ_hash, qh, side="right").astype(xp.int32)
    if n_occ is not None:
        lo = xp.minimum(lo, n_occ)
        hi = xp.minimum(hi, n_occ)
    cnt = xp.maximum(xp.where(qvalid, hi - lo, 0), 0)
    cnt = xp.where(cnt < freq_threshold, cnt, 0)
    cum = xp.cumsum(cnt, axis=-1).astype(xp.int32)
    total = cum[:, -1]
    overflow = total > hits_cap

    # ragged hit-list expansion into (F, hits_cap): source index per slot is
    # slot + a per-bucket offset; bucket offsets materialize via one scatter
    # of offset deltas at bucket starts + a cumsum (gather/search-free)
    hidx = xp.arange(hits_cap, dtype=xp.int32)
    cum_prev = xp.concatenate([xp.zeros((F, 1), xp.int32), cum[:, :-1]], axis=-1)
    d = lo - cum_prev
    d_prev = xp.concatenate([xp.zeros((F, 1), xp.int32), d[:, :-1]], axis=-1)
    inc = d - d_prev
    pos = xp.minimum(cum_prev, hits_cap - 1)
    if is_jax(xp):
        arr = xp.zeros((F, hits_cap), xp.int32).at[
            xp.arange(F, dtype=xp.int32)[:, None], pos].add(inc)
    else:
        arr = np.zeros((F, hits_cap), np.int32)
        np.add.at(arr, (np.arange(F)[:, None], np.asarray(pos)), np.asarray(inc))
    src = hidx[None, :] + xp.cumsum(arr, axis=-1)
    hvalid = hidx[None, :] < xp.minimum(total, hits_cap)[:, None]
    src = xp.clip(src, 0, max(M - 1, 0))

    # gather hit coordinates + sort by (seqId, wpos) — computeMap.hpp:320
    if wpos_bits is not None:
        # packed path: ONE gather of the pre-packed (sid<<bits|wpos) table,
        # then a single-key sort; invalid slots pushed to UMAX
        mask = xp.uint32((1 << wpos_bits) - 1)
        if occ_packed is not None:
            key = xp.where(hvalid, occ_packed[src], xp.asarray(_UMAX))
        else:
            key = ((occ_sid[src].astype(xp.uint32) << wpos_bits)
                   | (occ_wpos[src].astype(xp.uint32) & mask))
            key = xp.where(hvalid, key, xp.asarray(_UMAX))
        if is_jax(xp):
            from fastani_tpu.ops import pallas_sort

            # hits_cap need not be a power of two: only the bitonic
            # NETWORK needs pow2 width, so pad with UMAX for the sort and
            # slice back — the expensive per-slot work (the random hit
            # gather above, the expansion cumsums) then runs at the
            # data-sized width instead of up to 2x over-padded
            n_sort = 1 << max(hits_cap - 1, 1).bit_length()
            if pallas_sort.use_pallas_sort(True, n_sort):
                if n_sort > hits_cap:
                    key = xp.concatenate(
                        [key, xp.full((F, n_sort - hits_cap), _UMAX,
                                      xp.uint32)], axis=-1)
                key = pallas_sort.sort_rows_u32(key)[:, :hits_cap]
            else:
                key = xp.sort(key, axis=-1)
        else:
            key = xp.sort(key, axis=-1)
        hvalid = key != _UMAX
        hit_sid = xp.where(hvalid, (key >> wpos_bits).astype(xp.int32), _PINF)
        hit_wp = xp.where(hvalid, (key & mask).astype(xp.int32), _PINF)
    else:
        hit_sid = xp.where(hvalid, occ_sid[src], _PINF)
        hit_wp = xp.where(hvalid, occ_wpos[src], _PINF)
        order = xp.lexsort((hit_wp, hit_sid), axis=-1)
        hit_sid = take_along(xp, hit_sid, order, -1)
        hit_wp = take_along(xp, hit_wp, order, -1)
        hvalid = take_along(xp, hvalid, order, -1)

    # minimum hits per fragment (>=1; computeMap.hpp:301,316-317)
    m = min_hits_lut[xp.clip(s, 0, min_hits_lut.shape[0] - 1)]
    m = xp.maximum(m, 1).astype(xp.int32)

    # consecutive-hit window test (computeMap.hpp:322-336): partner index
    # is i + (m-1) with a PER-ROW scalar m — a uniform row shift, not a
    # general gather.  With the distinct LUT values known statically
    # (m_values; {1,2,3,4} at reference defaults) the partner lookup is a
    # handful of static shifts + selects instead of a (F, hits_cap)
    # take_along gather (~21 ms/batch each on TPU, the round-3 L1 profile
    # leader).  Requires the packed-key path (one array carries both
    # coordinates); invalid slots hold UMAX, so partner validity is just
    # key2 != UMAX (sorted keys put invalids at the row tail).
    nvalid = hvalid.sum(axis=-1).astype(xp.int32)
    pidx = xp.arange(hits_cap, dtype=xp.int32)
    if m_values is not None and wpos_bits is not None:
        F_ = key.shape[0]
        key2 = xp.full(key.shape, _UMAX, key.dtype)
        for mv in m_values:
            d = int(mv) - 1
            shk = key if d == 0 else xp.concatenate(
                [key[:, d:], xp.full((F_, d), _UMAX, key.dtype)], axis=-1)
            key2 = xp.where(m[:, None] == mv, shk, key2)
        p_ok = key2 != _UMAX
        sid2 = xp.where(p_ok, (key2 >> wpos_bits).astype(xp.int32), _PINF)
        wp2 = xp.where(p_ok, (key2 & mask).astype(xp.int32), _PINF)
    else:
        partner = pidx[None, :] + m[:, None] - 1
        p_ok = partner < nvalid[:, None]
        partner_c = xp.clip(partner, 0, hits_cap - 1)
        sid2 = take_along(xp, hit_sid, partner_c, -1)
        wp2 = take_along(xp, hit_wp, partner_c, -1)
    cand_valid = hvalid & p_ok & (sid2 == hit_sid) & (wp2 - hit_wp < frag_len)
    cand_start = xp.maximum(0, wp2 - frag_len + 1)
    cand_end = hit_wp

    # merge chains IN PLACE (computeMap.hpp:338-350): candidates inherit the
    # hit sort's (seqId, wpos) order with invalid rows interleaved, so the
    # previous VALID candidate's (sid, end) comes from last-event
    # propagation instead of a compaction sort — full-width (F, hits_cap)
    # argsort + gathers cost ~100 ms/batch on TPU, the doubling shifts ~3 ms
    last_sid, _ = last_event_value(xp, cand_valid, hit_sid.astype(xp.int32),
                                   xp.int32(-1))
    last_end, _ = last_event_value(xp, cand_valid, cand_end.astype(xp.int32),
                                   xp.int32(-_PINF))
    prev_sid = xp.concatenate([xp.full((F, 1), -1, xp.int32),
                               last_sid[:, :-1]], axis=-1)
    prev_end = xp.concatenate([xp.full((F, 1), -_PINF, xp.int32),
                               last_end[:, :-1]], axis=-1)
    new_group = cand_valid & ((hit_sid.astype(xp.int32) != prev_sid)
                              | (cand_start > prev_end))
    n_groups = new_group.sum(axis=-1).astype(xp.int32)
    overflow = overflow | (n_groups > cand_cap)

    # group leaders: butterfly compaction moves (sid, start, position)
    # triples of leader rows to the front in one VMEM pass — replaces the
    # binary-key sort + (F, cand_cap) gathers
    from fastani_tpu.ops import pallas_compact

    n_cw = 1 << max(hits_cap - 1, 1).bit_length()
    if pallas_compact.use_pallas_compact(is_jax(xp), n_cw):
        hidx_b = xp.broadcast_to(hidx, new_group.shape).astype(xp.int32)

        def padc(a, fill, dt):
            if n_cw == hits_cap:
                return a.astype(dt)
            return xp.concatenate(
                [a.astype(dt), xp.full((F, n_cw - hits_cap), dt(fill))],
                axis=-1)

        g_sid, g_start, lpos = pallas_compact.compact_rows(
            padc(new_group, 0, xp.int32) != 0,
            [(padc(hit_sid, -1, xp.int32), -1),
             (padc(cand_start, 0, xp.int32), 0),
             (padc(hidx_b, hits_cap, xp.int32), hits_cap)])
        g_sid = g_sid[:, :cand_cap]
        g_start = g_start[:, :cand_cap]
        lpos = lpos[:, :cand_cap]
    else:
        if is_jax(xp):
            lorder = xp.argsort(xp.where(new_group, 0, 1).astype(xp.int32),
                                axis=-1, stable=True)[:, :cand_cap]
        else:
            lorder = xp.argsort(xp.where(new_group, 0, 1).astype(xp.int32),
                                axis=-1, kind="stable")[:, :cand_cap]
        lpos = lorder  # leader positions ARE original hit-row indices
        g_sid = take_along(xp, hit_sid, lorder, -1).astype(xp.int32)
        g_start = take_along(xp, cand_start, lorder, -1).astype(xp.int32)
    g_valid = xp.arange(cand_cap, dtype=xp.int32) < xp.minimum(n_groups, cand_cap)[:, None]
    next_lpos = xp.concatenate([lpos[:, 1:], xp.full((F, 1), hits_cap, xp.int32)], axis=-1)
    gcount = xp.arange(cand_cap, dtype=xp.int32)
    next_is_real = (gcount + 1) < n_groups[:, None]
    # group end = end of its last member = last VALID candidate before the
    # next leader (for the last group: before the end of the row)
    last_member = xp.where(next_is_real, next_lpos - 1, hits_cap - 1)
    g_end = take_along(xp, last_end, xp.clip(last_member, 0, hits_cap - 1),
                       -1).astype(xp.int32)
    g_sid = xp.where(g_valid, g_sid, -1)
    return L1Result(g_sid, g_start, g_end, g_valid, overflow,
                    n_hits=total, n_groups=n_groups)


# ---------------------------------------------------------------------------
# L2: sliding super-window Jaccard
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class L2Result:
    shared: object    # (U,) int32 best shared sketch count
    mean_pos: object  # (U,) int32 meanOptimalPos
    valid: object     # (U,) bool
    overflow: object  # (U,) bool — entry range exceeded ncap


_register_pytree(L2Result)


def _searchsorted_pairs(xp, a_sid, a_wpos, q_sid, q_wpos):
    """lower_bound over global (seqId, wpos) pairs (winSketch.hpp:259-270)."""
    n = a_sid.shape[0]
    pos = xp.zeros(q_sid.shape, dtype=xp.int32)
    if n == 0:
        return pos
    for b in reversed(range(int(n).bit_length())):
        cand = pos + (1 << b)
        ok = cand <= n
        gi = xp.clip(cand - 1, 0, n - 1)
        asid = a_sid[gi]
        awp = a_wpos[gi]
        lt = (asid < q_sid) | ((asid == q_sid) & (awp < q_wpos))
        pos = xp.where(ok & lt, cand, pos)
    return pos


def l2_map_units(xp, qh, s, frag_of_unit, u_sid, u_start, u_end, u_valid,
                 mi_hash, mi_sid, mi_wpos, seq_start,
                 frag_len: int, k: int, w: int, ncap: int,
                 pair_cap: int = 128, *, begin_end=None,
                 prev_g=None, nxt_g=None, backend: str = "auto"):
    """Batched L2 over work units.

    qh (F, scap), s (F,); unit arrays (U,): fragment id, candidate contig /
    range.  Index arrays are the build-order (seqId,wpos)-sorted globals.
    Returns L2Result with per-unit best shared count and mean optimal pos.

    JAX backends delegate to the event-walk kernel (models/l2walk.py) —
    amortized O(1) vector work per super-window event.  The NumPy path
    below keeps the independent closed-form evaluation: per unit, two
    STATIC prefix tables over (query rank x entry position) answer each
    event's rank queries:
      M1[j, x] = #{entries i < x : nonQ, hash < q_j}   (occurrences)
      M2[j, x] = #{entries i < x : hash == q_j}
    In-window duplicate hashes (the reference's ordered-map set semantics)
    are corrected by a compact list of consecutive same-hash position pairs:
    a duplicate exists in [lb,le) iff both pair ends are inside, so
      distinct nonQ below q_j = (M1 diff) - (# active pairs with hash < q_j).
    Units with more than pair_cap such pairs overflow to the host path.
    The two formulations cross-check each other in tests/test_l2walk.py.
    """
    if is_jax(xp):
        from fastani_tpu.models import l2walk

        return l2walk.l2_walk_units(
            qh, s, frag_of_unit, u_sid, u_start, u_end, u_valid,
            mi_hash, mi_sid, mi_wpos, frag_len, k, w, ncap,
            begin_end=begin_end, prev_g=prev_g, nxt_g=nxt_g, backend=backend)

    U = u_sid.shape[0]
    F, scap = qh.shape
    M = mi_hash.shape[0]
    C = frag_len - (w - 1) - (k - 1)  # countMinimizerWindows, computeMap.hpp:428

    sid = xp.where(u_valid, u_sid, 0)
    offs = xp.arange(ncap, dtype=xp.int32)
    b0 = _searchsorted_pairs(xp, mi_sid, mi_wpos, sid, u_start)
    b0c = xp.clip(b0, 0, max(M - 1, 0))
    sw0 = xp.where(u_valid & (b0 < M), mi_wpos[b0c], 0)
    e0 = _searchsorted_pairs(xp, mi_sid, mi_wpos, sid, sw0 + C)
    eL = _searchsorted_pairs(xp, mi_sid, mi_wpos, sid, u_end + frag_len)

    # local entry window [b0, b0+ncap)
    gidx = b0[:, None] + offs[None, :]
    gc = xp.clip(gidx, 0, max(M - 1, 0))
    in_contig = (gidx < M) & (mi_sid[gc] == sid[:, None])
    lh = xp.where(in_contig, mi_hash[gc], xp.asarray(_UMAX))
    lp = xp.where(in_contig, mi_wpos[gc], _PINF).astype(xp.int32)
    overflow = u_valid & ((eL - b0) > ncap)

    e0_loc = xp.clip(e0 - b0, 0, ncap)
    eL_loc = xp.clip(eL - b0, 0, ncap)

    # ---- event enumeration + window bounds from ONE sort: the (begin,end)
    # staircase is the sorted merge of begin events (pos[i], i>=1) and enter
    # events (pos[j]-C+1, j>=e0).  Packing the origin bit into the sort-key
    # LSB makes the same sort yield, via cumulative origin counts,
    #   lb(t) = #{i>=1 : pos_i <= v_t}            (local begin index)
    #   le(t) = e0 + #{j>=e0 : pos_j-C+1 <= v_t}  (local end index)
    # le identity: lp is ascending, so if any masked-j qualifies then every
    # i<e0 qualifies too (cnt = e0 + masked count); if none, le = e0 — both
    # equal max(e0, #{all i: pos_i <= v+C-1}) of the direct definition.
    # Right-count (<=) semantics need each equal-value run to carry the
    # run's FINAL cumulative count, propagated by a reversed last-event
    # pass.  Replaces two O(T*ncap) compare-count tensors (~50 ms per L2
    # chunk on v5e) with O(T log T) shift passes.
    iidx = offs[None, :]
    _pbig = _PINF // 2
    _BIGK = xp.int32(np.int32(2**31 - 1))
    va = xp.where(iidx >= 1, lp, _PINF)                        # pos[i], i>=1
    vb = xp.where(iidx >= e0_loc[:, None], lp - C + 1, _PINF)  # pos[j]-C+1

    def pack(val, origin):
        return xp.where(val >= _pbig, _BIGK,
                        (val.astype(xp.int32) << 1) | origin)

    keys = xp.sort(xp.concatenate([pack(va, 0), pack(vb, 1)], axis=-1),
                   axis=-1)                                    # (U, 2*ncap)
    ev = xp.where(keys == _BIGK, _PINF, keys >> 1)
    origin_b = xp.where(keys == _BIGK, 0, keys & 1).astype(xp.int32)
    ca = xp.cumsum(1 - origin_b, axis=-1).astype(xp.int32)
    cb = xp.cumsum(origin_b, axis=-1).astype(xp.int32)
    run_end = xp.concatenate([ev[:, :-1] != ev[:, 1:],
                              xp.ones((U, 1), bool)], axis=-1)
    rev = lambda x: x[:, ::-1]
    ca, _ = last_event_value(xp, rev(run_end), rev(ca), xp.int32(0))
    cb, _ = last_event_value(xp, rev(run_end), rev(cb), xp.int32(0))
    ca, cb = rev(ca), rev(cb)
    # prepend the initial window (v = sw0) with directly-computed counts
    lb0 = (va <= sw0[:, None]).sum(-1).astype(xp.int32)
    cb0 = (vb <= sw0[:, None]).sum(-1).astype(xp.int32)
    v = xp.concatenate([sw0[:, None], ev], axis=-1)            # (U, T)
    T = 2 * ncap + 1
    lb = xp.concatenate([lb0[:, None], ca], axis=-1)
    le = e0_loc[:, None] + xp.concatenate([cb0[:, None], cb], axis=-1)
    ev_valid = (v < _pbig) & ((b0[:, None] + le) < eL[:, None]) & u_valid[:, None]
    # NB: le is clipped at ncap; windows truncated by ncap are covered by the
    # overflow flag and recomputed exactly on host.

    # ---- static per-unit rank tables
    qh_u = qh[frag_of_unit]          # (U, scap)
    s_u = s[frag_of_unit]            # (U,)
    jrow = xp.arange(scap, dtype=xp.int32)
    # jr[i] = #{query hashes <= hash_i}; exact-match via left search
    jr = batched_searchsorted(xp, qh_u, lh, side="right")      # (U, ncap)
    ql = batched_searchsorted(xp, qh_u, lh, side="left")
    qlc = xp.clip(ql, 0, scap - 1)
    inq = (ql < s_u[:, None]) & (take_along(xp, qh_u, qlc, -1) == lh) & in_contig
    nonq = in_contig & ~inq
    below = nonq[:, None, :] & (jr[:, None, :] <= jrow[None, :, None])
    match = inq[:, None, :] & (ql[:, None, :] == jrow[None, :, None])
    # M1[j, x] = #{entries i < x : nonQ, hash < q_j};  M2: occurrences of q_j
    m1 = xp.cumsum(below.astype(xp.int32), axis=-1)
    m1 = xp.concatenate([xp.zeros((U, scap, 1), xp.int32), m1], axis=-1)  # (U, scap, ncap+1)
    m2 = xp.cumsum(match.astype(xp.int32), axis=-1)
    m2 = xp.concatenate([xp.zeros((U, scap, 1), xp.int32), m2], axis=-1)

    # ---- duplicate-pair list (consecutive same-hash occurrences, pos order)
    order = xp.lexsort((offs[None, :] * xp.ones((U, 1), xp.int32), lh), axis=-1)
    lh_s = take_along(xp, lh, order, -1)
    pidx_s = take_along(xp, xp.broadcast_to(offs, (U, ncap)), order, -1)
    prev_h = xp.concatenate([xp.full((U, 1), _UMAX, xp.uint32), lh_s[:, :-1]], axis=-1)
    prev_pidx = xp.concatenate([xp.full((U, 1), -1, xp.int32), pidx_s[:, :-1]], axis=-1)
    valid_s = take_along(xp, in_contig, order, -1)
    is_pair = (lh_s == prev_h) & valid_s
    # compact pairs sorted by their hash's query rank (jr), for rank queries
    jr_s = take_along(xp, jr, xp.clip(pidx_s, 0, ncap - 1), -1)
    nonq_s = take_along(xp, nonq, xp.clip(pidx_s, 0, ncap - 1), -1)
    n_pairs = (is_pair & nonq_s).sum(axis=-1).astype(xp.int32)
    overflow = overflow | (n_pairs > pair_cap)
    pair_key = xp.where(is_pair & nonq_s, jr_s, scap + 1)
    porder = xp.lexsort((pair_key,), axis=-1)[:, :pair_cap]
    pr_jr = take_along(xp, pair_key, porder, -1)               # (U, pcap) sorted
    pr_prev = take_along(xp, prev_pidx, porder, -1)
    pr_this = take_along(xp, pidx_s, porder, -1)
    pr_ok = pr_jr <= scap

    # pair activity per event: both ends inside [lb, le)
    act = pr_ok[:, None, :] & (pr_prev[:, None, :] >= lb[:, :, None]) \
        & (pr_this[:, None, :] < le[:, :, None])               # (U, T, pcap)

    cact = xp.cumsum(act.astype(xp.int32), axis=-1)
    cact = xp.concatenate([xp.zeros((U, T, 1), xp.int32), cact], axis=-1)
    pj = batched_searchsorted(xp, pr_jr, jrow[None, :].astype(xp.int32),
                              side="right")                 # (U, scap)
    dup = take_along(xp, cact, xp.broadcast_to(pj[:, None, :], (U, T, scap)), -1)
    m1t = xp.swapaxes(m1, -1, -2)                           # (U, ncap+1, scap)
    m2t = xp.swapaxes(m2, -1, -2)
    le_b = xp.clip(le, 0, ncap)[:, :, None]
    lb_b = xp.clip(lb, 0, ncap)[:, :, None]
    m1_le = take_along(xp, m1t, xp.broadcast_to(le_b, (U, T, scap)), -2)
    m1_lb = take_along(xp, m1t, xp.broadcast_to(lb_b, (U, T, scap)), -2)
    m2_le = take_along(xp, m2t, xp.broadcast_to(le_b, (U, T, scap)), -2)
    m2_lb = take_along(xp, m2t, xp.broadcast_to(lb_b, (U, T, scap)), -2)
    d_j = m1_le - m1_lb - dup
    present = (m2_le - m2_lb) > 0
    contrib = present & (jrow[None, None, :] + d_j < s_u[:, None, None]) \
        & (jrow[None, None, :] < s_u[:, None, None])
    s_t = contrib.sum(axis=-1).astype(xp.int32)             # (U, T)

    s_masked = xp.where(ev_valid, s_t, -1)
    best = s_masked.max(axis=-1)
    first_t = xp.argmax(s_masked, axis=-1).astype(xp.int32)
    last_t = (T - 1) - xp.argmax(s_masked[:, ::-1], axis=-1).astype(xp.int32)
    lb_first = take_along(xp, lb, first_t[:, None], -1)[:, 0]
    lb_last = take_along(xp, lb, last_t[:, None], -1)[:, 0]
    pos_first = take_along(xp, lp, xp.clip(lb_first, 0, ncap - 1)[:, None], -1)[:, 0]
    pos_last = take_along(xp, lp, xp.clip(lb_last, 0, ncap - 1)[:, None], -1)[:, 0]
    mean_pos = (pos_first + pos_last) // 2
    shared = xp.maximum(best, 0)
    valid = u_valid & (best > 0)
    mean_pos = xp.where(valid, mean_pos, 0)
    return L2Result(shared, mean_pos, valid, overflow)
