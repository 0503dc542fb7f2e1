"""Event-walk L2: amortized O(1) vector work per super-window event.

TPU-first replacement for the closed-form rank-table L2 evaluation
(reference semantics: src/map/include/computeMap.hpp:418-497 window loop,
src/map/include/slidingMap.hpp:137-284 incremental bottom-s maintenance,
src/map/include/MIIteratorL2.hpp:74-96 event-driven window advance).

Derivation.  Let QH = {q_0 < q_1 < ... < q_{s-1}} be the fragment's sketch
and RH(W) the reference hashes inside super-window W.  All of QH is always
in the union the SlideMapper maintains, so with

    D_j(W) = #{ distinct h in RH(W) \\ QH : h < q_j }
    m_j(W) = j + D_j(W)            (= rank of q_j in QH \\cup RH(W))

m_j is strictly increasing in j, hence {j : m_j < s} is a prefix [0, j*)
and  sharedSketchElements(W) = #{ j < j* : q_j in RH(W) }.

Every window event inserts or deletes ONE reference entry (MIIteratorL2),
whose effect on the state is
  * nonQ entry, distinct-in-window change:  m_j += +-1 for all j >= jr
    (jr = #{q <= h}, a suffix update), and
  * query-matching entry, distinct change:  present_{jm} ^= 1 (one lane),
so the walk is a scan whose per-event body is a handful of elementwise
vector ops over the s query ranks, with NO gathers and NO rank tables.
"Distinct change" is decided from per-entry previous/next same-(hash,seqId)
occurrence links (prev/nxt), which replace the reference's ordered-map
presence checks exactly.

Two backends over identical precomputed event streams:
  * lax.scan   — runs anywhere (CPU tests, fallback),
  * Pallas     — VMEM-resident state, units along lanes (TPU).
"""

from __future__ import annotations

import functools

import numpy as np

_UMAX = np.uint32(0xFFFFFFFF)
_PINF = np.int32(2**30)
_CLAMP = np.int32(1 << 28)   # event values clamp here; anything >= is a pad
_NOSCORE = np.int32(-5)      # below the best-tracker init (-1)


def prev_next_global(mi_hash, mi_sid, order=None):
    """Per-entry previous/next same-(hash, seqId) occurrence (build order).

    The build-order array is sorted by (seqId, wpos); a stable argsort by
    hash therefore groups equal hashes with same-seqId runs contiguous and
    wpos-ascending, so adjacent pairs give the immediate neighbours.  Pads
    (hash UMAX) link only to each other and are never dereferenced.
    ``order``: the stable hash argsort if the caller already has it (the
    device build saves its assembly permutation as index.occ_order, which
    skips re-sorting the whole table at mapper init).
    Returns (prev, nxt) int32 arrays: prev=-1 / nxt=2^30 when none.
    """
    import jax.numpy as jnp

    M = mi_hash.shape[0]
    if order is None:
        order = jnp.argsort(mi_hash, stable=True).astype(jnp.int32)
    oh = mi_hash[order]
    os_ = mi_sid[order]
    same = (oh[1:] == oh[:-1]) & (os_[1:] == os_[:-1])
    prev_occ = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), jnp.where(same, order[:-1], -1)])
    nxt_occ = jnp.concatenate(
        [jnp.where(same, order[1:], _PINF), jnp.full((1,), _PINF, jnp.int32)])
    prev_g = jnp.zeros(M, jnp.int32).at[order].set(prev_occ)
    nxt_g = jnp.zeros(M, jnp.int32).at[order].set(nxt_occ)
    return prev_g, nxt_g


def _entry_slices(jnp, u_valid, sid, b0, mi_hash, mi_sid, mi_wpos,
                  prev_g, nxt_g, ncap, contiguous: bool):
    """Local entry window [b0, b0+ncap) as dense per-unit rows."""
    import jax

    M = mi_hash.shape[0]
    offs = jnp.arange(ncap, dtype=jnp.int32)
    if contiguous:
        # caller guarantees >= ncap sentinel padding past the last entry
        start = jnp.clip(b0, 0, M - ncap)
        take = lambda arr: jax.vmap(
            lambda st: jax.lax.dynamic_slice(arr, (st,), (ncap,)))(start)
        sid_w = take(mi_sid)
        in_contig = sid_w == sid[:, None]
        lh = jnp.where(in_contig, take(mi_hash), jnp.asarray(_UMAX))
        lp = jnp.where(in_contig, take(mi_wpos), _PINF).astype(jnp.int32)
        pv = take(prev_g) - start[:, None]
        nx = take(nxt_g) - start[:, None]
    else:
        gidx = b0[:, None] + offs[None, :]
        gc = jnp.clip(gidx, 0, max(M - 1, 0))
        in_contig = (gidx < M) & (mi_sid[gc] == sid[:, None])
        lh = jnp.where(in_contig, mi_hash[gc], jnp.asarray(_UMAX))
        lp = jnp.where(in_contig, mi_wpos[gc], _PINF).astype(jnp.int32)
        pv = prev_g[gc] - b0[:, None]
        nx = nxt_g[gc] - b0[:, None]
    return lh, lp, in_contig, pv, nx


def build_events(qh, s, frag_of_unit, u_sid, u_start, u_end, u_valid,
                 mi_hash, mi_sid, mi_wpos, frag_len: int, k: int, w: int,
                 ncap: int, begin_end=None, prev_g=None, nxt_g=None):
    """Precompute the serialized event stream for a chunk of units.

    Returns (ev, aux): ev is a dict of (U, T) arrays with T = 2*ncap + 1 —
    the sorted merge of enter events (value lp[i]-C+1, all entries), leave
    events (value lp[i], i >= 1) and one synthetic scoring event at the
    initial window value sw0 (codes 0/1/2; within an equal-value run enters
    sort first and the synthetic last, matching the run-final evaluation of
    MIIteratorL2::next).  aux carries (s_u, overflow, n_ev).
    """
    import jax.numpy as jnp

    from fastani_tpu.models.mapping import _searchsorted_pairs

    U = u_sid.shape[0]
    M = mi_hash.shape[0]
    C = frag_len - (w - 1) - (k - 1)   # countMinimizerWindows, computeMap.hpp:428
    sid = jnp.where(u_valid, u_sid, 0)
    if prev_g is None or nxt_g is None:
        prev_g, nxt_g = prev_next_global(mi_hash, mi_sid)

    if begin_end is not None:
        b0, eL = begin_end
        b0 = jnp.clip(b0, 0, M - ncap)
        lh, lp, in_contig, pv, nx = _entry_slices(
            jnp, u_valid, sid, b0, mi_hash, mi_sid, mi_wpos, prev_g, nxt_g,
            ncap, contiguous=True)
        sw0 = jnp.where(in_contig[:, 0], lp[:, 0], 0)
    else:
        b0 = _searchsorted_pairs(jnp, mi_sid, mi_wpos, sid, u_start)
        b0c = jnp.clip(b0, 0, max(M - 1, 0))
        sw0 = jnp.where(u_valid & (b0 < M), mi_wpos[b0c], 0).astype(jnp.int32)
        eL = _searchsorted_pairs(jnp, mi_sid, mi_wpos, sid,
                                 u_end + frag_len)
        lh, lp, in_contig, pv, nx = _entry_slices(
            jnp, u_valid, sid, b0, mi_hash, mi_sid, mi_wpos, prev_g, nxt_g,
            ncap, contiguous=False)
    overflow = u_valid & ((eL - b0) > ncap)
    eL_loc = jnp.clip(eL - b0, 0, ncap).astype(jnp.int32)

    # per-entry query-rank attributes via compare-broadcast (binary-search
    # gathers lower poorly on TPU; the (U, scap, ncap) compares fuse into
    # the reduction and cost ~1 ms per 128-unit chunk)
    from fastani_tpu.ops.xputils import last_event_value, take_along

    qh_u = qh[frag_of_unit]                       # (U, scap)
    s_u = s[frag_of_unit].astype(jnp.int32)       # (U,)
    scap = qh_u.shape[-1]
    jrow3 = jnp.arange(scap, dtype=jnp.int32)[None, :, None]
    lt = (qh_u[:, :, None] < lh[:, None, :])
    eq = (qh_u[:, :, None] == lh[:, None, :])
    ql = lt.sum(1).astype(jnp.int32)              # #{q < h} (== match index)
    jr = ql + eq.sum(1).astype(jnp.int32)         # #{q <= h}
    inq = (eq & (jrow3 < s_u[:, None, None])).any(1) & in_contig
    nonq = in_contig & ~inq

    # Gather-free event attribution.  The sorted event stream visits each
    # class in ENTRY ORDER (enter keys (lp_e+1)<<2|0 and leave keys
    # (lp_i+C)<<2|1 are both monotone in the entry index), so the j-th
    # enter event is entry j-1 and the j-th leave event departs entry j-1
    # (the window begin moving to entry j evicts j-1).  Each entry's
    # attributes therefore ride the event-merge sort as a PAYLOAD — no
    # post-sort take_along gathers (XLA row gathers run at ~100 M elem/s
    # on TPU and dominated the round-3 profile at ~7.6 ms per chunk).
    #
    # Distinct-membership changes evaluate POST-sort from the cumsums:
    #   at entry e's enter event, leaves processed so far = lb_t, and
    #   lb_t == #{i>=1 : lp_i <= lp_e - C} exactly (key order), so the
    #   hash is new iff prev[e] < lb_t;
    #   at the leave event evicting e, enters processed = le_t ==
    #   #{j : lp_j <= lp_e + C - 1}, so the hash departs iff nxt[e] >= le_t.
    # The payload packs (ql, jr, inq, nonq) + clip(pv)+1 for enters /
    # clip(nx) for leaves into 32 bits.
    assert scap <= 1023, "sketch_cap exceeds the packed-record field width"
    assert ncap <= 1022, "l2_entry_cap exceeds the packed-record field width"
    bit = lambda b, sh: b.astype(jnp.uint32) << sh
    rec_base = (ql.astype(jnp.uint32) | (jr.astype(jnp.uint32) << 10)
                | bit(inq, 20) | bit(nonq, 21))
    pv_f = jnp.clip(pv, -1, ncap).astype(jnp.uint32) + 1   # [0, ncap+1]
    nx_f = jnp.clip(nx, 0, ncap).astype(jnp.uint32)        # [0, ncap]
    rec_en = rec_base | (pv_f << 22)
    # leave event at lp_i evicts entry i-1: shift the leave payload right
    # by one so column i carries entry i-1's record (column 0 is masked —
    # va[:, 0] is _PINF)
    rec_lv_e = rec_base | (nx_f << 22)
    rec_lv = jnp.concatenate(
        [jnp.zeros((rec_lv_e.shape[0], 1), jnp.uint32), rec_lv_e[:, :-1]],
        axis=-1)

    # serialized event merge: key = (value + C) << 2 | code
    offs = jnp.arange(ncap, dtype=jnp.int32)
    va = jnp.where((offs[None, :] >= 1) & in_contig, lp, _PINF)      # leaves
    vb = jnp.where(in_contig, lp - C + 1, _PINF)                     # enters

    def pack(v, code):
        return (jnp.minimum(v + C, _CLAMP) << 2) | code

    keys0 = jnp.concatenate(
        [pack(vb, 0), pack(va, 1), pack(sw0[:, None], 2)], axis=-1)
    pay0 = jnp.concatenate(
        [rec_en, rec_lv, jnp.zeros((rec_en.shape[0], 1), jnp.uint32)],
        axis=-1)
    from fastani_tpu.ops import pallas_sort

    T0 = keys0.shape[-1]
    Tp = max(1024, 1 << (T0 - 1).bit_length())
    if pallas_sort.use_pallas_sort(True, Tp):
        # keys are non-negative int32, so u32 order == int order; the
        # (Tp - T0) UMAX pads sort past every real or clamped key and the
        # slice drops exactly them.  Real keys are row-unique (positions
        # are strictly increasing and the code bit splits classes), so
        # the unstable bitonic network permutes payloads deterministically;
        # clamped/pad keys tie, but their payloads are masked by `real`.
        padk = jnp.full((keys0.shape[0], Tp - T0), jnp.uint32(0xFFFFFFFF))
        padp = jnp.zeros((keys0.shape[0], Tp - T0), jnp.uint32)
        keys_u, pay = pallas_sort.sort_rows_u32_kv(
            jnp.concatenate([keys0.astype(jnp.uint32), padk], axis=-1),
            jnp.concatenate([pay0, padp], axis=-1))
        keys = keys_u[:, :T0].astype(jnp.int32)
        rec_e = pay[:, :T0]
    else:
        order = jnp.argsort(keys0, axis=-1)
        keys = take_along(jnp, keys0, order, -1)
        rec_e = take_along(jnp, pay0, order, -1)
    vt = keys >> 2                          # event value + C
    code = keys & 3
    real = vt < _CLAMP
    is_enter = (code == 0) & real
    is_leave = (code == 1) & real
    lb_t = jnp.cumsum(is_leave, axis=-1).astype(jnp.int32)
    le_t = jnp.cumsum(is_enter, axis=-1).astype(jnp.int32)
    jm_e = (rec_e & 0x3FF).astype(jnp.int32)
    jr_e = ((rec_e >> 10) & 0x3FF).astype(jnp.int32)
    pvnx = ((rec_e >> 22) & 0x3FF).astype(jnp.int32)
    eff = jnp.where(is_enter, (pvnx - 1) < lb_t, pvnx >= le_t)
    sign = jnp.where(is_enter, 1, -1).astype(jnp.int32)
    live = is_enter | is_leave
    dn = jnp.where(live & eff & (((rec_e >> 21) & 1) != 0), sign, 0)
    dq = jnp.where(live & eff & (((rec_e >> 20) & 1) != 0), sign, 0)

    U_ = keys.shape[0]
    run_end = jnp.concatenate(
        [vt[:, :-1] != vt[:, 1:], jnp.ones((U_, 1), bool)], axis=-1)
    scored = (run_end & real & (vt >= (sw0 + C)[:, None])
              & (le_t < eL_loc[:, None]) & u_valid[:, None])
    # poslb(t) = lp[lb_t(t)]: the j-th leave is entry j (leave value IS
    # lp_j), so lp[lb_t] equals the value of the most recent leave event —
    # a forward last-event propagation seeded with lp[0] (no gather)
    lv_val = jnp.where(is_leave, vt - C, 0).astype(jnp.int32)
    prop, _ = last_event_value(jnp, is_leave, lv_val, jnp.int32(0))
    poslb = jnp.where(lb_t > 0, prop, lp[:, :1])
    n_ev = real.sum(axis=-1).astype(jnp.int32)

    ev = dict(dn=dn, dq=dq, jr=jr_e, jm=jm_e,
              scored=scored, pos=poslb)
    return ev, (s_u, overflow, n_ev)


def walk_scan(ev, s_u, scap: int):
    """lax.scan walk; returns (best, posf, posl) each (U,) int32."""
    import jax
    import jax.numpy as jnp

    U = s_u.shape[0]
    jrow = jnp.arange(scap, dtype=jnp.int32)[None, :]
    s_col = s_u[:, None]

    def step(carry, e):
        m, pres, best, posf, posl = carry
        dn, dq, jr, jm, scf, pos = e
        m = m + dn[:, None] * (jrow >= jr[:, None]).astype(jnp.int32)
        pres = pres + dq[:, None] * (jrow == jm[:, None]).astype(jnp.int32)
        jstar = (m < s_col).sum(axis=-1).astype(jnp.int32)
        cnt = ((pres > 0) & (jrow < jstar[:, None])).sum(axis=-1)
        sc = jnp.where(scf, cnt.astype(jnp.int32), _NOSCORE)
        better = sc > best
        posf = jnp.where(better, pos, posf)
        posl = jnp.where(better | (sc == best), pos, posl)
        best = jnp.maximum(best, sc)
        return (m, pres, best, posf, posl), None

    init = (jnp.broadcast_to(jrow, (U, scap)).astype(jnp.int32),
            jnp.zeros((U, scap), jnp.int32),
            jnp.full((U,), -1, jnp.int32),
            jnp.zeros((U,), jnp.int32), jnp.zeros((U,), jnp.int32))
    xs = tuple(jnp.swapaxes(ev[k], 0, 1)
               for k in ("dn", "dq", "jr", "jm", "scored", "pos"))
    (m, pres, best, posf, posl), _ = jax.lax.scan(step, init, xs)
    return best, posf, posl


@functools.lru_cache(maxsize=None)
def _walk_pallas_call(T: int, U: int, scap: int, interpret: bool = False):
    """Pallas walk over one block of U units (units along LANES, query
    ranks along sublanes): state (scap, U) lives in registers/VMEM for the
    whole event stream — zero HBM traffic per step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BU = 128
    grid = U // BU

    def kernel(dn_ref, dq_ref, jr_ref, jm_ref, sc_ref, pos_ref, s_ref,
               nev_ref, best_ref, posf_ref, posl_ref):
        jrow = jax.lax.broadcasted_iota(jnp.int32, (scap, BU), 0)
        s_row = s_ref[:]                         # (1, BU)
        n = jnp.max(nev_ref[:])                  # block loop bound

        def body(t, carry):
            m, pres, best, posf, posl = carry
            row = lambda r: r[pl.ds(t, 1), :]    # (1, BU)
            dn = row(dn_ref)
            dq = row(dq_ref)
            jr = row(jr_ref)
            jm = row(jm_ref)
            m = m + dn * (jrow >= jr).astype(jnp.int32)
            pres = pres + dq * (jrow == jm).astype(jnp.int32)
            jstar = jnp.sum((m < s_row).astype(jnp.int32), axis=0,
                            keepdims=True)
            cnt = jnp.sum(((pres > 0) & (jrow < jstar)).astype(jnp.int32),
                          axis=0, keepdims=True)
            sc = jnp.where(row(sc_ref) != 0, cnt, _NOSCORE)
            pos = row(pos_ref)
            better = sc > best
            posf = jnp.where(better, pos, posf)
            posl = jnp.where(better | (sc == best), pos, posl)
            best = jnp.maximum(best, sc)
            return m, pres, best, posf, posl

        init = (jrow, jnp.zeros((scap, BU), jnp.int32),
                jnp.full((1, BU), -1, jnp.int32),
                jnp.zeros((1, BU), jnp.int32), jnp.zeros((1, BU), jnp.int32))
        _, _, best, posf, posl = jax.lax.fori_loop(0, n, body, init)
        best_ref[:] = best
        posf_ref[:] = posf
        posl_ref[:] = posl

    ev_spec = pl.BlockSpec((T, BU), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BU), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ev_spec] * 6 + [row_spec, row_spec],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((1, U), jnp.int32)
                        for _ in range(3)),
        interpret=interpret,
    )


def walk_pallas(ev, s_u, n_ev, scap: int, interpret: bool = False):
    """Pallas walk; identical results to walk_scan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U, T = ev["dn"].shape
    BU = 128
    Upad = -(-U // BU) * BU

    def prep(x, fill=0):
        x = x.astype(jnp.int32)
        if Upad > U:
            x = jnp.concatenate(
                [x, jnp.full((Upad - U,) + x.shape[1:], fill, jnp.int32)])
        return jnp.swapaxes(x, 0, 1) if x.ndim == 2 else x[None, :]

    args = [prep(ev[k]) for k in ("dn", "dq", "jr", "jm", "scored", "pos")]
    args.append(prep(s_u))
    args.append(prep(n_ev))
    call = _walk_pallas_call(T, Upad, scap, interpret)
    best, posf, posl = call(*args)
    return best[0, :U], posf[0, :U], posl[0, :U]


def l2_walk_units(qh, s, frag_of_unit, u_sid, u_start, u_end, u_valid,
                  mi_hash, mi_sid, mi_wpos, frag_len: int, k: int, w: int,
                  ncap: int, begin_end=None, prev_g=None, nxt_g=None,
                  backend: str = "auto"):
    """Batched L2 over work units via the event walk.  Drop-in equivalent
    of mapping.l2_map_units (JAX backends); see module docstring."""
    import jax
    import jax.numpy as jnp

    from fastani_tpu.models.mapping import L2Result

    ev, (s_u, overflow, n_ev) = build_events(
        qh, s, frag_of_unit, u_sid, u_start, u_end, u_valid,
        mi_hash, mi_sid, mi_wpos, frag_len, k, w, ncap,
        begin_end=begin_end, prev_g=prev_g, nxt_g=nxt_g)
    scap = qh.shape[-1]
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "pallas":
        best, posf, posl = walk_pallas(ev, s_u, n_ev, scap)
    else:
        best, posf, posl = walk_scan(ev, s_u, scap)
    shared = jnp.maximum(best, 0)
    valid = u_valid & (best > 0)
    mean_pos = jnp.where(valid, (posf + posl) // 2, 0)
    return L2Result(shared, mean_pos, valid, overflow)
