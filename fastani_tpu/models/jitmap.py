"""Jitted TPU mapping step.

Wraps the backend-generic kernels (models/mapping.py) into one jit-compiled
function over fixed-capacity buffers: fragment batch in, dense gated mapping
records out.  The identity/CI gate runs on device via a precomputed
min-shared-count LUT (the smallest c with upperBound(c,s) >= cutoff), so the
host only formats results.

Design notes (TPU):
* all shapes static: (F, frag_len) fragments, (F, cand_cap) candidate grid,
  unit list compacted on device to U_cap and processed in lax.map chunks to
  bound VMEM/HBM working set;
* everything is integer math (uint32 hashing, int32 positions); no floats
  on the device path at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fastani_tpu.models import mapping
from fastani_tpu.ops import stats


@functools.lru_cache(maxsize=None)
def gate_lut_np(k: int, perc_identity: float, s_max: int) -> np.ndarray:
    """min_c[s] = smallest shared count whose CI upper bound passes the
    identity cutoff (computeMap.hpp:384); sentinel s_max+1 for s=0.

    O(s_max^2) binomial-CI evaluations (~1 min of scipy at s_max=384), so
    the table is disk-cached per (k, identity, s_max)."""
    from fastani_tpu.utils import platform

    def compute():
        out = np.full(s_max + 1, s_max + 1, dtype=np.int32)
        for s in range(1, s_max + 1):
            _, upper = stats.identity_lut(s, k)
            ok = np.nonzero(upper >= np.float32(perc_identity))[0]
            out[s] = int(ok[0]) if len(ok) else s + 1
        return out

    return platform.lut_cache("gate", compute, k, perc_identity, s_max)


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    kmer_size: int
    window_size: int
    frag_len: int
    sketch_cap: int
    hits_cap: int
    cand_cap: int
    l2_entry_cap: int
    unit_cap: int        # max L2 work units per fragment batch
    unit_chunk: int      # units processed per lax.map step
    freq_threshold: int
    # static (seqId, wpos) -> uint32 packing width for the L1 hit sort;
    # None when the index ranges don't fit 32 bits (falls back to lexsort)
    wpos_bits: "int | None" = None
    # bucket-LUT searchsorted descent rounds (0 = use method="sort")
    occ_rounds: int = 0
    mi_rounds: int = 0
    # distinct min-hits LUT values (static): enables the shift-select
    # partner lookup in L1 instead of a per-row gather
    m_values: "tuple | None" = None

    @classmethod
    def from_params(cls, params, freq_threshold: int, unit_factor: int = 4,
                    unit_chunk: int = 16, index=None) -> "MapperConfig":
        # the L2 event records pack query ranks and entry links into
        # 10-bit fields (models/l2walk.py build_events); surface the
        # limits at setup instead of as mid-trace assertions
        if params.sketch_cap > 1023:
            raise ValueError(
                f"sketch_cap={params.sketch_cap} exceeds the jitted L2 "
                f"walk's packed-record limit of 1023; lower sketch_cap or "
                f"use the numpy backend")
        if params.l2_entry_cap > 1022:
            raise ValueError(
                f"l2_entry_cap={params.l2_entry_cap} exceeds the jitted "
                f"L2 walk's packed-record limit of 1022; lower "
                f"l2_entry_cap or use the numpy backend")
        wpos_bits = None
        if index is not None and len(index.metadata):
            max_len = max(c.length for c in index.metadata)
            n_seqs = len(index.metadata)
            # headroom for position+span queries (sw0+C, end+fragLen) so
            # packed searches never saturate
            bits = max(int(max_len + 2 * params.frag_len).bit_length(), 1)
            if ((n_seqs - 1) << bits) + ((1 << bits) - 1) < 0xFFFFFFFF:
                wpos_bits = bits
        return cls(
            kmer_size=params.kmer_size,
            window_size=params.window_size,
            frag_len=params.frag_len,
            sketch_cap=params.sketch_cap,
            hits_cap=params.hits_cap,
            cand_cap=params.cand_cap,
            l2_entry_cap=params.l2_entry_cap,
            # never wider than the candidate grid itself (F x cand_cap):
            # the unit compaction can only produce that many slots, and a
            # wider cap breaks the fixed-shape slices downstream
            unit_cap=min(params.frag_batch * unit_factor,
                         params.frag_batch * params.cand_cap),
            unit_chunk=unit_chunk,
            freq_threshold=freq_threshold,
            wpos_bits=wpos_bits,
        )


def map_step(cfg: MapperConfig, frags, occ_hash, occ_sid, occ_wpos,
             mi_hash, mi_sid, mi_wpos, seq_start, min_hits_lut, gate_lut,
             n_occ=None, occ_packed=None, mi_packed=None,
             mi_prev=None, mi_nxt=None, occ_lut=None, mi_lut=None,
             freq_threshold=None):
    """One fragment batch against one index shard.  Pure function of arrays.

    Index arrays may be padded (pow-2 bucketed for compile reuse); n_occ is
    the true occurrence count (traced scalar).
    Returns dict of (U_cap,) arrays: frag, sid, shared, sketch, mean_pos,
    valid (gated), plus overflow diagnostics.
    """
    xp = jnp
    F = frags.shape[0]
    k, w, l = cfg.kmer_size, cfg.window_size, cfg.frag_len

    # scalars arrive as (1, 1) cells (rank-0 jit inputs de-async the
    # tunneled client — utils/jitops docstring); unpack at trace time
    from fastani_tpu.utils.jitops import uncell

    n_occ = uncell(n_occ) if n_occ is not None else None
    freq_threshold = uncell(freq_threshold) if freq_threshold is not None \
        else None

    qh, s, sk_over = mapping.sketch_fragments(xp, frags, k, w, cfg.sketch_cap)
    # freq_threshold may be a traced per-shard scalar (the reference
    # computes the histogram threshold per sketch split, winSketch.hpp:199-248)
    ft = cfg.freq_threshold if freq_threshold is None else freq_threshold
    l1 = mapping.l1_candidates(xp, qh, s, occ_hash, occ_sid, occ_wpos,
                               min_hits_lut, ft, l,
                               cfg.hits_cap, cfg.cand_cap, n_occ=n_occ,
                               wpos_bits=cfg.wpos_bits, occ_packed=occ_packed,
                               occ_lut=occ_lut, occ_rounds=cfg.occ_rounds,
                               m_values=cfg.m_values)

    # flatten + compact the candidate grid to U_cap units on device
    u_frag = jnp.repeat(jnp.arange(F, dtype=jnp.int32), cfg.cand_cap)
    u_sid = l1.sid.reshape(-1)
    u_start = l1.start.reshape(-1)
    u_end = l1.end.reshape(-1)
    u_valid = l1.valid.reshape(-1)
    n_valid_units = l1.valid.sum().astype(jnp.int32)
    from fastani_tpu.ops import pallas_compact

    N_grid = F * cfg.cand_cap
    if pallas_compact.use_pallas_compact(True, N_grid):
        # butterfly compaction: valid units to the front, stable (frag-major
        # order preserved), one VMEM pass instead of a full-width argsort
        # plus five gathers
        u_sid, u_start, u_end, u_frag = (a[0, : cfg.unit_cap]
                                         for a in pallas_compact.compact_rows(
            u_valid.reshape(1, -1),
            [(u_sid.reshape(1, -1), 0), (u_start.reshape(1, -1), 0),
             (u_end.reshape(1, -1), 0), (u_frag.reshape(1, -1), 0)]))
        u_valid = jnp.arange(cfg.unit_cap, dtype=jnp.int32) < n_valid_units
    else:
        order = jnp.argsort(jnp.where(u_valid, 0, 1).astype(jnp.int32),
                            stable=True)
        take = order[: cfg.unit_cap]
        u_frag = u_frag[take]
        u_sid = u_sid[take]
        u_start = u_start[take]
        u_end = u_end[take]
        u_valid = u_valid[take]
    unit_overflow = n_valid_units > cfg.unit_cap  # units dropped
    # exact per-fragment attribution of dropped units: valid units keep
    # fragment-major order under the stable compaction, so fragment f's
    # units occupy [cum_excl[f], cum[f]); any beyond U_cap are dropped
    nvf = l1.valid.sum(axis=-1).astype(jnp.int32)            # (F,)
    unit_drop_frag = (jnp.cumsum(nvf) > cfg.unit_cap) & (nvf > 0)

    # batch-level window location: with packed (seqId,wpos) keys both
    # positional searches run as ONE sort-based searchsorted over the whole
    # unit list, instead of sequential binary-search gather rounds per L2
    # chunk (the dominant L2 cost on this TPU)
    u_b0 = u_eL = None
    if cfg.wpos_bits is not None and mi_packed is not None:
        bits = cfg.wpos_bits
        sid_m = jnp.where(u_valid, u_sid, 0).astype(jnp.uint32)
        key = lambda pos: (sid_m << bits) | pos.astype(jnp.uint32)
        q2 = jnp.concatenate([key(u_start), key(u_end + l)])
        if mi_lut is not None:
            from fastani_tpu.ops.xputils import lut_searchsorted

            r2 = lut_searchsorted(jnp, mi_packed, mi_lut, q2,
                                  cfg.mi_rounds, "left")
        else:
            r2 = jnp.searchsorted(mi_packed, q2, side="left",
                                  method="sort").astype(jnp.int32)
        r2 = jnp.minimum(r2, n_occ)
        u_b0, u_eL = r2[: u_sid.shape[0]], r2[u_sid.shape[0]:]

    # L2 in fixed-size chunks driven by a while_loop that stops after the
    # last chunk containing a VALID unit — units were compacted valid-first
    # above, so work scales with real candidates, not with unit_cap (which
    # is sized for the worst case and typically 5-10x larger).
    n_chunks = -(-cfg.unit_cap // cfg.unit_chunk)
    pad = n_chunks * cfg.unit_chunk - cfg.unit_cap

    def pad_to(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    cu_frag = pad_to(u_frag)
    cu_sid = pad_to(u_sid)
    cu_start = pad_to(u_start)
    cu_end = pad_to(u_end)
    cu_valid = pad_to(u_valid.astype(jnp.int32)) > 0
    if u_b0 is not None:
        cu_b0 = pad_to(u_b0)
        cu_eL = pad_to(u_eL)

    n_live = -(-u_valid.sum().astype(jnp.int32) // cfg.unit_chunk)
    U_pad = n_chunks * cfg.unit_chunk
    out_init = (jnp.zeros(U_pad, jnp.int32), jnp.zeros(U_pad, jnp.int32),
                jnp.zeros(U_pad, bool), jnp.zeros(U_pad, bool))

    def cond(state):
        return state[0] < n_live

    def body(state):
        i, (o_sh, o_mp, o_va, o_ov) = state
        off = i * cfg.unit_chunk
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, off, cfg.unit_chunk)
        be = (sl(cu_b0), sl(cu_eL)) if u_b0 is not None else None
        r = mapping.l2_map_units(jnp, qh, s, sl(cu_frag), sl(cu_sid),
                                 sl(cu_start), sl(cu_end), sl(cu_valid),
                                 mi_hash, mi_sid, mi_wpos, seq_start,
                                 l, k, w, cfg.l2_entry_cap, begin_end=be,
                                 prev_g=mi_prev, nxt_g=mi_nxt)
        upd = lambda o, v: jax.lax.dynamic_update_slice_in_dim(o, v, off, 0)
        return (i + 1, (upd(o_sh, r.shared), upd(o_mp, r.mean_pos),
                        upd(o_va, r.valid), upd(o_ov, r.overflow)))

    _, (shared, mean_pos, l2_valid, l2_over) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), out_init))
    shared = shared[: cfg.unit_cap]
    mean_pos = mean_pos[: cfg.unit_cap]
    l2_valid = l2_valid[: cfg.unit_cap]
    l2_over = l2_over[: cfg.unit_cap]

    # identity gate on device: shared >= gate_lut[s]
    s_u = s[u_frag]
    gated = l2_valid & (shared >= gate_lut[jnp.clip(s_u, 0, gate_lut.shape[0] - 1)])

    # observed maxima (diagnostics in the counts vector)
    max_span = jnp.int32(0)
    if u_b0 is not None:
        max_span = jnp.where(u_valid, u_eL - u_b0, 0).max().astype(jnp.int32)
    return dict(
        frag=u_frag, sid=u_sid, shared=shared, sketch=s_u, mean_pos=mean_pos,
        valid=gated & ~l2_over,
        frag_sketch_overflow=sk_over,          # (F,)
        l1_overflow=l1.overflow,               # (F,)
        l2_overflow=l2_over, l2_unit_valid=l2_valid,
        unit_frag_overflow=unit_overflow,
        unit_drop_frag=unit_drop_frag,         # (F,) exact drop attribution
        max_hits=l1.n_hits.max().astype(jnp.int32),
        max_groups=l1.n_groups.max().astype(jnp.int32),
        max_s=s.max().astype(jnp.int32),
        max_span=max_span,
        n_units=l1.valid.sum().astype(jnp.int32),
        sum_hits=l1.n_hits.sum().astype(jnp.int32),  # batch total (vs F*cap)
    )


def map_step_packed(cfg: MapperConfig, frags, occ_hash, occ_sid, occ_wpos,
                    mi_hash, mi_sid, mi_wpos, seq_start, min_hits_lut,
                    gate_lut, n_occ=None, occ_packed=None, mi_packed=None,
                    mi_prev=None, mi_nxt=None, occ_lut=None, mi_lut=None,
                    qno_row=None, qsid_row=None, row_valid=None,
                    freq_threshold=None):
    """map_step + device-side compaction for host consumption.

    The session TPU's device->host link runs at ~1 MB/s with ~30 ms
    round-trip latency, so results are packed into ONE (7, U_cap) int32
    block sorted valid-first; the host slices [:, :n_valid] and issues a
    single small transfer — or leaves the block on device entirely for the
    device-side CGI (models/device_cgi).  Rows: (frag, qno, qsid, sid,
    shared, sketch, mean_pos), with qno/qsid looked up from the optional
    per-batch row maps (identity defaults otherwise).  Overflow masks are
    returned unpacked but only fetched when the counts flags say so.
    """
    out = map_step(cfg, frags, occ_hash, occ_sid, occ_wpos, mi_hash, mi_sid,
                   mi_wpos, seq_start, min_hits_lut, gate_lut, n_occ=n_occ,
                   occ_packed=occ_packed, mi_packed=mi_packed,
                   mi_prev=mi_prev, mi_nxt=mi_nxt, occ_lut=occ_lut,
                   mi_lut=mi_lut, freq_threshold=freq_threshold)
    F = frags.shape[0]
    frag = out["frag"]
    # per-fragment fallback mask ON DEVICE: a fragment whose caps
    # overflowed contributes no device rows (its exact results come from
    # the host fallback path); computing the exclusion here lets the
    # device-CGI driver run a ZERO-FETCH steady loop — masks are checked
    # once per run, not per batch (utils/jitops docstring)
    fb_l2 = jnp.zeros(F, bool).at[jnp.clip(frag, 0, F - 1)].max(
        out["l2_overflow"])
    fallback_mask = (out["frag_sketch_overflow"] | out["l1_overflow"]
                     | fb_l2 | out["unit_drop_frag"])
    if row_valid is not None:
        fallback_mask = fallback_mask & row_valid
    keep = out["valid"] & ~fallback_mask[jnp.clip(frag, 0, F - 1)]
    if row_valid is not None:
        keep = keep & row_valid[jnp.clip(frag, 0, F - 1)]
    corder = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.int32), stable=True)
    qno = jnp.zeros_like(frag) if qno_row is None else qno_row[frag]
    qsid = frag if qsid_row is None else qsid_row[frag]
    packed = jnp.stack([
        frag, qno, qsid, out["sid"], out["shared"], out["sketch"],
        out["mean_pos"]])[:, corder]
    counts = jnp.stack([
        keep.sum().astype(jnp.int32),
        out["frag_sketch_overflow"].any().astype(jnp.int32),
        out["l1_overflow"].any().astype(jnp.int32),
        out["l2_overflow"].any().astype(jnp.int32),
        out["unit_frag_overflow"].astype(jnp.int32),
        out["max_hits"], out["max_groups"], out["max_s"], out["max_span"],
        out["n_units"], out["sum_hits"]])
    return dict(
        packed=packed,                              # (7, U_cap) valid-first
        counts=counts,                              # (10,)
        fallback_mask=fallback_mask,                # (F,) bool, on device
        frag_sketch_overflow=out["frag_sketch_overflow"],
        l1_overflow=out["l1_overflow"],
        l2_overflow=out["l2_overflow"],
        unit_drop_frag=out["unit_drop_frag"],
        unit_frag=out["frag"],
    )


class JitMapper:
    """Compiled mapping step bound to one index shard resident on device.

    Calling it with a (F, frag_len) uint8 batch returns already-gated
    results as small host arrays:

        frag, sid, shared, sketch, mean_pos : (R,) int32 — valid mappings
        fallback_frags : (Fb,) int32 — batch rows whose capacities
            overflowed; their results are excluded and the caller must
            recompute them with the exact host model.

    Only the valid prefix and a small counts vector cross the (slow)
    device->host link; the dense per-unit buffers stay on device.

    Caps only set buffer shapes; results are bit-identical at any cap.
    (A capacity auto-tuner existed in round 1; with the event-walk L2 the
    tight caps bought ~6%, so it was removed — the counts vector still
    reports observed maxima for diagnostics.)

    dispatch()/collect() expose the step asynchronously so the host can
    enqueue batch i+1 while the device runs batch i (the tunnel's H2D/D2H
    latency then overlaps device compute).
    """

    def __init__(self, params, index, unit_factor: int = 4,
                 unit_chunk: int = 128):
        self.params = params
        self.index = index
        self.cfg = MapperConfig.from_params(params, index.freq_threshold,
                                            unit_factor, unit_chunk,
                                            index=index)
        k = params.kmer_size
        s_max = max(params.sketch_cap, 1)
        mh_np = stats.min_hits_lut(k, params.percentage_identity, s_max)
        self._min_hits = jnp.asarray(mh_np)
        self._gate = jnp.asarray(gate_lut_np(k, params.percentage_identity, s_max))
        # distinct min-hits values (static, tiny set: {1,2,3,4} at
        # reference defaults) power the shift-select L1 partner lookup;
        # past 8 distinct values the emitted shift+select chain would
        # outgrow the gather it replaces (advisor round 3), so fall back
        # to the take_along path
        mv = tuple(sorted({int(max(v, 1)) for v in np.asarray(mh_np)}))
        self.cfg = dataclasses.replace(
            self.cfg, m_values=mv if len(mv) <= 8 else None)

        # pow-2 bucket the index arrays so one compiled executable serves
        # any index size (shape changes would otherwise force a ~3 min
        # XLA:TPU recompile per workload).  Device-built indexes arrive
        # pre-padded with a >= 2048-entry margin past the true count
        # (device_build out_size), so their shape is used AS IS and the
        # true count stays on device — this init performs NO device->host
        # fetch (the first fetch permanently degrades dispatch latency,
        # utils/jitops docstring).  The l2_entry_cap margin lets L2
        # window reads be contiguous dynamic-slices (never clipped).
        _PINF = np.int32(2**30)

        from fastani_tpu.utils import jitops

        if index.is_device_resident():
            Mp = max(128, len(index.occ_hash))
            self._n_occ = index.n_occ_cell()
        else:
            M = index.num_entries
            Mp = max(128,
                     1 << max(M + params.l2_entry_cap - 1, 1).bit_length(),
                     len(index.occ_hash))
            self._n_occ = jitops.cell(M)

        def pad(a, fill, dtype):
            if isinstance(a, np.ndarray):
                out = np.full(Mp, fill, dtype)
                out[:len(a)] = a
                return jnp.asarray(out)
            # device-resident: pad in HBM via a jitted program (eager ops
            # destabilize the tunneled client — utils/jitops docstring)
            return jitops.pad_tail(a, Mp, int(fill))
        self._occ_hash = pad(index.occ_hash, 0xFFFFFFFF, np.uint32)
        self._occ_sid = pad(index.occ_seqid, _PINF, np.int32)
        self._occ_wpos = pad(index.occ_wpos, _PINF, np.int32)
        self._mi_hash = pad(index.mi_hash, 0xFFFFFFFF, np.uint32)
        self._mi_sid = pad(index.mi_seqid, _PINF, np.int32)
        self._mi_wpos = pad(index.mi_wpos, _PINF, np.int32)
        # packed (seqId << bits | wpos) views: L1 gathers sid+wpos in one
        # pass; L2 locates all unit windows with batch-level sort-based
        # searches instead of per-chunk binary-search gather rounds
        if self.cfg.wpos_bits is not None:
            bits = self.cfg.wpos_bits

            # n_occ is an ARGUMENT, never a closure: tracing a jit that
            # closes over a concrete device array embeds it as a literal
            # via a hidden device->host read — the de-async trigger
            # (utils/jitops docstring)
            @jax.jit
            def _pack(sid, wpos, n_occ):
                idx = jnp.arange(sid.shape[0], dtype=jnp.int32)
                p = (sid.astype(jnp.uint32) << bits) | wpos.astype(jnp.uint32)
                return jnp.where(idx < n_occ[0, 0], p,
                                 jnp.uint32(0xFFFFFFFF))

            self._occ_packed = _pack(self._occ_sid, self._occ_wpos,
                                     self._n_occ)
            self._mi_packed = _pack(self._mi_sid, self._mi_wpos,
                                    self._n_occ)
        else:
            self._occ_packed = self._occ_hash  # unused placeholder
            self._mi_packed = self._mi_hash
        # bucket LUTs for the per-batch searchsorted probes: one-time
        # device build; the descent round count is derived ON DEVICE from
        # the lut's max bucket width inside each probe (a fori_loop with a
        # traced trip count — ops/xputils.lut_searchsorted rounds=None),
        # so no host fetch is needed to fix a static unroll
        from fastani_tpu.ops import xputils

        @jax.jit
        def _lut_of(table, n):
            return jnp.minimum(xputils.build_prefix_lut(jnp, table), n[0, 0])

        self._occ_lut = _lut_of(self._occ_hash, self._n_occ)
        if self.cfg.wpos_bits is not None:
            self._mi_lut = _lut_of(self._mi_packed, self._n_occ)
        else:
            self._mi_lut = None
        self.cfg = dataclasses.replace(self.cfg, occ_rounds=None,
                                       mi_rounds=None)

        # per-entry previous/next same-(hash, seqId) occurrence links: the
        # L2 event walk decides distinct-membership changes from them
        # (replaces the reference's ordered-map presence checks,
        # slidingMap.hpp:137-211); one-time device argsort at init
        from fastani_tpu.models import l2walk

        occ_order = getattr(index, "occ_order", None)
        if occ_order is not None and len(index.occ_hash) == Mp:
            # device build saved its assembly permutation: prev/next
            # links derive from the already-sorted occ view, no re-sort
            self._mi_prev, self._mi_nxt = jax.jit(
                functools.partial(l2walk.prev_next_global))(
                self._mi_hash, self._mi_sid, occ_order)
        else:
            self._mi_prev, self._mi_nxt = jax.jit(l2walk.prev_next_global)(
                self._mi_hash, self._mi_sid)
        # seq_start is DEAD on the jitted path (the L2 event walk locates
        # windows from begin_end / packed searches, models/l2walk.py) —
        # pass a zero dummy of the right shape rather than fetching the
        # device build's deferred per-contig spans
        S = len(index.metadata) + 1
        Sp = max(8, 1 << max(S - 1, 1).bit_length())
        if index.seq_start is not None:
            ss = np.full(Sp, index.seq_start[-1] if S else 0, np.int64)
            ss[:len(index.seq_start)] = index.seq_start
        else:
            ss = np.zeros(Sp, np.int64)
        self._seq_start = jnp.asarray(ss)
        self._fn = jax.jit(functools.partial(map_step_packed, self.cfg))

    # ---- probe-pass hits_cap auto-tune -------------------------------------

    def probe_fn(self):
        """Counts-only program: sketch a batch + L1 range probes, return
        ((1, 2) cell: [max per-fragment hit total, batch hit sum]).  Used
        to SHRINK hits_cap to the workload's measured density before the
        map program compiles — every L1 stage (expand, gather, sort,
        chain merge, partner test) scales with the hits_cap width, and
        the static formula (config.scale_caps) must assume the worst."""
        cfg = self.cfg
        k, w = cfg.kmer_size, cfg.window_size

        def f(frags, occ_hash, occ_lut, n_occ, ft_cell):
            from fastani_tpu.ops.xputils import lut_searchsorted
            from fastani_tpu.utils.jitops import uncell

            qh, s, _ = mapping.sketch_fragments(jnp, frags, k, w,
                                                cfg.sketch_cap)
            lo = lut_searchsorted(jnp, occ_hash, occ_lut, qh, None, "left")
            hi = lut_searchsorted(jnp, occ_hash, occ_lut, qh, None,
                                  "right")
            n = uncell(n_occ)
            lo = jnp.minimum(lo, n)
            hi = jnp.minimum(hi, n)
            jj = jnp.arange(cfg.sketch_cap, dtype=jnp.int32)
            qvalid = jj < s[:, None]
            cnt = jnp.maximum(jnp.where(qvalid, hi - lo, 0), 0)
            cnt = jnp.where(cnt < uncell(ft_cell), cnt, 0)
            tot = cnt.sum(axis=-1)
            return jnp.stack([tot.max(), tot.sum()]).reshape(1, 2)

        return jax.jit(f)

    def retune_hits_cap(self, new_cap: int) -> None:
        """Rebind the map program at a different hits_cap (results are
        bit-identical at any non-overflowing cap; an overflow falls back
        to the exact host redo)."""
        if new_cap == self.cfg.hits_cap:
            return
        self.cfg = dataclasses.replace(self.cfg, hits_cap=new_cap)
        self._fn = jax.jit(functools.partial(map_step_packed, self.cfg))
        self._fused_cache = {}

    # ---- fused multi-batch stream step -------------------------------------

    def fused_stream_fin_fn(self, K: int, fin_cap: int, cgi,
                            packed_frags: bool = False):
        """ONE jitted program that maps K fragment batches, folds each
        into the CGI slot table, and closes finished query genomes'
        segments — K batches per dispatch instead of 2K dispatches (deep
        async dispatch queues are pathological on this platform,
        ~2 s/program past ~8-16 in flight, measured round 4; any
        completion probe degrades the client permanently, so the only
        safe shape is few, large programs — utils/jitops docstring).

        IN-SCAN SLOT FINALIZE: each scan step first
        folds the bin-table slots of query genomes whose fragments all
        precede that batch into the (Gq, Gr) accumulators
        (device_cgi.finalize_rows), then maps the batch into the recycled
        slot table.  Slots recycle modulo n_slots, so HBM is
        O(n_slots x bins) — INDEPENDENT of the query-genome count — and
        the whole run still performs zero device->host transfers until
        the single readout (replaces both the slot-per-query table and
        the per-batch-fetch recycling loop; the reference's equivalent
        per-query aggregation is computeCoreIdentity.hpp:166-298).

        Returns f(frags_k (K,B,L), qno_k, qsid_k, rv_k (K,B),
        fin_k (K,fin_cap) i32 [-1 = no-op], tab, acc_c, acc_s, ...) ->
        (tab', acc_c', acc_s', counts_k, fb_k); tab/acc donated.
        """
        key = ("fin", K, fin_cap, cgi.n_slots, cgi.n_qg, cgi.n_rg,
               cgi.frag_cap, packed_frags)
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if key in cache:
            return cache[key]
        from fastani_tpu.models import device_cgi

        cfg = self.cfg
        frag_len = self.params.frag_len
        n_slots, n_qg, n_rg = cgi.n_slots, cgi.n_qg, cgi.n_rg
        frag_cap = cgi.frag_cap
        packed_mode = cfg.wpos_bits is not None

        def f(frags_k, qno_k, qsid_k, rv_k, fin_k, tab, acc_c, acc_s,
              occ_hash, occ_sid, occ_wpos, mi_hash, mi_sid, mi_wpos,
              seq_start, min_hits, gate, n_occ, occ_packed, mi_packed,
              mi_prev, mi_nxt, occ_lut, mi_lut, gos, bin_start,
              ident_lut, gid_of_bin):
            no_excl = jnp.zeros(frag_cap, bool)

            def body(carry, xs):
                tab, acc_c, acc_s = carry
                frags, qno_row, qsid_row, rv, fin = xs
                if packed_frags:
                    # 2-bit packed H2D (~39 MB/s tunnel): unpack on
                    # device; pad rows become poly-A but are masked by rv
                    from fastani_tpu.ops import hashing as _h

                    frags = _h.unpack2_jax(frags)
                tab, acc_c, acc_s = device_cgi.finalize_rows(
                    tab, acc_c, acc_s, fin, gid_of_bin, n_slots, n_qg,
                    n_rg)
                out = map_step_packed(
                    cfg, frags, occ_hash, occ_sid, occ_wpos, mi_hash,
                    mi_sid, mi_wpos, seq_start, min_hits, gate,
                    n_occ=n_occ,
                    occ_packed=occ_packed if packed_mode else None,
                    mi_packed=mi_packed if packed_mode else None,
                    mi_prev=mi_prev, mi_nxt=mi_nxt, occ_lut=occ_lut,
                    mi_lut=mi_lut if packed_mode else None,
                    qno_row=qno_row, qsid_row=qsid_row, row_valid=rv)
                tab = device_cgi.update_tab(
                    tab, out["packed"], out["counts"], no_excl, gos,
                    bin_start, ident_lut, frag_len, n_slots, n_rg,
                    frag_cap)
                return (tab, acc_c, acc_s), (out["counts"],
                                             out["fallback_mask"])

            (tab, acc_c, acc_s), (counts_k, fb_k) = jax.lax.scan(
                body, (tab, acc_c, acc_s),
                (frags_k, qno_k, qsid_k, rv_k, fin_k))
            return tab, acc_c, acc_s, counts_k, fb_k

        fn = jax.jit(f, donate_argnums=(5, 6, 7))
        cache[key] = fn
        return fn

    def dispatch_fused_fin(self, fn, frags_k, qno_k, qsid_k, rv_k, fin_k,
                           cgi):
        """Enqueue one fused K-batch program with in-scan finalize;
        updates cgi._tab/_counts/_sums in place."""
        packed = self.cfg.wpos_bits is not None
        tab, acc_c, acc_s, counts_k, fb_k = fn(
            jnp.asarray(frags_k), jnp.asarray(qno_k), jnp.asarray(qsid_k),
            jnp.asarray(rv_k), jnp.asarray(fin_k), cgi._tab, cgi._counts,
            cgi._sums, self._occ_hash, self._occ_sid, self._occ_wpos,
            self._mi_hash, self._mi_sid, self._mi_wpos, self._seq_start,
            self._min_hits, self._gate, self._n_occ,
            self._occ_packed if packed else self._occ_hash,
            self._mi_packed if packed else self._mi_hash,
            self._mi_prev, self._mi_nxt, self._occ_lut,
            self._mi_lut if packed else self._occ_lut,
            cgi._gos, cgi._bin_start, cgi._lut, cgi._gid_of_bin)
        cgi._tab, cgi._counts, cgi._sums = tab, acc_c, acc_s
        return counts_k, fb_k

    # ---- async two-phase interface -----------------------------------------

    def dispatch(self, frags_u8: np.ndarray, qno_row=None,
                 qsid_row=None) -> dict:
        """Enqueue one batch on the device; returns a handle for collect().

        qno_row/qsid_row: optional (F,) int32 per-row query-genome number
        and global query sequence id, baked into the packed result rows
        (consumed by the device-CGI path)."""
        F = frags_u8.shape[0]
        B = self.params.frag_batch
        if F < B:  # pad batch to the static size
            padded = np.zeros((B, frags_u8.shape[1]), np.uint8)
            padded[:F] = frags_u8
            frags_u8 = padded

        def pad_map(m):
            if m is None:
                return None
            out = np.zeros(B, np.int32)
            out[:F] = m
            return jnp.asarray(out)

        # always an array (an all-True fast path would trace a SECOND
        # program variant — one extra multi-minute XLA:TPU compile)
        rv = np.zeros(B, bool)
        rv[:F] = True
        row_valid = jnp.asarray(rv)
        return self._dispatch_with(self.cfg, self._fn, frags_u8, F,
                                   pad_map(qno_row), pad_map(qsid_row),
                                   row_valid)

    def _dispatch_with(self, cfg, fn, frags_u8: np.ndarray, F: int,
                       qno_row=None, qsid_row=None, row_valid=None) -> dict:
        packed = (cfg.wpos_bits is not None)
        out = fn(jnp.asarray(frags_u8), self._occ_hash, self._occ_sid,
                 self._occ_wpos, self._mi_hash, self._mi_sid,
                 self._mi_wpos, self._seq_start, self._min_hits,
                 self._gate, self._n_occ,
                 self._occ_packed if packed else None,
                 self._mi_packed if packed else None,
                 self._mi_prev, self._mi_nxt, self._occ_lut,
                 self._mi_lut if packed else None, qno_row, qsid_row,
                 row_valid)
        return dict(out=out, F=F)

    def collect(self, handle: dict) -> Dict[str, np.ndarray]:
        """Fetch one dispatched batch's results (blocking)."""
        out, F = handle["out"], handle["F"]
        counts = np.asarray(out["counts"])
        n = int(counts[0])
        if n:
            # fetch a 256-bucketed prefix: a slice shaped by the exact row
            # count would compile ONE XLA slice program PER DISTINCT COUNT
            # (seconds each on the tunneled TPU); bucketing bounds the
            # variants at U_cap/256 and they all hit the jit cache.  The
            # slice runs jitted (utils/jitops): an eager slice's fetch can
            # wedge the tunneled device->host path.
            from fastani_tpu.utils import jitops

            U_cap = out["packed"].shape[1]
            nb = min(U_cap, -(-n // 256) * 256)
            packed = jitops.take_cols(out["packed"], nb)[:, :n]
        else:
            packed = np.zeros((7, 0), np.int32)
        frag, qno, qsid, sid, shared, sketch, mean_pos = packed

        fallback = set()
        if counts[1]:  # fragment sketch overflow
            fallback |= set(np.nonzero(
                np.asarray(out["frag_sketch_overflow"])[:F])[0].tolist())
        if counts[2]:  # L1 hits/candidates overflow
            fallback |= set(np.nonzero(
                np.asarray(out["l1_overflow"])[:F])[0].tolist())
        if counts[3]:  # L2 entry-range overflow: attribute to fragments
            l2o = np.asarray(out["l2_overflow"])
            uf = np.asarray(out["unit_frag"])
            fallback |= set(uf[np.nonzero(l2o)[0]].tolist())
        if counts[4]:  # unit-list truncation: exact per-fragment attribution
            fallback |= set(np.nonzero(
                np.asarray(out["unit_drop_frag"])[:F])[0].tolist())
        fallback = {f for f in fallback if f < F}

        keep = frag < F
        if fallback:
            fb = np.fromiter(sorted(fallback), np.int32, len(fallback))
            keep &= ~np.isin(frag, fb)
        else:
            fb = np.zeros(0, np.int32)
        return dict(frag=frag[keep], qno=qno[keep], qsid=qsid[keep],
                    sid=sid[keep], shared=shared[keep],
                    sketch=sketch[keep], mean_pos=mean_pos[keep],
                    fallback_frags=fb)

    def collect_device(self, handle: dict, stats: dict = None):
        """Like collect(), but leaves the packed rows ON DEVICE for the
        device-CGI path: only the 10-int counts vector (and, rarely, the
        overflow masks) crosses the device->host link.

        ``stats``, when given, accumulates running maxima of the counts
        diagnostics (max_hits/max_groups/max_s/max_span/n_units) plus
        batch/fallback tallies — the bench logs these to prove the caps
        held at scale (no silent overflow stampede).

        Returns (packed (7, U_cap) device array, n_valid int,
        fallback_frags (Fb,) int32 host array)."""
        out, F = handle["out"], handle["F"]
        counts = np.asarray(out["counts"])
        if stats is not None:
            for i, key in enumerate((
                    "n_valid", "sk_overflow", "l1_overflow", "l2_overflow",
                    "unit_overflow", "max_hits", "max_groups", "max_s",
                    "max_span", "n_units", "sum_hits")):
                stats[key] = max(int(counts[i]), stats.get(key, 0))
            stats["batches"] = stats.get("batches", 0) + 1
        fallback = set()
        if counts[1]:
            fallback |= set(np.nonzero(
                np.asarray(out["frag_sketch_overflow"])[:F])[0].tolist())
        if counts[2]:
            fallback |= set(np.nonzero(
                np.asarray(out["l1_overflow"])[:F])[0].tolist())
        if counts[3]:
            l2o = np.asarray(out["l2_overflow"])
            uf = np.asarray(out["unit_frag"])
            fallback |= set(uf[np.nonzero(l2o)[0]].tolist())
        if counts[4]:
            fallback |= set(np.nonzero(
                np.asarray(out["unit_drop_frag"])[:F])[0].tolist())
        fallback = {f for f in fallback if f < F}
        fb = np.fromiter(sorted(fallback), np.int32, len(fallback))
        if stats is not None:
            stats["fallback_frags"] = stats.get("fallback_frags", 0) + len(fb)
        return out["packed"], int(counts[0]), fb

    def __call__(self, frags_u8: np.ndarray) -> Dict[str, np.ndarray]:
        return self.collect(self.dispatch(frags_u8))
