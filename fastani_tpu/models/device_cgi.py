"""Device-side CGI aggregation: mapping rows -> per-genome-pair tallies.

TPU-first fast path for cgi::computeCGI (reference:
src/cgi/include/computeCoreIdentity.hpp:166-298): the 1-way / 2-way
reciprocal dedupes run ON DEVICE and only a (Gq, Gr) count/sum pair
crosses the (slow) device->host link — instead of every mapping row.

Two implementations:

* ``cgi_matrices`` — one-shot over an accumulated row set (lexsort +
  keep-last segment reductions); memory grows with total mapping rows.
  Used by the mesh step and small runs.
* ``StreamingCGI`` — BOUNDED-memory streaming reduction for large
  many-to-many runs: each fragment batch folds into a device-resident
  running-best table keyed by global reference position bin (the 2-way
  law, computeCoreIdentity.hpp:237-255: best identity per (refContig,
  refPosBin)), after an exact per-batch 1-way dedupe (valid because a
  fragment's mapping rows all live in ONE batch).  Slots recycle modulo
  a small ring: a finished query genome's row is folded into the
  (Gq, Gr) accumulators IN-SCAN (finalize_rows) per the driver's static
  schedule (pipeline.cgi_stream_schedule), so HBM footprint is
  O(slots * total_ref_bins + Gq*Gr) with slots ~ max distinct query
  genomes per batch — independent of BOTH run length and query count.
  The 2-way table stores only the max identity bits per bin — identity
  tie-breakers beyond the value itself cannot change per-pair counts or
  sums (tied rows have equal identity), so a single int32 scatter-max
  suffices.

Identity values come from a host-precomputed float32 LUT over
(sketch size s, shared count c), so each row's identity is bit-identical
to the host path.  The per-pair SUM is a device segment reduction whose
float32 addition order may differ from the reference's sequential left
fold by final-ulp amounts (~1e-7 relative) — callers that need
byte-identical output files (golden tests, --visualize) use the host path
in models/ani.py; this module is the throughput path (bench, large
many-to-many runs), where BASELINE.json's 0.1-ANI tolerance applies.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def identity_lut_full(k: int, s_max: int) -> np.ndarray:
    """lut[s, c] = 100 * (1 - mash_distance(j = c/s, k)) as float32,
    identical to stats.identity_lut row by row (map_stats.hpp:44-54)."""
    from fastani_tpu.ops import stats
    from fastani_tpu.utils import platform

    def compute():
        out = np.zeros((s_max + 1, s_max + 1), np.float32)
        for s in range(1, s_max + 1):
            ident, _ = stats.identity_lut(s, k)
            out[s, : s + 1] = ident[: s + 1]
        return out

    return platform.lut_cache("identfull", compute, k, s_max)


def cgi_matrices(qno, qsid, sid, shared, sketch, pos, valid,
                 genome_of_seq, ident_lut, frag_len: int,
                 n_query_genomes: int, n_ref_genomes: int):
    """Device CGI over accumulated mapping rows (all query genomes).

    All row arrays are (N,) int32 (invalid rows arbitrary, masked by
    `valid`).  Returns (counts (Gq, Gr) int32, sums (Gq, Gr) float32):
    per-pair mapped-fragment counts and identity sums after the 1-way and
    2-way dedupes (computeCoreIdentity.hpp:212-255), with the same
    deterministic tie-breakers as models/ani.compute_cgi_arrays.
    """
    import jax.numpy as jnp

    ident = ident_lut[jnp.clip(sketch, 0, ident_lut.shape[0] - 1),
                      jnp.clip(shared, 0, ident_lut.shape[1] - 1)]
    ident = jnp.where(valid, ident, jnp.float32(-1.0))
    gid = genome_of_seq[jnp.clip(sid, 0, genome_of_seq.shape[0] - 1)]
    gid = jnp.where(valid, gid, n_ref_genomes)          # invalid -> pad group
    qno_m = jnp.where(valid, qno, n_query_genomes)
    pos_bin = pos // (frag_len - 20)        # computeCoreIdentity.hpp:194
    # identity as an order-isomorphic sort key: non-negative float32
    # bit patterns compare like the floats
    ibits = jnp.where(valid, ident, jnp.float32(0)).view(jnp.int32)

    # 1-way: keep best per (qno, refGenome, querySeqId); ascending lexsort
    # + keep-last = the overwrite loop with cmp_query_bucket tie-breakers
    # (cgid_types.hpp:31-39)
    o1 = jnp.lexsort((pos, sid, ibits, qsid, gid, qno_m))
    s_qno, s_gid, s_qsid = qno_m[o1], gid[o1], qsid[o1]
    last1 = jnp.concatenate([
        (s_qno[:-1] != s_qno[1:]) | (s_gid[:-1] != s_gid[1:])
        | (s_qsid[:-1] != s_qsid[1:]), jnp.ones((1,), bool)])
    keep1 = jnp.zeros(valid.shape, bool).at[o1].set(last1) & valid

    # 2-way: keep best per (qno, refSeqId, refPosBin) among 1-way rows
    ib2 = jnp.where(keep1, ibits, -1)
    o2 = jnp.lexsort((qsid, ib2, pos_bin, sid, qno_m,
                      jnp.where(keep1, 0, 1)))
    t_drop = jnp.where(keep1, 0, 1)[o2]
    t_qno, t_sid, t_bin = qno_m[o2], sid[o2], pos_bin[o2]
    # boundary when the next row differs in (drop, qno, sid, bin): kept
    # rows sort before dropped ones (primary key), so a kept group's last
    # row is followed by either another group or the dropped region —
    # t_drop inequality closes the group at that edge
    last2 = jnp.concatenate([
        (t_drop[:-1] != t_drop[1:]) | (t_qno[:-1] != t_qno[1:])
        | (t_sid[:-1] != t_sid[1:]) | (t_bin[:-1] != t_bin[1:]),
        jnp.ones((1,), bool)])
    keep2 = jnp.zeros(valid.shape, bool).at[o2].set(
        last2 & (t_drop == 0)) & keep1

    idx = jnp.where(keep2,
                    qno * n_ref_genomes + gid,
                    n_query_genomes * n_ref_genomes)
    counts = jnp.zeros(n_query_genomes * n_ref_genomes + 1, jnp.int32
                       ).at[idx].add(keep2.astype(jnp.int32))
    sums = jnp.zeros(n_query_genomes * n_ref_genomes + 1, jnp.float32
                     ).at[idx].add(jnp.where(keep2, ident, 0.0))
    return (counts[:-1].reshape(n_query_genomes, n_ref_genomes),
            sums[:-1].reshape(n_query_genomes, n_ref_genomes))


# ---------------------------------------------------------------------------
# Streaming (bounded-memory) CGI
# ---------------------------------------------------------------------------

def make_bin_tables(metadata_lengths, genome_of_seq, frag_len: int):
    """Global reference-bin layout: bin id = bin_start[sid] + pos // width
    with width = frag_len - 20 (computeCoreIdentity.hpp:194).

    Returns (bin_start (S+1,) int64->int32, gid_of_bin (B_tot,) int32)."""
    width = frag_len - 20
    lens = np.asarray(metadata_lengths, np.int64)
    n_bins = lens // width + 1
    bin_start = np.zeros(len(lens) + 1, np.int64)
    bin_start[1:] = np.cumsum(n_bins)
    gid_of_bin = np.repeat(np.asarray(genome_of_seq, np.int32), n_bins)
    return bin_start.astype(np.int32), gid_of_bin


def update_tab(tab, packed, n_valid, excl_frag, genome_of_seq, bin_start,
               ident_lut, frag_len: int, n_slots: int, n_rg: int,
               frag_cap: int):
    """Pure per-batch table fold: exact 1-way dedupe + 2-way scatter-max.
    Shared by the standalone _update_jit and the fused multi-batch scan
    step (models/jitmap.fused_stream_fin_fn) — fusing K batches into
    one program keeps the dispatch queue shallow (deep async queues are
    pathological on this platform, utils/jitops docstring)."""
    import jax.numpy as jnp

    frag, qno, qsid, sid, shared, sketch, pos = (packed[i]
                                                 for i in range(7))
    U = sid.shape[0]
    # n_valid arrives as a (1, 1) cell or as the mapper's (10,)
    # counts vector (element 0 = valid-row count) — never rank-0
    # (de-async hazard, utils/jitops docstring)
    nv = n_valid.reshape(-1)[0]
    valid = (jnp.arange(U, dtype=jnp.int32) < nv) \
        & ~excl_frag[jnp.clip(frag, 0, excl_frag.shape[0] - 1)]
    ident = ident_lut[jnp.clip(sketch, 0, ident_lut.shape[0] - 1),
                      jnp.clip(shared, 0, ident_lut.shape[1] - 1)]
    ibits = jnp.where(valid, ident, jnp.float32(0)).view(jnp.int32)
    ibits = jnp.where(valid, ibits, -1)
    gid = genome_of_seq[jnp.clip(sid, 0, genome_of_seq.shape[0] - 1)]

    # exact 1-way: best (ident, sid, pos) per (refGenome, fragment) —
    # the overwrite law of computeCoreIdentity.hpp:212-232 with
    # cmp_query_bucket tie-breakers (cgid_types.hpp:31-39); three
    # scatter-max passes resolve the lexicographic key
    idx1 = jnp.where(valid, gid * frag_cap + frag, n_rg * frag_cap)
    T1 = n_rg * frag_cap + 1
    t_i = jnp.full(T1, -1, jnp.int32).at[idx1].max(ibits)
    w1 = valid & (ibits == t_i[idx1])
    t_s = jnp.full(T1, -1, jnp.int32).at[idx1].max(
        jnp.where(w1, sid, -1))
    w2 = w1 & (sid == t_s[idx1])
    t_p = jnp.full(T1, -1, jnp.int32).at[idx1].max(
        jnp.where(w2, pos, -1))
    keep1 = w2 & (pos == t_p[idx1])

    # 2-way fold: running max identity per (slot, global ref bin)
    B_tot = tab.shape[1]
    bin_id = bin_start[jnp.clip(sid, 0, bin_start.shape[0] - 2)] \
        + pos // (frag_len - 20)
    slot = jnp.where(keep1, (qno % n_slots), 0)
    idx2 = jnp.where(keep1, slot * B_tot + bin_id, n_slots * B_tot)
    tab = tab.reshape(-1).at[jnp.minimum(idx2, n_slots * B_tot - 1)].max(
        jnp.where(keep1, ibits, -1)).reshape(n_slots, B_tot)
    return tab


def finalize_rows(tab, acc_counts, acc_sums, fin_qnos, gid_of_bin,
                  n_slots: int, n_qg: int, n_rg: int, q_axis: str = None):
    """Pure in-scan slot finalize: fold the bin-table rows of the listed
    query genomes into the (Gq, Gr) accumulators and clear their slots.

    ``fin_qnos`` (FIN,) int32 lists query genomes whose LAST fragment
    precedes the current batch (-1 entries are no-ops).  This closes
    per-query segments ON DEVICE inside the fused stream scan, so slots
    recycle without any host fetch — the scalable replacement for both
    the slot-per-query table (O(Gq x bins) HBM) and the per-batch-fetch
    recycling loop (reference equivalent: the per-query computeCGI call,
    computeCoreIdentity.hpp:166-298).

    ``q_axis``: inside a shard_map with query-fragment data parallelism,
    the per-bin running max must merge across the q axis BEFORE
    occupancy is counted (a query's fragments span q devices); pass the
    mesh axis name and the gathered rows are lax.pmax-ed first — every
    q device then folds identical values, keeping acc replicated over q.
    """
    import jax
    import jax.numpy as jnp

    FIN = fin_qnos.shape[0]
    valid = fin_qnos >= 0
    slots = jnp.where(valid, fin_qnos % n_slots, 0)
    rows = tab[slots]                                   # (FIN, B_tot)
    if q_axis is not None:
        rows = jax.lax.pmax(rows, q_axis)
    occ = (rows >= 0) & valid[:, None]
    ident = jnp.where(occ, rows.view(jnp.float32), 0.0)
    seg = jnp.where(occ, gid_of_bin[None, :], n_rg)
    seg_flat = (jnp.arange(FIN, dtype=jnp.int32)[:, None] * (n_rg + 1)
                + seg).reshape(-1)
    cnt = jax.ops.segment_sum(
        occ.astype(jnp.int32).reshape(-1), seg_flat,
        num_segments=FIN * (n_rg + 1)).reshape(FIN, n_rg + 1)[:, :n_rg]
    sm = jax.ops.segment_sum(
        ident.reshape(-1), seg_flat,
        num_segments=FIN * (n_rg + 1)).reshape(FIN, n_rg + 1)[:, :n_rg]
    qidx = jnp.where(valid, fin_qnos, n_qg)
    acc_counts = acc_counts.at[qidx].add(
        jnp.where(valid[:, None], cnt, 0), mode="drop")
    acc_sums = acc_sums.at[qidx].add(
        jnp.where(valid[:, None], sm, 0.0), mode="drop")
    tab = tab.at[jnp.where(valid, slots, n_slots)].set(
        jnp.int32(-1), mode="drop")
    return tab, acc_counts, acc_sums


@functools.lru_cache(maxsize=None)
def _finalize_rows_jit(fin_cap: int, n_slots: int, n_qg: int, n_rg: int,
                       donate: bool = True):
    """Standalone finalize-list program (the post-scan tail flush)."""
    import jax

    def f(tab, acc_counts, acc_sums, fin_qnos, gid_of_bin):
        return finalize_rows(tab, acc_counts, acc_sums, fin_qnos,
                             gid_of_bin, n_slots, n_qg, n_rg)

    return jax.jit(f, donate_argnums=(0, 1, 2) if donate else ())


@functools.lru_cache(maxsize=None)
def _update_jit(frag_len: int, n_slots: int, n_rg: int, frag_cap: int,
                donate: bool = True):
    """Per-batch table fold as a standalone program (see update_tab)."""
    import jax

    def f(tab, packed, n_valid, excl_frag, genome_of_seq, bin_start,
          ident_lut):
        return update_tab(tab, packed, n_valid, excl_frag, genome_of_seq,
                          bin_start, ident_lut, frag_len, n_slots, n_rg,
                          frag_cap)

    return jax.jit(f, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=None)
def _finalize_jit(n_slots: int, n_qg: int, n_rg: int, donate: bool = True):
    """Reduce one slot of the bin table into the (Gq, Gr) accumulators and
    clear it."""
    import jax
    import jax.numpy as jnp

    def f(tab, acc_counts, acc_sums, qno, gid_of_bin):
        qno = qno[0, 0]                 # (1, 1) cell
        slot = qno % n_slots
        row = jax.lax.dynamic_slice_in_dim(tab, slot, 1, 0)[0]
        occupied = row >= 0
        ident = jnp.where(occupied, row.view(jnp.float32), 0.0)
        seg = jnp.where(occupied, gid_of_bin, n_rg)
        cnt = jax.ops.segment_sum(occupied.astype(jnp.int32), seg,
                                  num_segments=n_rg + 1)[:n_rg]
        sm = jax.ops.segment_sum(ident, seg, num_segments=n_rg + 1)[:n_rg]
        acc_counts = jax.lax.dynamic_update_slice_in_dim(
            acc_counts, (acc_counts[qno] + cnt)[None, :], qno, 0)
        acc_sums = jax.lax.dynamic_update_slice_in_dim(
            acc_sums, (acc_sums[qno] + sm)[None, :], qno, 0)
        tab = jax.lax.dynamic_update_slice_in_dim(
            tab, jnp.full((1, tab.shape[1]), -1, jnp.int32), slot, 0)
        return tab, acc_counts, acc_sums

    return jax.jit(f, donate_argnums=(0, 1, 2) if donate else ())


class StreamingCGI:
    """Bounded-memory device CGI accumulator for many-to-many runs.

    Usage (driver: models/pipeline.map_queries_cgi_device):
      * ``update(packed, n_valid, excl_frag)`` folds one mapping batch;
      * ``inject(rows)`` folds host-fallback rows (overflowed fragments);
      * ``finalize_query(qno)`` closes a query genome once its last batch
        has been folded (slots recycle modulo n_slots, so a qno must be
        finalized before qno + n_slots first updates);
      * ``result()`` fetches the final (counts, sums) matrices.
    """

    def __init__(self, index, params, n_query_genomes: int,
                 n_ref_genomes: int, n_slots: int, frag_cap: int,
                 donate: bool = True):
        import jax.numpy as jnp

        self.frag_len = params.frag_len
        self.n_qg = n_query_genomes
        self.n_rg = n_ref_genomes
        self.n_slots = max(int(n_slots), 1)
        self.frag_cap = int(frag_cap)
        self.donate = donate
        bin_start, gid_of_bin = make_bin_tables(
            [c.length for c in index.metadata], index.genome_of_seq(),
            params.frag_len)
        self.B_tot = int(len(gid_of_bin))
        self._bin_start = jnp.asarray(bin_start)
        self._gid_of_bin = jnp.asarray(gid_of_bin)
        self._gos = jnp.asarray(index.genome_of_seq())
        s_max = max(params.sketch_cap, 1)
        self._lut = jnp.asarray(identity_lut_full(params.kmer_size, s_max))
        # host-built + transferred (NOT eager jnp.full: eager dispatches
        # destabilize the tunneled client — utils/jitops docstring)
        self._tab = jnp.asarray(
            np.full((self.n_slots, self.B_tot), -1, np.int32))
        self._counts = jnp.asarray(
            np.zeros((self.n_qg, self.n_rg), np.int32))
        self._sums = jnp.asarray(
            np.zeros((self.n_qg, self.n_rg), np.float32))

    def update(self, packed, n_valid, excl_frag=None) -> None:
        """Fold one batch's packed (7, U) device block.

        ``n_valid``: host int, or a DEVICE array whose flat element 0 is
        the valid-row count (the mapper's counts vector — the zero-fetch
        path).  ``excl_frag``: (F,) bool mask of fragments whose rows
        must be ignored (host fallback re-injects them); None means none
        (the mapper already excluded overflowed fragments on device)."""
        import jax.numpy as jnp

        from fastani_tpu.utils.jitops import cell

        if isinstance(n_valid, (int, np.integer)):
            n_valid = cell(int(n_valid))
        if excl_frag is None:
            if getattr(self, "_no_excl", None) is None \
                    or self._no_excl.shape[0] != self.frag_cap:
                self._no_excl = jnp.asarray(np.zeros(self.frag_cap, bool))
            excl = self._no_excl
        else:
            excl = jnp.asarray(np.asarray(excl_frag, bool))
        fn = _update_jit(self.frag_len, self.n_slots, self.n_rg,
                         self.frag_cap, self.donate)
        self._tab = fn(self._tab, packed, n_valid, excl, self._gos,
                       self._bin_start, self._lut)

    def inject(self, rows: np.ndarray) -> None:
        """Fold host-fallback mapping rows ((7, n) int32 host array, same
        row layout as packed).  The 1-way key space uses the `frag` row,
        which the caller assigns uniquely per fragment within one call."""
        import jax.numpy as jnp

        n = rows.shape[1]
        # fixed 1024 floor: every distinct packed width would trace+compile
        # its own update program (remote compiles cost ~30-60 s each on
        # this platform), and injects are small
        cap = max(1024, 1 << max(n - 1, 1).bit_length())
        buf = np.zeros((7, cap), np.int32)
        buf[:, :n] = rows
        self.update(jnp.asarray(buf), n, np.zeros(self.frag_cap, bool))

    def finalize_query(self, qno: int) -> None:
        from fastani_tpu.utils.jitops import cell

        fn = _finalize_jit(self.n_slots, self.n_qg, self.n_rg, self.donate)
        self._tab, self._counts, self._sums = fn(
            self._tab, self._counts, self._sums, cell(int(qno)),
            self._gid_of_bin)

    def finalize_list(self, qnos, fin_cap: int) -> None:
        """Flush the listed query genomes' slots into the accumulators
        (the post-scan tail of the in-scan-finalize stream; enqueue-only,
        no fetch).  len(qnos) <= fin_cap; fin_cap is a static program
        width (pad entries are -1 no-ops)."""
        import jax.numpy as jnp

        fn = _finalize_rows_jit(fin_cap, self.n_slots, self.n_qg,
                                self.n_rg, self.donate)
        buf = np.full(fin_cap, -1, np.int32)
        buf[:len(qnos)] = np.asarray(list(qnos), np.int32)
        self._tab, self._counts, self._sums = fn(
            self._tab, self._counts, self._sums, jnp.asarray(buf),
            self._gid_of_bin)

    def result(self):
        return np.asarray(self._counts), np.asarray(self._sums)
