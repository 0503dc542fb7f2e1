"""End-to-end ANI pipeline driver.

Orchestrates sketch -> map -> aggregate -> write, replicating the reference
driver's semantics (reference: src/cgi/core_genome_identity.cpp:27-167) with
one logical shard: the reference's per-thread round-robin reference split
exists only for CPU parallelism and its TSV/matrix output is split-count
invariant; this driver always produces the single-shard (-t 1) output,
including the .visual file (whose global offsets are shard-dependent in the
reference — we standardize on the -t 1 form).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from fastani_tpu.config import Parameters
from fastani_tpu.index.sketch import ReferenceIndex
from fastani_tpu.io import fasta
from fastani_tpu.models import ani, glue, output
from fastani_tpu.ops import hashing
from fastani_tpu.utils.refmodel import Mapping


@dataclasses.dataclass
class QueryFragments:
    frags: np.ndarray           # (F, frag_len) uint8 (uppercased)
    frag_ids: np.ndarray        # (F,) global fragment ids (querySeqId)
    total_fragments: int
    # visualization metadata: one entry per fragment, plus one per skipped
    # short contig (computeMap.hpp:140-167); offsets are prefix sums of lens
    vis_offsets: np.ndarray     # (n_meta,) int64 global offset per entry
    # all fragment bytes are uppercase A/C/G/T: enables the 2-bit packed
    # H2D path (ops/hashing.pack2_np); any other byte must upload raw
    pure_acgt: bool = False


def load_query_fragments(path: str, params: Parameters) -> QueryFragments:
    """Fragment one query genome into (F, frag_len) rows.

    Array-native per contig (one uppercase pass + one reshape), so ingest
    scales with bytes rather than fragment count — the reference fragments
    inside its per-fragment mapping loop (computeMap.hpp:152-157)."""
    l = params.frag_len
    k, w = params.kmer_size, params.window_size
    frag_blocks: List[np.ndarray] = []
    id_blocks: List[np.ndarray] = []
    vis_blocks: List[np.ndarray] = []
    seq_counter = 0
    for name, seq in fasta.read_sequences(path):
        L = len(seq)
        if L < w or L < k or L < l:
            vis_blocks.append(np.array([L], np.int64))  # metadata only
            continue
        fc = L // l
        frag_blocks.append(hashing.upper_np(seq[: fc * l]).reshape(fc, l))
        id_blocks.append(np.arange(seq_counter, seq_counter + fc, dtype=np.int32))
        lens = np.full(fc, l, np.int64)
        lens[-1] = l + (L % l)
        vis_blocks.append(lens)
        seq_counter += fc
    frags = np.concatenate(frag_blocks) if frag_blocks \
        else np.zeros((0, l), np.uint8)
    frag_ids = np.concatenate(id_blocks) if id_blocks \
        else np.zeros(0, np.int32)
    lens = np.concatenate(vis_blocks) if vis_blocks else np.zeros(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) \
        else np.zeros(0, np.int64)
    return QueryFragments(frags, frag_ids, seq_counter, offsets,
                          pure_acgt=hashing.is_pure_acgt(frags.reshape(-1)))


def map_query(query_frags: QueryFragments, index: ReferenceIndex,
              params: Parameters, backend: str = "numpy",
              frag_batch: Optional[int] = None,
              jit_mapper=None) -> List[Mapping]:
    """Map all fragments of one query genome against the index."""
    from fastani_tpu.utils import refmodel

    mappings: List[Mapping] = []
    F = len(query_frags.frags)
    bs = frag_batch or params.frag_batch

    if backend == "jax":
        # compiled device path: batches stream through the resident index;
        # only gated results + overflow flags come back
        from fastani_tpu.models import jitmap
        from fastani_tpu.ops import stats

        mapper = jit_mapper or jitmap.JitMapper(params, index)
        for b0 in range(0, F, bs):
            out = mapper(query_frags.frags[b0:b0 + bs])
            if len(out["frag"]):
                ident, upper = stats.identities_for(out["shared"],
                                                    out["sketch"],
                                                    params.kmer_size)
                for i in range(len(out["frag"])):
                    mappings.append(Mapping(
                        query_seq_id=int(query_frags.frag_ids[b0 + out["frag"][i]]),
                        ref_seq_id=int(out["sid"][i]),
                        ref_start_pos=int(out["mean_pos"][i]),
                        nuc_identity=ident[i],
                        nuc_identity_upper=upper[i],
                        conserved=int(out["shared"][i]),
                        sketch_size=int(out["sketch"][i]),
                        query_len=params.frag_len))
            fbs = out["fallback_frags"]
            if len(fbs):
                # batched exact fallback (data-sized caps), not the
                # per-fragment scalar oracle
                bm = glue.map_fallback_batch(query_frags.frags[b0 + fbs],
                                             index, params)
                mappings.extend(glue.gate_and_format(
                    bm, query_frags.frag_ids[b0 + fbs], params))
        return mappings

    import numpy as xp
    for b0 in range(0, F, bs):
        b1 = min(b0 + bs, F)
        batch = glue.map_fragment_batch(xp, query_frags.frags[b0:b1], index,
                                        params, generous=True)
        mappings.extend(glue.gate_and_format(
            batch, query_frags.frag_ids[b0:b1], params))
        for fb in batch.fallback_frags:
            mappings.extend(refmodel.map_fragment(
                query_frags.frags[b0 + fb], index, params,
                int(query_frags.frag_ids[b0 + fb])))
    return mappings


class FragmentStream:
    """Lazy global-row view over query genomes.

    Entries may be preloaded QueryFragments or PATHS; paths are parsed
    once for the batch plan (counts + visual metadata) and reloaded on
    demand while batches consume them, with eviction once a query's rows
    are behind the stream head — host memory holds only the genomes
    spanning the in-flight batches (the reference streams queries one
    kseq record at a time, computeMap.hpp:132).
    """

    def __init__(self, queries, params: Parameters):
        self.queries = list(queries)
        self.params = params
        self._cache: Dict[int, QueryFragments] = {}
        self.meta: Dict[int, tuple] = {}
        counts = []
        self.all_pure_acgt = True
        for i, q in enumerate(self.queries):
            qf = q if not isinstance(q, str) \
                else load_query_fragments(q, params)
            self.meta[i] = (len(qf.frags), qf.total_fragments,
                            qf.vis_offsets)
            counts.append(len(qf.frags))
            self.all_pure_acgt &= qf.pure_acgt
            del qf
        self.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.F = int(self.offsets[-1])

    def qno_of_row(self, row: int) -> int:
        return int(np.searchsorted(self.offsets, row, side="right")) - 1

    def total_fragments(self, qno: int) -> int:
        return self.meta[qno][1]

    def vis_offsets(self, qno: int) -> np.ndarray:
        return self.meta[qno][2]

    def get_query(self, qno: int) -> QueryFragments:
        q = self.queries[qno]
        if not isinstance(q, str):
            return q
        if qno not in self._cache:
            self._cache[qno] = load_query_fragments(q, self.params)
        return self._cache[qno]

    def evict_up_to(self, qno: int) -> None:
        """Drop cached fragment arrays of lazy queries < qno."""
        for k in [k for k in self._cache if k < qno]:
            del self._cache[k]

    def make_batch(self, b0: int, B: int):
        """Assemble rows [b0, b0+B) (zero-padded past F).  Returns
        (frags (B, L) u8, qno_row (B,) i32, gid_row (B,) i32, n_used)."""
        L = self.params.frag_len
        frags = np.zeros((B, L), np.uint8)
        qno_row = np.zeros(B, np.int32)
        gid_row = np.zeros(B, np.int32)
        n = min(B, self.F - b0)
        r = 0
        qno = self.qno_of_row(b0)
        while r < n:
            qf = self.get_query(qno)
            lo = b0 + r - int(self.offsets[qno])
            take = min(n - r, len(qf.frags) - lo)
            frags[r:r + take] = qf.frags[lo:lo + take]
            qno_row[r:r + take] = qno
            gid_row[r:r + take] = qf.frag_ids[lo:lo + take]
            r += take
            qno += 1
        return frags, qno_row, gid_row, n



def map_queries_batched(queries: List[QueryFragments], index: ReferenceIndex,
                        params: Parameters, jit_mapper) -> List[dict]:
    """Map MANY query genomes in shared full-size device batches.

    The compiled map step has fixed (frag_batch,)-shaped cost, so packing
    fragments from consecutive query genomes into one batch makes cost
    scale with total fragments instead of with query count (the reference
    maps queries one at a time — computeMap.hpp:132 — because its cost is
    per-fragment; ours is per-batch).

    Returns one dict per query with vectorized result columns
    (query_seq_id, ref_seq_id, ref_start_pos, ident) — the Mapping-object
    path costs more host time than the device mapping itself at scale.
    """
    from fastani_tpu.ops import stats

    B = params.frag_batch
    stream = queries if isinstance(queries, FragmentStream) \
        else FragmentStream(queries, params)
    n_queries = len(stream.queries)
    F = stream.F

    cols = {k: [] for k in ("qno", "qsid", "sid", "start", "ident")}

    # depth-2 dispatch pipeline: batch i+1 is enqueued (H2D + launch)
    # before batch i's results are fetched, so tunnel latency overlaps
    # device compute.  Falls back to synchronous mapping for mappers
    # without the two-phase interface.
    pipelined = hasattr(jit_mapper, "dispatch") and hasattr(jit_mapper, "collect")
    starts = list(range(0, F, B))

    def results_iter():
        inflight = []
        for b0 in starts:
            batch, qno_row, gid_row, n = stream.make_batch(b0, B)
            if not pipelined:
                yield batch, qno_row, gid_row, jit_mapper(batch[:n])
                continue
            inflight.append((batch, qno_row, gid_row,
                             jit_mapper.dispatch(batch[:n])))
            if len(inflight) >= 2:
                bt, qr, gr, h = inflight.pop(0)
                yield bt, qr, gr, jit_mapper.collect(h)
                stream.evict_up_to(stream.qno_of_row(b0))
        for bt, qr, gr, h in inflight:
            yield bt, qr, gr, jit_mapper.collect(h)

    for batch, qno_row, gid_row, out in results_iter():
        if len(out["frag"]):
            ident, _ = stats.identities_for(out["shared"], out["sketch"],
                                            params.kmer_size)
            rows = out["frag"]
            cols["qno"].append(qno_row[rows])
            cols["qsid"].append(gid_row[rows])
            cols["sid"].append(out["sid"])
            cols["start"].append(out["mean_pos"])
            cols["ident"].append(ident)
        fbs = out["fallback_frags"]
        if len(fbs):
            # batched exact fallback with data-sized caps (glue), gated
            # identically to the device path
            bm = glue.map_fallback_batch(batch[fbs], index, params)
            if len(bm.frag):
                ident, upper = stats.identities_for(bm.shared, bm.sketch,
                                                    params.kmer_size)
                keep = upper >= params.percentage_identity
                rows = bm.frag[keep]
                cols["qno"].append(qno_row[fbs[rows]])
                cols["qsid"].append(gid_row[fbs[rows]].astype(np.int64))
                cols["sid"].append(bm.sid[keep].astype(np.int64))
                cols["start"].append(bm.mean_pos[keep].astype(np.int64))
                cols["ident"].append(ident[keep].astype(np.float32))

    if cols["qno"]:
        qno = np.concatenate(cols["qno"])
        qsid = np.concatenate([np.asarray(a, np.int64) for a in cols["qsid"]])
        sid = np.concatenate([np.asarray(a, np.int64) for a in cols["sid"]])
        start = np.concatenate([np.asarray(a, np.int64) for a in cols["start"]])
        ident = np.concatenate(cols["ident"]).astype(np.float32)
    else:
        qno = np.zeros(0, np.int32)
        qsid = sid = start = np.zeros(0, np.int64)
        ident = np.zeros(0, np.float32)

    out_list = []
    for i in range(n_queries):
        sel = qno == i
        out_list.append(dict(query_seq_id=qsid[sel], ref_seq_id=sid[sel],
                             ref_start_pos=start[sel], ident=ident[sel]))
    return out_list


@dataclasses.dataclass
class CGIRunHandle:
    """In-flight zero-fetch device-CGI run (stream phase done, nothing
    fetched): all listed arrays are device-resident."""
    cgi: object                 # StreamingCGI (recycled slot ring)
    fb_masks: list              # per-chunk (K, B) bool fallback masks
    counts_list: list           # per-chunk (K, 10) diagnostics vectors
    stream: "FragmentStream"
    starts: list
    n_query_genomes: int
    n_ref_genomes: int

    def block(self):
        """Best-effort wait for enqueued device work (NO transfer).
        NOTE: block_until_ready is a no-op under the axon plugin in
        async mode — honest timing must span enqueue through the first
        readout fetch (bench.py does)."""
        import jax

        jax.block_until_ready(self.cgi._tab)


def autotune_hits_cap(jit_mapper, stream: "FragmentStream",
                      params: Parameters, n_samples: int = 12,
                      margin: float = 1.25) -> int:
    """Probe-pass hits_cap auto-tune: measure the per-fragment L1 hit
    maximum on ``n_samples`` evenly spaced batches and SHRINK hits_cap
    to round1024(max * margin) — never above the static formula's value.
    Every L1 stage scales with this width (at the 100x100 bench scale
    the static cap wastes ~25-45% of the dominant L1 cost).  A fragment
    of an unsampled batch exceeding the tuned cap falls back to the
    exact host redo, so results stay exact regardless of sampling."""
    import jax.numpy as jnp

    from fastani_tpu.utils import jitops

    B = params.frag_batch
    starts = list(range(0, stream.F, B))
    # the probe+retrace overhead (~6 s: 12 probe dispatches + re-tracing
    # the map program at the tuned shape) only amortizes when the static
    # cap is large — small caps have little width to recover
    if not starts or params.hits_cap <= 8192:
        return params.hits_cap
    step = max(1, len(starts) // n_samples)
    picks = starts[::step][:n_samples]
    fn = jit_mapper.probe_fn()
    ft = jitops.cell(jit_mapper.cfg.freq_threshold)
    cells = []
    for b0 in picks:
        batch, _, _, _n = stream.make_batch(b0, B)
        cells.append(fn(jnp.asarray(batch), jit_mapper._occ_hash,
                        jit_mapper._occ_lut, jit_mapper._n_occ, ft))
    mx = max(int(jitops.fetch(c)[0, 0]) for c in cells)
    new_cap = min(params.hits_cap,
                  max(4096, -(-int(mx * margin) // 1024) * 1024))
    jit_mapper.retune_hits_cap(new_cap)
    params.hits_cap = new_cap
    return new_cap


def cgi_stream_schedule(stream: "FragmentStream", B: int,
                        n_query_genomes: int):
    """Static slot/finalize plan for the in-scan-finalize stream.

    Returns (starts, fins, tail, n_slots, fin_cap): per-batch finalize
    lists (query genomes whose fragments all precede that batch), the
    post-scan leftover list, the slot-ring size (max distinct query
    genomes spanned by any one batch — consecutive qnos, so modulo
    n_slots is collision-free), and the padded static width of the fin
    lists.  Pure host arithmetic over the fragment-count prefix sums —
    no device work."""
    F = stream.F
    starts = list(range(0, F, B))
    q_lo = [stream.qno_of_row(b0) for b0 in starts]
    q_hi = [stream.qno_of_row(min(b0 + B, F) - 1) for b0 in starts]
    n_slots = max((hi - lo + 1 for lo, hi in zip(q_lo, q_hi)), default=1)
    # finalize only query genomes that OWN fragments: an empty genome's
    # slot never holds data, and listing it would alias an active
    # query's slot inside one finalize_rows gather (double fold) —
    # active qnos in any one list span < n_slots, so their slots are
    # distinct by construction
    has_frags = [stream.meta[i][0] > 0 for i in range(n_query_genomes)]
    fins, ptr = [], 0
    for lo in q_lo:
        fins.append([q for q in range(ptr, lo) if has_frags[q]])
        ptr = max(ptr, lo)
    tail = [q for q in range(ptr, n_query_genomes) if has_frags[q]]
    max_fin = max((len(f) for f in fins), default=0)
    fin_cap = max(8, 1 << max(max_fin - 1, 1).bit_length())
    return starts, fins, tail, n_slots, fin_cap


def map_queries_cgi_stream(queries, index: ReferenceIndex,
                           params: Parameters, jit_mapper,
                           n_query_genomes: int, n_ref_genomes: int,
                           fuse_k: int = 16) -> CGIRunHandle:
    """ZERO-FETCH stream phase of the device-CGI throughput path: enqueue
    the run as FEW, LARGE programs — each fused program maps fuse_k
    fragment batches, folds each into a small recycled slot table, and
    closes finished query genomes' per-query segments into the (Gq, Gr)
    accumulators IN-SCAN (models/jitmap.fused_stream_fin_fn) — without a
    single device->host transfer.  Rationale (measured, round 4): the
    first fetch of any buffer permanently degrades the tunneled client's
    dispatch AND transfer latency 15-250x, and deep async dispatch
    queues cost ~2 s per program past ~8-16 in flight, so the only fast
    shape is a shallow queue of fused programs with ONE readout at the
    end (map_queries_cgi_finish).  HBM is O(n_slots x ref bins),
    independent of the query-genome count, so the 1000-genome BASELINE
    config streams zero-fetch; the reference's equivalent aggregation is
    computeCoreIdentity.hpp:166-298 on host memory, once per query."""
    import jax

    from fastani_tpu.models import device_cgi

    B = params.frag_batch
    L = params.frag_len
    stream = queries if isinstance(queries, FragmentStream) \
        else FragmentStream(queries, params)
    F = stream.F
    starts, fins, tail, n_slots, fin_cap = cgi_stream_schedule(
        stream, B, n_query_genomes)
    cgi = device_cgi.StreamingCGI(
        index, params, n_query_genomes, n_ref_genomes,
        n_slots=n_slots, frag_cap=B,
        donate=jax.default_backend() == "tpu")
    # 2-bit packed H2D when every query byte is uppercase ACGT (4x less
    # upload through the ~39 MB/s tunnel; ops/hashing.pack2_np)
    packed_h2d = getattr(stream, "all_pure_acgt", False) and L % 4 == 0
    fn = jit_mapper.fused_stream_fin_fn(
        fuse_k, fin_cap, cgi, packed_frags=packed_h2d) if starts else None
    fb_masks, counts_list = [], []
    for c0 in range(0, len(starts), fuse_k):
        grp = starts[c0:c0 + fuse_k]
        frags_k = np.zeros((fuse_k, B, L), np.uint8)
        qno_k = np.zeros((fuse_k, B), np.int32)
        qsid_k = np.zeros((fuse_k, B), np.int32)
        rv_k = np.zeros((fuse_k, B), bool)
        fin_k = np.full((fuse_k, fin_cap), -1, np.int32)
        for j, b0 in enumerate(grp):
            batch, qno_row, gid_row, n_used = stream.make_batch(b0, B)
            frags_k[j] = batch
            qno_k[j] = qno_row
            qsid_k[j] = gid_row
            rv_k[j, :n_used] = True
            fl = fins[c0 + j]
            fin_k[j, :len(fl)] = fl
        counts_k, fb_k = jit_mapper.dispatch_fused_fin(
            fn, hashing.pack2_np(frags_k) if packed_h2d else frags_k,
            qno_k, qsid_k, rv_k, fin_k, cgi)
        fb_masks.append(fb_k)
        counts_list.append(counts_k)
        if grp:
            nb = grp[-1] + B
            stream.evict_up_to(stream.qno_of_row(nb) if nb < F
                               else n_query_genomes)
    # post-scan tail flush (enqueue-only; still no fetch)
    for t0 in range(0, len(tail), fin_cap):
        cgi.finalize_list(tail[t0:t0 + fin_cap], fin_cap)
    return CGIRunHandle(cgi, fb_masks, counts_list, stream, starts,
                        n_query_genomes, n_ref_genomes)


def _redo_query_exact(qno: int, stream: "FragmentStream",
                      index: ReferenceIndex, params: Parameters,
                      jit_mapper):
    """Exact recompute of ONE query genome's (counts, sums) result row.

    Engages only when a fragment of the query overflowed the jitted
    caps: the device stream excluded that whole fragment, and the 2-way
    reciprocal dedupe couples fragments, so the query's entire
    aggregation is redone — device map for the clean fragments + exact
    host fallback for the overflowed ones + host CGI fold
    (computeCoreIdentity.hpp:166-298 semantics, models/ani.py).  Rare by
    construction (caps are sized for zero overflow at scale; bench
    asserts fallback_frags == 0)."""
    qf = stream.get_query(qno)
    m = map_queries_batched([qf], index, params, jit_mapper)[0]
    rows, _ = ani.compute_cgi_arrays(
        m["ref_seq_id"], m["query_seq_id"], m["ref_start_pos"], m["ident"],
        index.genome_of_seq(), params.frag_len, qno,
        stream.total_fragments(qno), want_visual=False)
    out = {}
    for r in rows:
        out[r.ref_genome] = (r.count_seq,
                             np.float32(r.identity) * np.float32(r.count_seq))
    return out


def map_queries_cgi_finish(handle: CGIRunHandle, index: ReferenceIndex,
                           params: Parameters, jit_mapper,
                           stats: Optional[dict] = None):
    """Readout phase: the run's FIRST device->host fetches happen here —
    deferred build-overflow flag, fallback masks, diagnostics — then the
    (Gq, Gr) result fetch (per-query segments already closed in-scan)."""
    from fastani_tpu.utils import jitops

    cgi, stream, starts = handle.cgi, handle.stream, handle.starts
    B = params.frag_batch
    _t = time.time()

    def _mark(key):
        nonlocal _t
        if stats is not None:
            stats[f"t_{key}"] = round(time.time() - _t, 3)
        _t = time.time()

    if index.check_build_overflow():
        # degenerate repeat input: the device index silently dropped
        # minimizers — rebuild exactly on host and redo (rare)
        from fastani_tpu.models import jitmap as _jm

        host_index = type(index).build(params)
        uf = max(1, jit_mapper.cfg.unit_cap // max(B, 1))
        mapper2 = _jm.JitMapper(params, host_index, unit_factor=uf,
                                unit_chunk=jit_mapper.cfg.unit_chunk)
        return map_queries_cgi_device(handle.stream, host_index, params,
                                      mapper2, handle.n_query_genomes,
                                      handle.n_ref_genomes, stats=stats)
    _mark("overflow_check")

    if stats is not None and handle.counts_list:
        cm = jitops.fetch(jitops._concat()(
            tuple(handle.counts_list)))[:len(starts)]
        for i, key in enumerate((
                "n_valid", "sk_overflow", "l1_overflow", "l2_overflow",
                "unit_overflow", "max_hits", "max_groups", "max_s",
                "max_span", "n_units", "sum_hits")):
            stats[key] = int(cm[:, i].max()) if len(cm) else 0
        stats["batches"] = len(starts)
        stats["fallback_frags"] = 0
    _mark("stats_fetch")

    bad_qnos = set()
    if handle.fb_masks and jitops.any_of(handle.fb_masks):
        masks = jitops.fetch(jitops._concat()(
            tuple(handle.fb_masks)))[:len(starts)]
        F = stream.F
        n_fb = 0
        for i, b0 in enumerate(starts):
            n_used = min(B, F - b0)
            fbr = np.nonzero(masks[i][:n_used])[0]
            n_fb += len(fbr)
            for r in fbr:
                bad_qnos.add(stream.qno_of_row(b0 + int(r)))
        if stats is not None:
            stats["fallback_frags"] = n_fb
    _mark("fb_check")
    counts, sums = cgi.result()
    _mark("result_fetch")
    # affected query genomes (a fragment overflowed the jitted caps) are
    # redone exactly and their result rows REPLACED — the in-scan
    # finalize already closed their slots, so post-hoc injection is no
    # longer possible (and a whole-query redo is exact where injection
    # depended on the device rows staying resident)
    for qno in sorted(bad_qnos):
        counts[qno, :] = 0
        sums[qno, :] = 0.0
        for g, (c, s) in _redo_query_exact(qno, stream, index, params,
                                           jit_mapper).items():
            counts[qno, g] = c
            sums[qno, g] = s
    _mark("fb_redo")
    return counts, sums


def map_queries_cgi_device(queries: List[QueryFragments], index: ReferenceIndex,
                           params: Parameters, jit_mapper,
                           n_query_genomes: int, n_ref_genomes: int,
                           stats: Optional[dict] = None):
    """Throughput path: map all queries AND aggregate CGI on device.

    Mapping rows never leave the device — each batch contributes its
    packed (7, U_cap) block to a device-resident accumulator reduced to
    per-genome-pair (count, identity-sum) matrices.  Per-pair sums are
    float32 device reductions — final-ulp addition order may differ from
    the host fold; byte-parity consumers use map_queries_batched +
    ani.compute_cgi_arrays instead.

    ZERO-FETCH at any scale: the steady loop performs NO device->host
    transfer at all — overflow/fallback masks stay on device, the CGI
    folds the mapper's device counts vector directly, and each query
    genome's segment closes IN-SCAN as soon as its last fragment batch
    has folded (slots recycle modulo a small ring, so HBM is independent
    of the query count).  Rationale: the FIRST fetch of any buffer
    permanently degrades the tunneled client's dispatch latency ~250x
    (utils/jitops docstring), so fetches happen exactly once, after the
    last dispatch.

    Reference parity: computeCoreIdentity.hpp:166-298 performs this
    aggregation on host memory per query file.
    """
    stream = queries if isinstance(queries, FragmentStream) \
        else FragmentStream(queries, params)
    if not stream.F:
        return (np.zeros((n_query_genomes, n_ref_genomes), np.int32),
                np.zeros((n_query_genomes, n_ref_genomes), np.float32))
    handle = map_queries_cgi_stream(stream, index, params, jit_mapper,
                                    n_query_genomes, n_ref_genomes)
    return map_queries_cgi_finish(handle, index, params, jit_mapper,
                                  stats=stats)


def run_fast(params: Parameters,
             log=lambda msg: print(msg, file=sys.stderr),
             stats: Optional[dict] = None) -> List[ani.CGIResult]:
    """THROUGHPUT CLI path: device index build + fused zero-fetch
    map+CGI stream + single readout — the bench-proven program shape as
    the product default for ``--backend jax`` (``--exact`` forces the
    byte-parity host aggregation of run()).  ANI equals the exact path's
    within float32 summation order (well inside the 0.1-ANI contract);
    counts and the minFraction output gate are identical.

    Reference: one CLI covers full capability (parseCmdArgs.hpp:114-234);
    the aggregation replaced here is computeCoreIdentity.hpp:166-298.
    """
    import jax

    from fastani_tpu.config import scale_caps
    from fastani_tpu.models import jitmap

    params.finalize()
    G = len(params.ref_sequences)
    scale_caps(G, params)
    t0 = time.time()
    if jax.default_backend() == "tpu":
        from fastani_tpu.utils import jitops

        jitops.engage_sync()   # sync mode IS the fast mode
    if params.load_index:
        index = ReferenceIndex.load(params.load_index, params)
        log(f"INFO, fastani_tpu, reference index restored from "
            f"{params.load_index} in {time.time()-t0:.2f}s")
    else:
        index = ReferenceIndex.build_device(params)
        log(f"INFO, fastani_tpu, reference sketched on device in "
            f"{time.time()-t0:.2f}s (window size {params.window_size}; "
            f"counts deferred)")
    if params.save_index:
        index.host_view().save(params.save_index)
        log(f"INFO, fastani_tpu, reference index saved to "
            f"{params.save_index}")

    t0 = time.time()
    uf = max(G + 2, int(1.7 * G) + 8)
    mapper = jitmap.JitMapper(params, index, unit_factor=uf,
                              unit_chunk=min(512, params.frag_batch))
    stream = FragmentStream(list(params.query_sequences), params)
    n_q = len(stream.queries)
    cap = autotune_hits_cap(mapper, stream, params)
    log(f"INFO, fastani_tpu, hits_cap auto-tuned to {cap}")
    counts, sums = map_queries_cgi_device(stream, index, params, mapper,
                                          n_q, G, stats=stats)
    log(f"INFO, fastani_tpu, mapped {n_q} queries ({stream.F} fragments) "
        f"+ device CGI in {time.time()-t0:.2f}s")

    final = ani.results_from_matrices(counts, sums, stream.total_fragments)
    if params.out_file_name:
        genome_lengths: Dict[str, int] = {}
        for e in list(params.query_sequences) + list(params.ref_sequences):
            if e not in genome_lengths:
                genome_lengths[e] = fasta.genome_length_for_ani(
                    e, params.frag_len)
        output.write_cgi(final, genome_lengths, params,
                         params.out_file_name)
        if params.matrix_output:
            output.write_phylip(final, genome_lengths, params,
                                params.out_file_name)
    return final


def run(params: Parameters, backend: str = "numpy",
        log=lambda msg: print(msg, file=sys.stderr)) -> List[ani.CGIResult]:
    """Full run: returns the CGI rows and writes all requested outputs."""
    params.finalize()
    out_path = params.out_file_name
    t0 = time.time()
    if params.load_index:
        index = ReferenceIndex.load(params.load_index, params)
        log(f"INFO, fastani_tpu, reference index restored from "
            f"{params.load_index} in {time.time()-t0:.2f}s: "
            f"{index.num_entries} minimizers")
    else:
        if backend == "jax":
            import jax

            if jax.default_backend() == "tpu":
                from fastani_tpu.utils import jitops

                jitops.engage_sync()   # sync mode IS the fast mode
        build = (ReferenceIndex.build_device if backend == "jax"
                 else ReferenceIndex.build)
        index = build(params)
        if index._counts2_dev is not None:
            # device-resident counts stay deferred: fetching them here
            # would be the process's first device->host transfer and would
            # permanently degrade dispatch latency for the whole mapping
            # phase (utils/jitops docstring)
            log(f"INFO, fastani_tpu, reference sketched in "
                f"{time.time()-t0:.2f}s (window size {params.window_size}; "
                f"entry counts deferred on device)")
        else:
            log(f"INFO, fastani_tpu, reference sketched in "
                f"{time.time()-t0:.2f}s: {index.num_entries} minimizers, "
                f"{index.num_unique_hashes} unique "
                f"(window size {params.window_size})")
        # deferred degenerate-repeat overflow: this CLI path fetches
        # per batch anyway, so resolve the flag up front (exactness)
        if index.check_build_overflow():
            log("INFO, fastani_tpu, device build overflowed per-row caps "
                "(degenerate repeat input); rebuilding exactly on host")
            index = ReferenceIndex.build(params)
    if params.save_index:
        index.save(params.save_index)
        log(f"INFO, fastani_tpu, reference index saved to {params.save_index}")

    sane = True
    if params.sanity_check:
        sane = index.sanity_check(params.max_ratio_diff)

    final: List[ani.CGIResult] = []
    genome_of_seq = index.genome_of_seq()
    ref_offsets = np.concatenate([[0], np.cumsum([c.length for c in index.metadata])[:-1]]) \
        if index.metadata else np.zeros(0, np.int64)

    if params.visualize and out_path:
        open(out_path + ".visual", "w").close()  # fresh run

    jit_mapper = None
    if sane and backend == "jax":
        from fastani_tpu.models import jitmap

        jit_mapper = jitmap.JitMapper(params, index)

    if sane:
        stream = None
        if backend == "jax":
            # fragments from all queries share full-size device batches,
            # streamed lazily with bounded host memory
            t0 = time.time()
            stream = FragmentStream(list(params.query_sequences), params)
            import contextlib
            prof = contextlib.nullcontext()
            if params.profile_dir:
                import jax

                prof = jax.profiler.trace(params.profile_dir,
                                          create_perfetto_trace=True)
            with prof:
                maps_per_q = map_queries_batched(stream, index, params,
                                                 jit_mapper)
            log(f"INFO, fastani_tpu, mapped {len(stream.queries)} queries "
                f"({stream.F} fragments) in {time.time()-t0:.2f}s")
            if params.profile_dir:
                log(f"INFO, fastani_tpu, profiler trace written to "
                    f"{params.profile_dir}")

        for qno, qpath in enumerate(params.query_sequences):
            t0 = time.time()
            if stream is not None:
                m = maps_per_q[qno]
                rows, visual = ani.compute_cgi_arrays(
                    m["ref_seq_id"], m["query_seq_id"], m["ref_start_pos"],
                    m["ident"], genome_of_seq, params.frag_len, qno,
                    stream.total_fragments(qno),
                    want_visual=params.visualize)
                q_vis = stream.vis_offsets(qno)
            else:
                qf = load_query_fragments(qpath, params)
                mappings = map_query(qf, index, params, backend=backend,
                                     jit_mapper=jit_mapper)
                log(f"INFO, fastani_tpu, mapped query {qno + 1} "
                    f"({qf.total_fragments} fragments) in {time.time()-t0:.2f}s")
                rows, visual = ani.compute_cgi(mappings, genome_of_seq,
                                               params.frag_len, qno,
                                               qf.total_fragments)
                q_vis = qf.vis_offsets
            final.extend(rows)
            if params.visualize and out_path:
                output.write_visual(visual, params, qno, q_vis,
                                    ref_offsets, out_path, append=True)
    else:
        log(f"ERROR :: SPLIT 0's ratio difference {index.ratio_difference} "
            f"exceeds maximum thresholds.")

    genome_lengths: Dict[str, int] = {}
    for e in list(params.query_sequences) + list(params.ref_sequences):
        if e not in genome_lengths:
            genome_lengths[e] = fasta.genome_length_for_ani(e, params.frag_len)

    if out_path:
        output.write_cgi(final, genome_lengths, params, out_path)
        if params.matrix_output:
            output.write_phylip(final, genome_lengths, params, out_path)
    return final
