"""Device-mesh parallelism for many-to-many ANI runs.

TPU-native replacement for the reference's two parallelism layers
(reference: per-thread round-robin reference sharding at
computeCoreIdentity.hpp:457-474 + shell-level multi-node DB splitting in
scripts/splitDatabase.sh):

* mesh axis "r" — reference shards: each device along r holds a disjoint
  round-robin subset of the reference genomes (the splitReferenceGenomes
  law, j % n_r == r), as stacked equal-size index arrays;
* mesh axis "q" — query-fragment data parallelism: each device along q maps
  a slice of the fragment batch against its r-shard's index;
* the reference's `omp critical` results merge (core_genome_identity.cpp:
  112-115) becomes a psum over the q axis of per-ref-genome (sum identity,
  count) tallies after on-device reciprocal dedupe.

Identity values on device come from the closed-form point-identity LUT
(no binomial CI needed for comparison/aggregation; the CI gate is the 1-D
min-shared LUT).  Device tallies sum in mesh order, so the final ANI can
differ from the host exact fold by float32 rounding only (<< 1e-4); golden
runs use the host aggregation path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fastani_tpu.models import jitmap


def make_mesh(n_r: int, n_q: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_r * n_q, "not enough devices for mesh"
    return Mesh(devices[: n_r * n_q].reshape(n_r, n_q), ("r", "q"))


@functools.lru_cache(maxsize=None)
def point_identity_lut(s_max: int, k: int) -> np.ndarray:
    """identity[s, c] = 100*(1-j2md(c/s,k)) as float32 (closed form)."""
    out = np.zeros((s_max + 1, s_max + 1), np.float32)
    for s in range(1, s_max + 1):
        c = np.arange(s + 1)
        j = (1.0 * c / s).astype(np.float32)
        denom = (np.float32(1) + j).astype(np.float32)
        with np.errstate(divide="ignore"):
            mash = ((-1.0 / k) * np.log(2.0 * j.astype(np.float64) / denom.astype(np.float64))).astype(np.float32)
        mash = np.where(c == 0, np.float32(1.0), mash)
        mash = np.where(c == s, np.float32(0.0), mash)
        ident = (np.float32(100) * (np.float32(1) - mash).astype(np.float32)).astype(np.float32)
        out[s, : s + 1] = ident
    return out


_PINF = np.int32(2**30)


@dataclasses.dataclass
class ShardedIndex:
    """Round-robin reference shards stacked into equal-size device arrays.

    Rows not in ``owned_rows`` hold fill values only (multi-host builds
    sketch exclusively the shards their devices own — the reference's
    per-split build, winSketch.hpp:109-115 under core_genome_identity.cpp:65;
    placement via distributed.shard_index_arrays never reads them).
    """
    n_r: int
    occ_hash: np.ndarray   # (n_r, M) uint32
    occ_sid: np.ndarray    # (n_r, M) int32
    occ_wpos: np.ndarray   # (n_r, M) int32
    mi_hash: np.ndarray
    mi_sid: np.ndarray
    mi_wpos: np.ndarray
    seq_start: np.ndarray  # (n_r, S+1) int64
    genome_of_seq: np.ndarray  # (n_r, S) int32 - local seqid -> local genome no
    n_genomes: np.ndarray      # (n_r,) genomes per shard
    n_occ: np.ndarray          # (n_r,) true (unpadded) entry count per shard
    freq_threshold: int        # min over shards (back-compat; prefer per-shard)
    max_local_genomes: int
    # map (shard, local genome) -> global genome id: global = local * n_r + shard
    # (correctRefGenomeIds law, computeCoreIdentity.hpp:480-487)

    # ---- fast-path arrays (packed keys, probe LUTs, occurrence links) ----
    occ_packed: "Optional[np.ndarray]" = None   # (n_r, M) uint32
    mi_packed: "Optional[np.ndarray]" = None
    occ_lut: "Optional[np.ndarray]" = None      # (n_r, 65537) int32
    mi_lut: "Optional[np.ndarray]" = None
    mi_prev: "Optional[np.ndarray]" = None      # (n_r, M) int32
    mi_nxt: "Optional[np.ndarray]" = None
    wpos_bits: "Optional[int]" = None
    occ_rounds: int = 0
    mi_rounds: int = 0
    # per-shard histogram threshold (winSketch.hpp:199-248 is per split)
    freq_thresholds: "Optional[np.ndarray]" = None    # (n_r,) int32
    # per-shard sanity-check inputs (winSketch.hpp:298-318)
    total_lengths: "Optional[np.ndarray]" = None      # (n_r,) int64
    n_uniques: "Optional[np.ndarray]" = None          # (n_r,) int64
    # local seqid -> GLOBAL seqid (the unsharded index numbering), for
    # emitting .visual rows identical to the single-device run
    global_sid: "Optional[np.ndarray]" = None         # (n_r, S) int32
    owned_rows: "Optional[List[int]]" = None
    # shard-local reference position-bin layout (2-way dedupe tables):
    # bin = bin_start[sid_local] + pos // (fragLen-20); sid/gid_of_bin map
    # bins back to contigs/local genomes (fills: sid=0, gid=G pad group)
    bin_start: "Optional[np.ndarray]" = None          # (n_r, S+1) int32
    sid_of_bin: "Optional[np.ndarray]" = None         # (n_r, B_cap) int32
    gid_of_bin: "Optional[np.ndarray]" = None         # (n_r, B_cap) int32


def _prev_next_np(mi_hash, mi_sid):
    """Host mirror of l2walk.prev_next_global over unpadded arrays."""
    order = np.argsort(mi_hash, kind="stable").astype(np.int32)
    oh, os_ = mi_hash[order], mi_sid[order]
    same = (oh[1:] == oh[:-1]) & (os_[1:] == os_[:-1])
    prev_occ = np.concatenate([[-1], np.where(same, order[:-1], -1)]).astype(np.int32)
    nxt_occ = np.concatenate([np.where(same, order[1:], _PINF),
                              [_PINF]]).astype(np.int32)
    prev_g = np.zeros(len(mi_hash), np.int32)
    nxt_g = np.zeros(len(mi_hash), np.int32)
    prev_g[order] = prev_occ
    nxt_g[order] = nxt_occ
    return prev_g, nxt_g


def shard_files(ref_files: Sequence[str], n_r: int, r: int) -> List[str]:
    """splitReferenceGenomes law: file j belongs to shard j % n_r
    (computeCoreIdentity.hpp:457-474)."""
    return [f for j, f in enumerate(ref_files) if j % n_r == r]


def local_shard_dims(shards: dict, ref_files: Sequence[str], n_r: int,
                     frag_len: int = 3000) -> dict:
    """Padding dims derivable from locally built shards (single-process
    case; multi-process merges these via distributed.allgather_shard_dims)."""
    M = max((ix.num_entries for ix in shards.values()), default=1)
    S = max((len(ix.metadata) for ix in shards.values()), default=1)
    nG = max(max(len(shard_files(ref_files, n_r, r)), 1) for r in range(n_r))
    max_len = max((c.length for ix in shards.values()
                   for c in ix.metadata), default=1)
    n_seqs_total = sum(len(ix.metadata) for ix in shards.values())
    width = frag_len - 20
    B = max((sum(c.length // width + 1 for c in ix.metadata)
             for ix in shards.values()), default=1)
    counts = np.zeros(max(len(ref_files), 1), np.int64)
    # per-file contig counts from sequences_by_file of each owned shard
    for r, ix in shards.items():
        files = [j for j in range(len(ref_files)) if j % n_r == r]
        prev = 0
        for li, j in enumerate(files[: len(ix.sequences_by_file)]):
            counts[j] = int(ix.sequences_by_file[li]) - prev
            prev = int(ix.sequences_by_file[li])
    return dict(M=max(M, 1), S=max(S, 1), G=nG, max_contig_len=max_len,
                n_seqs_total=n_seqs_total, B=max(B, 1),
                contigs_per_file=counts)


def build_shards(params, ref_files: Sequence[str], n_r: int,
                 rows: "Optional[Sequence[int]]" = None,
                 device: bool = False,
                 save_prefix: str = "", load_prefix: str = "") -> dict:
    """Build (or restore) the per-shard ReferenceIndex objects for the
    shards in ``rows`` (default: all).

    device=True winnows each shard on the accelerator
    (ReferenceIndex.build_device) and pulls the finished arrays back for
    stacking/placement.  save_prefix/load_prefix persist each shard as
    ``{prefix}.r{r}of{n_r}.npz``.
    """
    import copy

    from fastani_tpu.index.sketch import ReferenceIndex

    rows = list(range(n_r)) if rows is None else list(rows)
    shards = {}
    for r in rows:
        files = shard_files(ref_files, n_r, r)
        if load_prefix:
            p = copy.copy(params)
            ix = ReferenceIndex.load(f"{load_prefix}.r{r}of{n_r}.npz", p)
        else:
            build = ReferenceIndex.build_device if device \
                else ReferenceIndex.build
            ix = build(params, files or ref_files[:0])
            if device:
                ix = ix.host_view()
        if save_prefix:
            ix.save(f"{save_prefix}.r{r}of{n_r}.npz")
        shards[r] = ix
    return shards


def build_sharded_index(params, ref_files: Sequence[str], n_r: int,
                        rows: "Optional[Sequence[int]]" = None,
                        device: bool = False,
                        save_prefix: str = "", load_prefix: str = "",
                        shards: "Optional[dict]" = None,
                        dims: "Optional[dict]" = None) -> ShardedIndex:
    """Stack per-shard indexes into device-placeable (n_r, ...) arrays.

    ``shards``/``dims`` let multi-host callers build their own rows first
    (build_shards), agree on global padding widths
    (distributed.allgather_shard_dims over local_shard_dims), then stack —
    so no process ever sketches or materializes another host's shards.
    """
    from fastani_tpu.ops import xputils

    rows = list(range(n_r)) if rows is None else list(rows)
    if shards is None:
        shards = build_shards(params, ref_files, n_r, rows, device,
                              save_prefix, load_prefix)
    if dims is None:
        dims = local_shard_dims(shards, ref_files, n_r, params.frag_len)
    M, S = int(dims["M"]), int(dims["S"])
    nG = int(dims["G"])
    max_len = int(dims["max_contig_len"])
    n_seqs_total = int(dims["n_seqs_total"])
    B_cap = max(128, 1 << max(int(dims.get("B", 1)) - 1, 1).bit_length())

    # packed-key width: identical law to MapperConfig.from_params so the
    # sharded step runs the same fast path as the single-device mapper
    bits = max(int(max_len + 2 * params.frag_len).bit_length(), 1)
    wpos_bits = bits if n_seqs_total and \
        ((n_seqs_total - 1) << bits) + ((1 << bits) - 1) < 0xFFFFFFFF else None

    def alloc(fill, dtype, width):
        return np.full((n_r, width), fill, dtype)

    out = ShardedIndex(
        n_r=n_r,
        occ_hash=alloc(0xFFFFFFFF, np.uint32, M),
        occ_sid=alloc(_PINF, np.int32, M),
        occ_wpos=alloc(_PINF, np.int32, M),
        mi_hash=alloc(0xFFFFFFFF, np.uint32, M),
        mi_sid=alloc(_PINF, np.int32, M),
        mi_wpos=alloc(_PINF, np.int32, M),
        seq_start=np.zeros((n_r, S + 1), np.int64),
        genome_of_seq=np.zeros((n_r, S), np.int32),
        n_genomes=np.zeros(n_r, np.int32),
        n_occ=np.zeros(n_r, np.int32),
        freq_threshold=np.iinfo(np.int32).max,
        max_local_genomes=nG,
        occ_packed=alloc(0xFFFFFFFF, np.uint32, M),
        mi_packed=alloc(0xFFFFFFFF, np.uint32, M),
        occ_lut=np.zeros((n_r, 65537), np.int32),
        mi_lut=np.zeros((n_r, 65537), np.int32),
        mi_prev=alloc(-1, np.int32, M),
        mi_nxt=alloc(_PINF, np.int32, M),
        wpos_bits=wpos_bits,
        freq_thresholds=np.full(n_r, np.iinfo(np.int32).max, np.int32),
        total_lengths=np.zeros(n_r, np.int64),
        n_uniques=np.zeros(n_r, np.int64),
        global_sid=np.zeros((n_r, S), np.int32),
        owned_rows=rows,
        bin_start=np.zeros((n_r, S + 1), np.int32),
        sid_of_bin=np.zeros((n_r, B_cap), np.int32),
        gid_of_bin=np.full((n_r, B_cap), nG, np.int32),
    )

    occ_r = mi_r = 0
    for r, ix in shards.items():
        M_r = ix.num_entries
        out.n_occ[r] = M_r
        out.occ_hash[r, :M_r] = ix.occ_hash
        out.occ_sid[r, :M_r] = ix.occ_seqid
        out.occ_wpos[r, :M_r] = ix.occ_wpos
        out.mi_hash[r, :M_r] = ix.mi_hash
        out.mi_sid[r, :M_r] = ix.mi_seqid
        out.mi_wpos[r, :M_r] = ix.mi_wpos
        ss = ix.seq_start
        out.seq_start[r, : len(ss)] = ss
        out.seq_start[r, len(ss):] = ss[-1] if len(ss) else 0
        g = ix.genome_of_seq()
        out.genome_of_seq[r, : len(g)] = g
        out.n_genomes[r] = len(ix.sequences_by_file)
        out.freq_thresholds[r] = ix.freq_threshold
        out.total_lengths[r] = sum(c.length for c in ix.metadata)
        out.n_uniques[r] = ix.num_unique_hashes
        if wpos_bits is not None:
            out.occ_packed[r, :M_r] = (
                (ix.occ_seqid.astype(np.uint32) << wpos_bits)
                | ix.occ_wpos.astype(np.uint32))
            out.mi_packed[r, :M_r] = (
                (ix.mi_seqid.astype(np.uint32) << wpos_bits)
                | ix.mi_wpos.astype(np.uint32))
            out.occ_lut[r] = np.minimum(
                xputils.build_prefix_lut(np, out.occ_hash[r]), M_r)
            out.mi_lut[r] = np.minimum(
                xputils.build_prefix_lut(np, out.mi_packed[r]), M_r)
            occ_r = max(occ_r, xputils.lut_rounds(out.occ_lut[r]))
            mi_r = max(mi_r, xputils.lut_rounds(out.mi_lut[r]))
        pv, nx = _prev_next_np(ix.mi_hash, ix.mi_seqid)
        out.mi_prev[r, :M_r] = pv
        out.mi_nxt[r, :M_r] = nx
        # shard-local position-bin layout (computeCoreIdentity.hpp:194)
        width = params.frag_len - 20
        lens = np.asarray([c.length for c in ix.metadata], np.int64)
        nb = lens // width + 1
        bs = np.zeros(len(lens) + 1, np.int64)
        bs[1:] = np.cumsum(nb)
        out.bin_start[r, : len(bs)] = bs
        out.bin_start[r, len(bs):] = bs[-1] if len(bs) else 0
        if len(lens):
            out.sid_of_bin[r, : int(bs[-1])] = np.repeat(
                np.arange(len(lens), dtype=np.int32), nb)
            out.gid_of_bin[r, : int(bs[-1])] = np.repeat(
                ix.genome_of_seq().astype(np.int32), nb)
    out.freq_threshold = int(out.freq_thresholds[rows].min()) if rows \
        else np.iinfo(np.int32).max
    if wpos_bits is not None:
        # even-rounded like MapperConfig; dims may carry the global max
        # so every process compiles the identical step
        occ_r = max(occ_r, int(dims.get("occ_rounds", 0)))
        mi_r = max(mi_r, int(dims.get("mi_rounds", 0)))
        out.occ_rounds = -(-max(occ_r, 4) // 2) * 2
        out.mi_rounds = -(-max(mi_r, 4) // 2) * 2

    # global sid map (host arithmetic over per-file contig counts)
    counts = dims.get("contigs_per_file")
    if counts is not None and len(ref_files):
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
        for r, ix in shards.items():
            gsid = []
            for j in range(len(ref_files)):
                if j % n_r == r:
                    gsid.extend(range(int(starts[j]),
                                      int(starts[j]) + int(counts[j])))
            out.global_sid[r, : len(gsid)] = np.asarray(gsid[:S], np.int32)
    return out



def make_sharded_rows_step(cfg: jitmap.MapperConfig, mesh: Mesh, s_max: int,
                           k: int, frag_len: int, max_local_genomes: int,
                           rows_cap: int):
    """Sharded step that returns the 2-WAY SURVIVOR ROWS per reference
    shard, in the exact 2-way sort order, instead of device-summed tallies.

    The host folds each (shard, local genome)'s identities sequentially in
    this order, reproducing the reference's per-thread float32 accumulation
    BIT-FOR-BIT (each ref genome lives in exactly one shard, and the 2-way
    sort order restricted to one shard's contigs equals the single-shard
    order — the thread-invariance law of fastani_tests.cpp:199-255).

    SORT-FREE dedupes: the 1-way overwrite law (best (identity, refSeq,
    pos) per (refGenome, fragment), computeCoreIdentity.hpp:212-232) runs
    as three scatter-max passes over a (G x F_global) key space, and the
    2-way law (best (identity, querySeq) per (refContig, refPosBin),
    :237-255) as scatter-max passes into a per-shard position-bin table
    merged across the q axis with lax.pmax — the bin table read out in
    index order IS the 2-way sort order, so survivors come out canonically
    ordered from a butterfly compaction with no lexsort and no row
    all_gather.

    Returns (gid, ibits, sid, pos, qsid) each (n_r, rows_cap) i32 — local
    genome (big=pad), identity float bits, local ref seq id, mean ref
    start, global query fragment id — plus n_rows (n_r,) i32 survivor
    count (> rows_cap = overflow).  sid/pos/qsid feed the .visual writer
    (outputVisualizationFile, computeCoreIdentity.hpp:103-153).
    """
    G = max_local_genomes
    n_q = int(mesh.devices.shape[1])
    big = np.int32(2**30)     # np literal: inlined constant, never an
                              # eager device scalar (jitops docstring)

    def local_step(frags, ia, min_hits, gate, ident2d):
        frags2 = frags.reshape(frags.shape[-2:])
        F_local = frags2.shape[0]
        Fg = F_local * n_q
        sq = lambda a: a.reshape(a.shape[1:])
        packed = cfg.wpos_bits is not None
        out = jitmap.map_step(
            cfg, frags2, sq(ia["occ_hash"]), sq(ia["occ_sid"]),
            sq(ia["occ_wpos"]), sq(ia["mi_hash"]), sq(ia["mi_sid"]),
            sq(ia["mi_wpos"]), sq(ia["seq_start"]), min_hits, gate,
            n_occ=sq(ia["n_occ"]),
            occ_packed=sq(ia["occ_packed"]) if packed else None,
            mi_packed=sq(ia["mi_packed"]) if packed else None,
            mi_prev=sq(ia["mi_prev"]), mi_nxt=sq(ia["mi_nxt"]),
            occ_lut=sq(ia["occ_lut"]) if packed else None,
            mi_lut=sq(ia["mi_lut"]) if packed else None,
            freq_threshold=sq(ia["freq_threshold"]))
        gos1 = sq(ia["genome_of_seq"])
        qidx = jax.lax.axis_index("q")
        frag_g = out["frag"] + qidx * F_local
        sid = out["sid"]
        pos = out["mean_pos"]
        gid = gos1[jnp.clip(sid, 0, gos1.shape[0] - 1)]
        ident = ident2d[jnp.clip(out["sketch"], 0, s_max),
                        jnp.clip(out["shared"], 0, s_max)]
        ibits = ident.view(jnp.int32)  # positive floats sort as ints
        valid = out["valid"]

        # ---- 1-way: best (ibits, sid, pos) per (gid, frag) — three
        # scatter-max passes resolve the lexicographic key exactly
        idx1 = jnp.where(valid, gid * Fg + frag_g, G * Fg)
        T1 = G * Fg + 1
        t_i = jnp.full(T1, -1, jnp.int32).at[idx1].max(
            jnp.where(valid, ibits, -1))
        w1 = valid & (ibits == t_i[idx1])
        t_s = jnp.full(T1, -1, jnp.int32).at[idx1].max(
            jnp.where(w1, sid, -1))
        w2 = w1 & (sid == t_s[idx1])
        t_p = jnp.full(T1, -1, jnp.int32).at[idx1].max(
            jnp.where(w2, pos, -1))
        keep1 = w2 & (pos == t_p[idx1])

        # ---- 2-way: per-shard position-bin running-best tables, merged
        # across q with pmax (replaces all_gather + lexsort)
        bs = sq(ia["bin_start"])
        B_cap = sq(ia["sid_of_bin"]).shape[0]
        bin_id = bs[jnp.clip(sid, 0, bs.shape[0] - 2)] \
            + pos // (frag_len - 20)
        bin_c = jnp.clip(bin_id, 0, B_cap - 1)
        idx2 = jnp.where(keep1, bin_c, B_cap)
        tb_i = jnp.full(B_cap + 1, -1, jnp.int32).at[idx2].max(
            jnp.where(keep1, ibits, -1))[:B_cap]
        tb_i = jax.lax.pmax(tb_i, "q")
        w3 = keep1 & (ibits == tb_i[bin_c])
        tb_q = jnp.full(B_cap + 1, -1, jnp.int32).at[idx2].max(
            jnp.where(w3, frag_g, -1))[:B_cap]
        tb_q = jax.lax.pmax(tb_q, "q")
        w4 = w3 & (frag_g == tb_q[bin_c])
        tb_p = jnp.full(B_cap + 1, -1, jnp.int32).at[idx2].max(
            jnp.where(w4, pos, -1))[:B_cap]
        tb_p = jax.lax.pmax(tb_p, "q")

        # ---- survivors in bin (== 2-way sort) order
        occupied = tb_i >= 0
        n = occupied.sum().astype(jnp.int32)
        biota = jnp.arange(B_cap, dtype=jnp.int32)
        from fastani_tpu.ops import pallas_compact

        if pallas_compact.use_pallas_compact(True, B_cap):
            ib_c, q_c, p_c, bin_o = (a[0, :rows_cap]
                                     for a in pallas_compact.compact_rows(
                occupied.reshape(1, -1),
                [(tb_i.reshape(1, -1), 0), (tb_q.reshape(1, -1), big),
                 (tb_p.reshape(1, -1), 0), (biota.reshape(1, -1), 0)]))
        else:
            order = jnp.argsort(jnp.where(occupied, 0, 1).astype(jnp.int32),
                                stable=True)[:rows_cap]
            bin_o = order
            ib_c = jnp.where(occupied[order], tb_i[order], 0)
            q_c = jnp.where(occupied[order], tb_q[order], big)
            p_c = jnp.where(occupied[order], tb_p[order], 0)
        live = jnp.arange(rows_cap, dtype=jnp.int32) < n
        sid_c = jnp.where(live, sq(ia["sid_of_bin"])[bin_o], big)
        gid_c = jnp.where(live, sq(ia["gid_of_bin"])[bin_o], big)
        ib_c = jnp.where(live, ib_c, 0)
        p_c = jnp.where(live, p_c, 0)
        q_c = jnp.where(live, q_c, big)
        return (gid_c[None, :], ib_c[None, :], sid_c[None, :],
                p_c[None, :], q_c[None, :], n[None])

    idx_specs = {name: P("r", None) for name in (
        "occ_hash", "occ_sid", "occ_wpos", "mi_hash", "mi_sid", "mi_wpos",
        "occ_packed", "mi_packed", "occ_lut", "mi_lut", "mi_prev", "mi_nxt",
        "seq_start", "genome_of_seq", "bin_start", "sid_of_bin",
        "gid_of_bin")}
    idx_specs["n_occ"] = P("r")
    idx_specs["freq_threshold"] = P("r")
    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("q", None, None), idx_specs, P(), P(), P()),
        out_specs=tuple([P("r", None)] * 5) + (P("r"),),
        check_vma=False,
    )
    return jax.jit(fn)


def make_fused_mesh_stream_step(cfg: jitmap.MapperConfig, mesh: Mesh,
                                K: int, fin_cap: int, n_slots: int,
                                n_qg: int, G: int, frag_len: int,
                                B_local: int, packed_frags: bool = False):
    """ZERO-FETCH fused stream step over the (r, q) mesh — the multi-chip
    port of the single-device fused design (models/jitmap.
    fused_stream_fin_fn): ONE jitted program maps K fragment sub-batches
    per device against its r-shard, folds each into a device-local
    slot/bin table (exact per-batch 1-way dedupe + 2-way scatter-max,
    device_cgi.update_tab), and closes finished query genomes IN-SCAN —
    merging the per-bin running max across the q axis with lax.pmax
    before occupancy is counted (device_cgi.finalize_rows(q_axis="q")),
    so the (Gq, G_local) accumulators stay replicated along q and the
    whole run needs ONE readout.  This replaces the per-query dispatch +
    host gather of the rows step for throughput runs (the reference's
    parallel scale story: omp shard loop core_genome_identity.cpp:55-121
    + splitDatabase.sh multi-node).

    Global shapes: frags_k (K, n_q, B_local, L) sharded P(None, "q");
    qno/qsid/rv_k (K, n_q, B_local); fin_k (K, fin_cap) replicated;
    tab (n_r, n_q, n_slots, B_cap) and acc_c/acc_s (n_r, n_q, Gq, G)
    sharded P("r", "q") and donated.  Returns
    (tab', acc_c', acc_s', counts_k (n_r, n_q, K, 10),
    fb_k (n_r, n_q, K, B_local)).
    """
    packed_mode = cfg.wpos_bits is not None

    def local_step(frags_k, qno_k, qsid_k, rv_k, fin_k, tab, acc_c, acc_s,
                   ia, min_hits, gate, ident_lut):
        from fastani_tpu.models import device_cgi

        sq = lambda a: a.reshape(a.shape[1:])      # drop r block axis
        tab = tab.reshape(tab.shape[2:])           # (n_slots, B_cap)
        acc_c = acc_c.reshape(acc_c.shape[2:])     # (n_qg, G)
        acc_s = acc_s.reshape(acc_s.shape[2:])
        sqq = lambda a: a.reshape((a.shape[0],) + a.shape[2:])  # drop q
        frags_k = sqq(frags_k)                     # (K, B_local, L)
        qno_k, qsid_k, rv_k = sqq(qno_k), sqq(qsid_k), sqq(rv_k)
        gos1 = sq(ia["genome_of_seq"])
        bs = sq(ia["bin_start"])
        gid_of_bin = sq(ia["gid_of_bin"])
        no_excl = jnp.zeros(B_local, bool)

        def body(carry, xs):
            tab, acc_c, acc_s = carry
            frags, qno_row, qsid_row, rv, fin = xs
            if packed_frags:
                from fastani_tpu.ops import hashing as _h

                frags = _h.unpack2_jax(frags)
            tab, acc_c, acc_s = device_cgi.finalize_rows(
                tab, acc_c, acc_s, fin, gid_of_bin, n_slots, n_qg, G,
                q_axis="q")
            out = jitmap.map_step_packed(
                cfg, frags, sq(ia["occ_hash"]), sq(ia["occ_sid"]),
                sq(ia["occ_wpos"]), sq(ia["mi_hash"]), sq(ia["mi_sid"]),
                sq(ia["mi_wpos"]), sq(ia["seq_start"]), min_hits, gate,
                n_occ=sq(ia["n_occ"]),
                occ_packed=sq(ia["occ_packed"]) if packed_mode else None,
                mi_packed=sq(ia["mi_packed"]) if packed_mode else None,
                mi_prev=sq(ia["mi_prev"]), mi_nxt=sq(ia["mi_nxt"]),
                occ_lut=sq(ia["occ_lut"]) if packed_mode else None,
                mi_lut=sq(ia["mi_lut"]) if packed_mode else None,
                qno_row=qno_row, qsid_row=qsid_row, row_valid=rv,
                freq_threshold=sq(ia["freq_threshold"]))
            tab = device_cgi.update_tab(
                tab, out["packed"], out["counts"], no_excl, gos1, bs,
                ident_lut, frag_len, n_slots, G, B_local)
            return (tab, acc_c, acc_s), (out["counts"],
                                         out["fallback_mask"])

        (tab, acc_c, acc_s), (counts_k, fb_k) = jax.lax.scan(
            body, (tab, acc_c, acc_s),
            (frags_k, qno_k, qsid_k, rv_k, fin_k))
        add2 = lambda a: a[None, None]
        return (add2(tab), add2(acc_c), add2(acc_s), add2(counts_k),
                add2(fb_k))

    idx_specs = {name: P("r", None) for name in (
        "occ_hash", "occ_sid", "occ_wpos", "mi_hash", "mi_sid", "mi_wpos",
        "occ_packed", "mi_packed", "occ_lut", "mi_lut", "mi_prev",
        "mi_nxt", "seq_start", "genome_of_seq", "bin_start", "sid_of_bin",
        "gid_of_bin")}
    idx_specs["n_occ"] = P("r")
    idx_specs["freq_threshold"] = P("r")
    dev4 = P("r", "q", None, None)
    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(None, "q", None, None), P(None, "q", None),
                  P(None, "q", None), P(None, "q", None), P(),
                  dev4, dev4, dev4, idx_specs, P(), P(), P()),
        out_specs=(dev4, dev4, dev4, dev4, dev4),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(5, 6, 7))


def make_mesh_finalize_step(mesh: Mesh, fin_cap: int, n_slots: int,
                            n_qg: int, G: int):
    """Post-scan tail flush on the mesh: finalize the listed query
    genomes' slots (q-axis pmax merge) in one dispatch."""

    def local_fin(fin, tab, acc_c, acc_s, gid_of_bin):
        from fastani_tpu.models import device_cgi

        tab2 = tab.reshape(tab.shape[2:])
        acc_c2 = acc_c.reshape(acc_c.shape[2:])
        acc_s2 = acc_s.reshape(acc_s.shape[2:])
        gb = gid_of_bin.reshape(gid_of_bin.shape[1:])
        tab2, acc_c2, acc_s2 = device_cgi.finalize_rows(
            tab2, acc_c2, acc_s2, fin, gb, n_slots, n_qg, G, q_axis="q")
        add2 = lambda a: a[None, None]
        return add2(tab2), add2(acc_c2), add2(acc_s2)

    dev4 = P("r", "q", None, None)
    fn = jax.shard_map(
        local_fin, mesh=mesh,
        in_specs=(P(), dev4, dev4, dev4, P("r", None)),
        out_specs=(dev4, dev4, dev4),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1, 2, 3))


def make_sharded_step(cfg: jitmap.MapperConfig, mesh: Mesh, s_max: int, k: int,
                      perc_identity: float, frag_len: int, max_local_genomes: int):
    """Build the jitted sharded many-to-many step for ONE query genome.

    step(frags, sharded index arrays, luts) ->
        (sum_ident (n_r, G), count (n_r, G)) per-shard-local-genome tallies,
    where the q-axis contribution is psum-merged on device.  The on-device
    reciprocal dedupe (1-way per (ref genome, fragment); 2-way per
    (ref contig, position bin)) uses integer sort keys and the closed-form
    identity LUT, replicating the selection laws of computeCoreIdentity.hpp
    :212-255 exactly; only the float *summation order* differs from the
    host fold.
    """
    G = max_local_genomes

    def local_step(frags, occ_hash, occ_sid, occ_wpos, mi_hash, mi_sid,
                   mi_wpos, seq_start, gos, n_occ, min_hits, gate, ident2d):
        # block-local arrays: leading r/q axes of size 1 from shard_map
        frags = frags.reshape(frags.shape[-2:])
        sq = lambda a: a.reshape(a.shape[-1:])
        out = jitmap.map_step(cfg, frags, sq(occ_hash), sq(occ_sid),
                              sq(occ_wpos), sq(mi_hash), sq(mi_sid),
                              sq(mi_wpos), sq(seq_start), min_hits, gate,
                              n_occ=sq(n_occ)[0])
        gos1 = sq(gos)
        frag_ids = out["frag"]
        # global fragment id = local row + q_block_offset
        qidx = jax.lax.axis_index("q")
        frag_g = frag_ids + qidx * frags.shape[0]
        sid = out["sid"]
        gid = gos1[jnp.clip(sid, 0, gos1.shape[0] - 1)]
        ident = ident2d[jnp.clip(out["sketch"], 0, s_max),
                        jnp.clip(out["shared"], 0, s_max)]
        ibits = ident.view(jnp.int32)  # positive floats sort as ints
        valid = out["valid"]
        U = sid.shape[0]

        # ---- 1-way: keep best per (gid, frag): sort asc by
        # (gid, frag, ident, sid, pos), keep last of each group
        big = jnp.int32(2**30)
        key_g = jnp.where(valid, gid, big)
        key_f = jnp.where(valid, frag_g, big)
        o1 = jnp.lexsort((out["mean_pos"], sid, ibits, key_f, key_g))
        g1, f1 = key_g[o1], key_f[o1]
        last1 = jnp.concatenate([(g1[:-1] != g1[1:]) | (f1[:-1] != f1[1:]),
                                 jnp.ones((1,), bool)])
        keep1 = last1 & (g1 < big)

        # ---- 2-way needs all 1-way survivors across the q axis
        sid1 = sid[o1]
        pos1 = out["mean_pos"][o1]
        ib1 = ibits[o1]
        gid1 = jnp.where(keep1, g1, big)
        bin1 = jnp.where(keep1, pos1 // (frag_len - 20), big)
        sid1m = jnp.where(keep1, sid1, big)
        allg = lambda x: jax.lax.all_gather(x, "q", tiled=True)
        sid_a, bin_a, ib_a, gid_a, f_a = map(allg, (sid1m, bin1, ib1, gid1, f1))
        o2 = jnp.lexsort((f_a, ib_a, bin_a, sid_a))
        s2, b2 = sid_a[o2], bin_a[o2]
        last2 = jnp.concatenate([(s2[:-1] != s2[1:]) | (b2[:-1] != b2[1:]),
                                 jnp.ones((1,), bool)])
        keep2 = last2 & (s2 < big)
        gid2 = gid_a[o2]
        id2 = ib_a[o2].view(jnp.float32)

        seg = jnp.where(keep2, gid2, G)
        sum_ident = jax.ops.segment_sum(jnp.where(keep2, id2, 0.0), seg, num_segments=G + 1)[:G]
        count = jax.ops.segment_sum(keep2.astype(jnp.int32), seg, num_segments=G + 1)[:G]
        # all devices along q hold identical gathered data; divide the psum
        nq = jax.lax.psum(1, "q")
        sum_ident = jax.lax.psum(sum_ident, "q") / nq
        count = jax.lax.psum(count, "q") // nq
        return sum_ident[None, :], count[None, :]

    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("q", None, None),            # frags stacked (n_q, F_local, L)
                  P("r", None), P("r", None), P("r", None),
                  P("r", None), P("r", None), P("r", None),
                  P("r", None), P("r", None), P("r"),
                  P(), P(), P()),
        out_specs=(P("r", None), P("r", None)),
        check_vma=False,
    )
    return jax.jit(fn)
