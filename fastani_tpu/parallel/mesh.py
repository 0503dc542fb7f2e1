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
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastani_tpu.models import jitmap, mapping
from fastani_tpu.ops import stats


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


@dataclasses.dataclass
class ShardedIndex:
    """Round-robin reference shards stacked into equal-size device arrays."""
    n_r: int
    occ_hash: np.ndarray   # (n_r, M) uint32
    occ_sid: np.ndarray    # (n_r, M) int32
    occ_wpos: np.ndarray   # (n_r, M) int32
    mi_hash: np.ndarray
    mi_sid: np.ndarray
    mi_wpos: np.ndarray
    seq_start: np.ndarray  # (n_r, S+1) int64
    genome_of_seq: np.ndarray  # (n_r, S) int32 — local seqid -> local genome no
    n_genomes: np.ndarray      # (n_r,) genomes per shard
    n_occ: np.ndarray          # (n_r,) true (unpadded) entry count per shard
    freq_threshold: int
    max_local_genomes: int
    # map (shard, local genome) -> global genome id: global = local * n_r + shard
    # (correctRefGenomeIds law, computeCoreIdentity.hpp:480-487)


def build_sharded_index(params, ref_files: Sequence[str], n_r: int) -> ShardedIndex:
    from fastani_tpu.index.sketch import ReferenceIndex

    shards = []
    for r in range(n_r):
        files = [f for j, f in enumerate(ref_files) if j % n_r == r]
        shards.append(ReferenceIndex.build(params, files or ref_files[:0]))
    M = max(ix.num_entries for ix in shards)
    S = max(len(ix.metadata) for ix in shards)
    nG = max(max(len([f for j, f in enumerate(ref_files) if j % n_r == r]), 1)
             for r in range(n_r))

    def padded(att, fill, dtype, width):
        out = np.full((n_r, width), fill, dtype)
        for r, ix in enumerate(shards):
            a = getattr(ix, att)
            out[r, : len(a)] = a
        return out

    seq_start = np.zeros((n_r, S + 1), np.int64)
    gos = np.zeros((n_r, S), np.int32)
    n_gen = np.zeros(n_r, np.int32)
    for r, ix in enumerate(shards):
        ss = ix.seq_start
        seq_start[r, : len(ss)] = ss
        seq_start[r, len(ss):] = ss[-1] if len(ss) else 0
        g = ix.genome_of_seq()
        gos[r, : len(g)] = g
        n_gen[r] = len(ix.sequences_by_file)
    return ShardedIndex(
        n_r=n_r,
        occ_hash=padded("occ_hash", 0xFFFFFFFF, np.uint32, M),
        occ_sid=padded("occ_seqid", np.iinfo(np.int32).max, np.int32, M),
        occ_wpos=padded("occ_wpos", np.iinfo(np.int32).max, np.int32, M),
        mi_hash=padded("mi_hash", 0xFFFFFFFF, np.uint32, M),
        mi_sid=padded("mi_seqid", np.iinfo(np.int32).max, np.int32, M),
        mi_wpos=padded("mi_wpos", np.iinfo(np.int32).max, np.int32, M),
        seq_start=seq_start,
        genome_of_seq=gos,
        n_genomes=n_gen,
        n_occ=np.asarray([ix.num_entries for ix in shards], np.int32),
        freq_threshold=min(ix.freq_threshold for ix in shards),
        max_local_genomes=nG,
    )


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

    Returns (gid (n_r, rows_cap) i32 local genome per row (big=pad),
             ibits (n_r, rows_cap) i32 identity float bits,
             n_rows (n_r,) i32 survivor count; > rows_cap = overflow).
    """
    G = max_local_genomes

    def local_step(frags, occ_hash, occ_sid, occ_wpos, mi_hash, mi_sid,
                   mi_wpos, seq_start, gos, n_occ, min_hits, gate, ident2d):
        keep2, gid2, ib2 = _map_and_dedupe(
            cfg, s_max, frag_len, frags, occ_hash, occ_sid, occ_wpos,
            mi_hash, mi_sid, mi_wpos, seq_start, gos, n_occ, min_hits,
            gate, ident2d)
        n = keep2.sum().astype(jnp.int32)
        o3 = jnp.argsort(jnp.where(keep2, 0, 1).astype(jnp.int32),
                         stable=True)[:rows_cap]
        big = jnp.int32(2**30)
        gid_c = jnp.where(keep2[o3], gid2[o3], big)
        ib_c = jnp.where(keep2[o3], ib2[o3], 0)
        return gid_c[None, :], ib_c[None, :], n[None]

    fn = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("q", None, None),
                  P("r", None), P("r", None), P("r", None),
                  P("r", None), P("r", None), P("r", None),
                  P("r", None), P("r", None), P("r"),
                  P(), P(), P()),
        out_specs=(P("r", None), P("r", None), P("r")),
        check_vma=False,
    )
    return jax.jit(fn)


def _map_and_dedupe(cfg, s_max, frag_len, frags, occ_hash, occ_sid, occ_wpos,
                    mi_hash, mi_sid, mi_wpos, seq_start, gos, n_occ,
                    min_hits, gate, ident2d):
    """Shared shard-local body: map fragments, 1-way dedupe locally, gather
    1-way survivors across q, 2-way dedupe on the gathered set.  Returns
    (keep2, gid2, ibits2) over the q-gathered, 2-way-sorted rows (identical
    on every q device)."""
    frags = frags.reshape(frags.shape[-2:])
    sq = lambda a: a.reshape(a.shape[-1:])
    out = jitmap.map_step(cfg, frags, sq(occ_hash), sq(occ_sid),
                          sq(occ_wpos), sq(mi_hash), sq(mi_sid),
                          sq(mi_wpos), sq(seq_start), min_hits, gate,
                          n_occ=sq(n_occ)[0])
    gos1 = sq(gos)
    frag_ids = out["frag"]
    qidx = jax.lax.axis_index("q")
    frag_g = frag_ids + qidx * frags.shape[0]
    sid = out["sid"]
    gid = gos1[jnp.clip(sid, 0, gos1.shape[0] - 1)]
    ident = ident2d[jnp.clip(out["sketch"], 0, s_max),
                    jnp.clip(out["shared"], 0, s_max)]
    ibits = ident.view(jnp.int32)  # positive floats sort as ints
    valid = out["valid"]

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
    f1m = jnp.where(keep1, f1, big)
    allg = lambda x: jax.lax.all_gather(x, "q", tiled=True)
    sid_a, bin_a, ib_a, gid_a, f_a = map(allg, (sid1m, bin1, ib1, gid1, f1m))
    o2 = jnp.lexsort((f_a, ib_a, bin_a, sid_a))
    s2, b2 = sid_a[o2], bin_a[o2]
    last2 = jnp.concatenate([(s2[:-1] != s2[1:]) | (b2[:-1] != b2[1:]),
                             jnp.ones((1,), bool)])
    keep2 = last2 & (s2 < big)
    return keep2, gid_a[o2], ib_a[o2]


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
