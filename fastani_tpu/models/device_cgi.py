"""Device-side CGI aggregation: mapping rows -> per-genome-pair tallies.

TPU-first fast path for cgi::computeCGI (reference:
src/cgi/include/computeCoreIdentity.hpp:166-298): the 1-way / 2-way
reciprocal dedupes run as lexsort + keep-last segment reductions ON DEVICE,
and only a (Gq, Gr) count/sum pair crosses the (slow) device->host link —
instead of every mapping row.

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
