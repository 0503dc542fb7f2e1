"""ANI aggregation: fragment mappings -> per-genome-pair identity.

Host-side segment-reduction replication of cgi::computeCGI and the output
writers (reference: src/cgi/include/computeCoreIdentity.hpp:166-298,
:307-448, :103-153).  All identity arithmetic reproduces the reference's
float32 accumulation order exactly (the per-pair mean is a sequential
float32 left fold over the 2-way-sorted mappings).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from fastani_tpu.utils.refmodel import Mapping


@dataclasses.dataclass
class CGIResult:
    qry_genome: int       # index into params.query_sequences
    ref_genome: int       # index into params.ref_sequences
    count_seq: int
    total_query_fragments: int
    identity: np.float32


@dataclasses.dataclass
class VisualRow:
    """One reciprocal mapping destined for the .visual file."""
    genome_id: int
    ref_seq_id: int
    query_seq_id: int
    ref_start: int
    query_start: int
    identity: np.float32


def results_from_matrices(counts: np.ndarray, sums: np.ndarray,
                          total_fragments) -> List[CGIResult]:
    """(Gq, Gr) count/identity-sum matrices -> CGIResult rows (the device
    CGI fast-path readout form; computeCoreIdentity.hpp:267-297's
    per-pair mean).  total_fragments: callable(qno) or indexable."""
    rows: List[CGIResult] = []
    Gq, Gr = counts.shape
    for q in range(Gq):
        tq = total_fragments(q) if callable(total_fragments) \
            else total_fragments[q]
        for g in range(Gr):
            if counts[q, g] > 0:
                rows.append(CGIResult(
                    q, g, int(counts[q, g]), tq,
                    np.float32(sums[q, g] / np.float32(counts[q, g]))))
    return rows


def compute_cgi(
    mappings: List[Mapping],
    genome_of_seq: np.ndarray,
    frag_len: int,
    query_file_no: int,
    total_query_fragments: int,
) -> Tuple[List[CGIResult], List[VisualRow]]:
    """computeCoreIdentity.hpp:166-298 over Mapping records (host path)."""
    if not mappings:
        return [], []
    return compute_cgi_arrays(
        np.array([m.ref_seq_id for m in mappings], np.int64),
        np.array([m.query_seq_id for m in mappings], np.int64),
        np.array([m.ref_start_pos for m in mappings], np.int64),
        np.array([m.nuc_identity for m in mappings], np.float32),
        genome_of_seq, frag_len, query_file_no, total_query_fragments)


def compute_cgi_arrays(
    ref_sid: np.ndarray,
    qsid: np.ndarray,
    ref_start: np.ndarray,
    ident: np.ndarray,
    genome_of_seq: np.ndarray,
    frag_len: int,
    query_file_no: int,
    total_query_fragments: int,
    want_visual: bool = True,
) -> Tuple[List[CGIResult], List[VisualRow]]:
    """computeCoreIdentity.hpp:166-298 as vectorized segment reductions.

    Returns per-ref-genome CGI rows plus the 2-way (reciprocal-best)
    mappings in the exact order the reference emits them to the .visual
    file (empty when want_visual=False).
    """
    if len(ref_sid) == 0:
        return [], []
    ref_sid = np.asarray(ref_sid, np.int64)
    qsid = np.asarray(qsid, np.int64)
    ref_start = np.asarray(ref_start, np.int64)
    ident = np.asarray(ident, np.float32)
    qstart = np.zeros(len(ref_sid), np.int64)  # queryStartPos is always 0
    gid = genome_of_seq[ref_sid]
    pos_bin = ref_start // (frag_len - 20)  # computeCoreIdentity.hpp:194

    # 1-way: best per (genomeId, querySeqId); ascending sort + keep-last
    # replicates the overwrite loop at :212-232 with the deterministic
    # tie-breakers of cmp_query_bucket (cgid_types.hpp:31-39).
    o1 = np.lexsort((ref_start, ref_sid, ident, qsid, gid))
    g1, q1 = gid[o1], qsid[o1]
    is_last1 = np.ones(len(o1), bool)
    is_last1[:-1] = (g1[:-1] != g1[1:]) | (q1[:-1] != q1[1:])
    k1 = o1[is_last1]

    # 2-way: best per (refSequenceId, mapRefPosBin) among the 1-way rows
    # (:237-255).  cmp_refbin_bucket has no tie-breaker beyond identity;
    # we add (querySeqId, queryStartPos) for determinism.
    o2 = k1[np.lexsort((qstart[k1], qsid[k1], ident[k1], pos_bin[k1], ref_sid[k1]))]
    r2, b2 = ref_sid[o2], pos_bin[o2]
    is_last2 = np.ones(len(o2), bool)
    is_last2[:-1] = (r2[:-1] != r2[1:]) | (b2[:-1] != b2[1:])
    k2 = o2[is_last2]

    visual = [
        VisualRow(int(gid[i]), int(ref_sid[i]), int(qsid[i]),
                  int(ref_start[i]), int(qstart[i]), ident[i])
        for i in k2
    ] if want_visual else []

    # per-genome mean identity: sequential float32 fold in 2-way order
    # (:267-297); k2 is sorted by refSeqId so genome ids are contiguous.
    out: List[CGIResult] = []
    g2 = gid[k2]
    id2 = ident[k2]
    # group boundaries vectorized; the fold itself must stay a sequential
    # float32 accumulation to match the reference bit-for-bit
    bounds = np.concatenate([[0], np.nonzero(g2[1:] != g2[:-1])[0] + 1,
                             [len(k2)]])
    for bi in range(len(bounds) - 1):
        start, end = int(bounds[bi]), int(bounds[bi + 1])
        acc = np.float32(0.0)
        for v in id2[start:end]:
            acc = np.float32(acc + v)
        count = end - start
        out.append(CGIResult(
            qry_genome=query_file_no,
            ref_genome=int(g2[start]),
            count_seq=count,
            total_query_fragments=total_query_fragments,
            identity=np.float32(acc / np.float32(count)),
        ))
    return out, visual
