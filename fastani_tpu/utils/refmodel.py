"""Scalar oracle of the reference mapping engine.

A literal Python re-statement of the reference's L1/L2 control flow
(reference: src/map/include/computeMap.hpp:204-497, slidingMap.hpp,
MIIteratorL2.hpp:74-96) used as the test oracle for the dense TPU kernels
and as the exact fallback path for pathological inputs that overflow the
kernels' capacity caps.

The SlideMapper's incremental counter provably equals the closed form
    S(W) = |{h : h in QH and h in RH(W) and rank_of_h_in(QH ∪ RH(W)) < s}|
(QH = the query's s unique sketch hashes; RH(W) = the set of reference
hashes in super-window W), so the model computes that closed form inside
the exact event-driven window walk of MIIteratorL2.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from fastani_tpu.ops import hashing, minimizer, stats


@dataclasses.dataclass
class L1Candidate:
    seq_id: int
    range_start: int
    range_end: int


@dataclasses.dataclass
class Mapping:
    query_seq_id: int
    ref_seq_id: int
    ref_start_pos: int
    nuc_identity: np.float32
    nuc_identity_upper: np.float32
    conserved: int
    sketch_size: int
    query_len: int


def fragment_sketch(frag: np.ndarray, k: int, w: int) -> np.ndarray:
    """Sorted unique minimizer hashes of a fragment (computeMap.hpp:260-274)."""
    h, _ = minimizer.winnow_model(frag, k, w)
    return np.unique(h)


def l1_candidates(
    q_hashes: np.ndarray,
    index,
    minimum_hits: int,
    frag_len: int,
) -> List[L1Candidate]:
    """L1 stage (computeMap.hpp:252-354) against a ReferenceIndex."""
    if minimum_hits < 1:
        minimum_hits = 1
    occ_hash = index.occ_hash
    hits_sid: List[int] = []
    hits_wp: List[int] = []
    for h in q_hashes:
        lo = np.searchsorted(occ_hash, h, side="left")
        hi = np.searchsorted(occ_hash, h, side="right")
        if hi > lo and (hi - lo) < index.freq_threshold:
            hits_sid.extend(index.occ_seqid[lo:hi].tolist())
            hits_wp.extend(index.occ_wpos[lo:hi].tolist())
    if not hits_sid:
        return []
    order = np.lexsort((hits_wp, hits_sid))
    sid = np.asarray(hits_sid)[order]
    wp = np.asarray(hits_wp)[order]
    n = len(sid)
    out: List[L1Candidate] = []
    for i in range(n):
        j = i + minimum_hits - 1
        if j >= n:
            break
        if sid[j] == sid[i] and wp[j] - wp[i] < frag_len:
            start = max(0, int(wp[j]) - frag_len + 1)
            end = int(wp[i])
            if out and out[-1].seq_id == sid[i] and out[-1].range_end >= start:
                out[-1].range_end = max(end, out[-1].range_end)
            else:
                out.append(L1Candidate(int(sid[i]), start, end))
    return out


def _search_index(index, seq_id: int, winpos: int) -> int:
    """lower_bound on (seqId, wpos) pairs (winSketch.hpp:259-270)."""
    lo = int(np.searchsorted(index.mi_seqid, seq_id, side="left"))
    hi = int(np.searchsorted(index.mi_seqid, seq_id, side="right"))
    return lo + int(np.searchsorted(index.mi_wpos[lo:hi], winpos, side="left"))


def _shared_sketch(q_hashes: np.ndarray, ref_hashes: np.ndarray, s: int) -> int:
    """Closed form of SlideMapper.sharedSketchElements."""
    union = np.union1d(q_hashes, np.unique(ref_hashes))
    bottom = set(union[:s].tolist())
    qset = set(q_hashes.tolist())
    rset = set(np.unique(ref_hashes).tolist())
    return len(bottom & qset & rset)


def l2_map(
    q_hashes: np.ndarray,
    index,
    cand: L1Candidate,
    frag_len: int,
    k: int,
    w: int,
) -> Tuple[int, int]:
    """L2 stage for one candidate (computeMap.hpp:418-497).

    Returns (shared_sketch_size, mean_optimal_pos).  Replicates the
    event-driven super-window walk of MIIteratorL2::next exactly, including
    loop bounds and first/last argmax position averaging.
    """
    s = len(q_hashes)
    C = frag_len - (w - 1) - (k - 1)  # countMinimizerWindows
    b = _search_index(index, cand.seq_id, cand.range_start)
    M = index.num_entries
    if b >= M:
        # reference would dereference end(); candidates always have an entry
        return 0, 0
    sw_pos = int(index.mi_wpos[b])
    e = _search_index(index, cand.seq_id, sw_pos + C)
    e_last = _search_index(index, cand.seq_id, cand.range_end + frag_len)

    best = 0
    begin_opt = None
    last_opt = None
    while e_last - e > 0:
        ref_hashes = index.mi_hash[b:e]
        shared = _shared_sketch(q_hashes, ref_hashes, s)
        if shared > best:
            best = shared
            begin_opt = int(index.mi_wpos[b])
            last_opt = begin_opt
        elif shared == best:
            last_opt = int(index.mi_wpos[b])
        # MIIteratorL2::next (MIIteratorL2.hpp:74-96)
        begin_pos = sw_pos
        last_pos = sw_pos + C - 1
        nb = int(index.mi_wpos[b + 1]) - begin_pos if b + 1 < M else 1 << 30
        ne = int(index.mi_wpos[e]) - last_pos if e < M else 1 << 30
        adv = min(nb, ne)
        sw_pos += adv
        if adv == nb:
            b += 1
        if adv == ne:
            e += 1
    if best == 0 or begin_opt is None:
        return best, 0  # reference reads uninitialized ints here; never reported
    return best, (begin_opt + last_opt) // 2


def map_fragment(
    frag: np.ndarray,
    index,
    params,
    query_seq_id: int,
) -> List[Mapping]:
    """Full per-fragment mapping (computeMap.hpp:204-240 + doL1 + doL2)."""
    k, w, l = params.kmer_size, params.window_size, params.frag_len
    q_hashes = fragment_sketch(frag, k, w)
    s = len(q_hashes)
    if s == 0:
        return []
    min_hits = stats.estimate_minimum_hits_relaxed(s, k, params.percentage_identity)
    cands = l1_candidates(q_hashes, index, min_hits, l)
    out: List[Mapping] = []
    for cand in cands:
        shared, mean_pos = l2_map(q_hashes, index, cand, l, k, w)
        lut_i, lut_u = stats.identity_lut(s, k)
        ident = lut_i[shared]
        upper = lut_u[shared]
        if upper >= params.percentage_identity:
            out.append(Mapping(query_seq_id, cand.seq_id, mean_pos, ident, upper, shared, s, l))
    return out
