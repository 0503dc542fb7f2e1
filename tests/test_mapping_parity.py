"""Oracle-parity tests: dense mapping kernels vs the scalar reference model."""

import numpy as np
import pytest

from fastani_tpu.config import Parameters
from fastani_tpu.index.sketch import ReferenceIndex
from fastani_tpu.models import glue, mapping
from fastani_tpu.utils import refmodel


def make_params(**kw):
    p = Parameters(**kw)
    p.window_size = kw.get("window_size", 24)
    return p.finalize()


def mutate(rng, seq, rate):
    """Point-mutate a sequence at the given rate."""
    seq = seq.copy()
    n_mut = int(len(seq) * rate)
    pos = rng.choice(len(seq), size=n_mut, replace=False)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq[pos] = bases[rng.integers(0, 4, n_mut)]
    return seq


def build_index_from_arrays(params, contigs):
    """Construct a ReferenceIndex from in-memory contig byte arrays."""
    from fastani_tpu.index import sketch as sk
    from fastani_tpu.ops import minimizer

    metadata = []
    hashes, seqids, wposs = [], [], []
    for i, c in enumerate(contigs):
        metadata.append(sk.ContigInfo(f"ctg{i}", len(c)))
        if len(c) >= max(params.window_size, params.kmer_size):
            h, wp = minimizer.winnow_sequence_np(c, params.kmer_size, params.window_size)
            if len(h):
                hashes.append(h)
                seqids.append(np.full(len(h), i, np.int32))
                wposs.append(wp)
    mi_hash = np.concatenate(hashes) if hashes else np.zeros(0, np.uint32)
    mi_seqid = np.concatenate(seqids) if seqids else np.zeros(0, np.int32)
    mi_wpos = np.concatenate(wposs) if wposs else np.zeros(0, np.int32)
    return sk.ReferenceIndex._finish(params, metadata,
                                     np.asarray([len(contigs)], np.int32),
                                     mi_hash, mi_seqid, mi_wpos)


@pytest.fixture(scope="module")
def small_world():
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref1 = bases[rng.integers(0, 4, 9000)]
    ref2 = bases[rng.integers(0, 4, 6000)]
    params = make_params(frag_len=1000)
    index = build_index_from_arrays(params, [ref1, ref2])
    # queries: mutated copies of reference slices + one random (unmappable)
    frags = np.stack([
        mutate(rng, ref1[1000:2000], 0.02),
        mutate(rng, ref1[4096:5096], 0.05),
        mutate(rng, ref2[2000:3000], 0.01),
        bases[rng.integers(0, 4, 1000)],
        mutate(rng, ref2[500:1500], 0.10),
    ])
    return params, index, frags


def test_sketch_parity(small_world):
    params, index, frags = small_world
    qh, s, over = mapping.sketch_fragments(np, frags, params.kmer_size,
                                           params.window_size, params.sketch_cap)
    for i, frag in enumerate(frags):
        want = refmodel.fragment_sketch(frag, params.kmer_size, params.window_size)
        assert s[i] == len(want)
        np.testing.assert_array_equal(qh[i, : s[i]], want)
        assert not over[i]


def test_l1_parity(small_world):
    params, index, frags = small_world
    from fastani_tpu.ops import stats

    k, w, l = params.kmer_size, params.window_size, params.frag_len
    qh, s, _ = mapping.sketch_fragments(np, frags, k, w, params.sketch_cap)
    lut = np.asarray(stats.min_hits_lut(k, params.percentage_identity, int(s.max())))
    l1 = mapping.l1_candidates(np, qh, s, index.occ_hash, index.occ_seqid,
                               index.occ_wpos, lut, index.freq_threshold,
                               l, params.hits_cap, params.cand_cap)
    for i, frag in enumerate(frags):
        q = refmodel.fragment_sketch(frag, k, w)
        mh = stats.estimate_minimum_hits_relaxed(len(q), k, params.percentage_identity)
        want = refmodel.l1_candidates(q, index, mh, l)
        got_n = int(l1.valid[i].sum())
        assert got_n == len(want), f"frag {i}: {got_n} != {len(want)}"
        for g in range(got_n):
            assert l1.sid[i, g] == want[g].seq_id
            assert l1.start[i, g] == want[g].range_start
            assert l1.end[i, g] == want[g].range_end


def test_l2_parity(small_world):
    params, index, frags = small_world
    from fastani_tpu.ops import stats

    k, w, l = params.kmer_size, params.window_size, params.frag_len
    qh, s, _ = mapping.sketch_fragments(np, frags, k, w, params.sketch_cap)
    lut = np.asarray(stats.min_hits_lut(k, params.percentage_identity, int(s.max())))
    l1 = mapping.l1_candidates(np, qh, s, index.occ_hash, index.occ_seqid,
                               index.occ_wpos, lut, index.freq_threshold,
                               l, params.hits_cap, params.cand_cap)
    frag_ids, cand_ids = np.nonzero(np.asarray(l1.valid))
    u_frag = frag_ids.astype(np.int32)
    u_sid = np.asarray(l1.sid)[frag_ids, cand_ids]
    u_start = np.asarray(l1.start)[frag_ids, cand_ids]
    u_end = np.asarray(l1.end)[frag_ids, cand_ids]
    l2 = mapping.l2_map_units(np, qh, s, u_frag, u_sid, u_start, u_end,
                              np.ones(len(u_frag), bool),
                              index.mi_hash, index.mi_seqid, index.mi_wpos,
                              index.seq_start, l, k, w, params.l2_entry_cap)
    assert not l2.overflow.any()
    for u in range(len(u_frag)):
        q = refmodel.fragment_sketch(frags[u_frag[u]], k, w)
        cand = refmodel.L1Candidate(int(u_sid[u]), int(u_start[u]), int(u_end[u]))
        want_shared, want_pos = refmodel.l2_map(q, index, cand, l, k, w)
        assert l2.shared[u] == want_shared, f"unit {u}"
        if want_shared > 0:
            assert l2.mean_pos[u] == want_pos, f"unit {u}"


def test_glue_end_to_end_vs_model(small_world):
    params, index, frags = small_world
    batch = glue.map_fragment_batch(np, frags, index, params, generous=True)
    got = glue.gate_and_format(batch, np.arange(len(frags)), params)
    want = []
    for i, frag in enumerate(frags):
        want.extend(refmodel.map_fragment(frag, index, params, i))
    key = lambda m: (m.query_seq_id, m.ref_seq_id, m.ref_start_pos, m.conserved)
    got_k = sorted(key(m) for m in got)
    want_k = sorted(key(m) for m in want)
    assert got_k == want_k
    assert len(got) > 0  # mappable fragments actually mapped
