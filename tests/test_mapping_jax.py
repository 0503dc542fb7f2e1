"""JAX-backend parity: the generic kernels must agree with NumPy exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastani_tpu.models import mapping
from fastani_tpu.ops import stats
from tests.test_mapping_parity import build_index_from_arrays, make_params, mutate


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref1 = bases[rng.integers(0, 4, 8000)]
    ref2 = bases[rng.integers(0, 4, 5000)]
    params = make_params(frag_len=1000)
    params.sketch_cap = 256
    params.hits_cap = 512
    params.cand_cap = 8
    params.l2_entry_cap = 256
    index = build_index_from_arrays(params, [ref1, ref2])
    frags = np.stack([
        mutate(rng, ref1[0:1000], 0.03),
        mutate(rng, ref2[1000:2000], 0.02),
        bases[rng.integers(0, 4, 1000)],
    ])
    return params, index, frags


def test_jax_matches_numpy(world):
    params, index, frags = world
    k, w, l = params.kmer_size, params.window_size, params.frag_len

    outs = {}
    for xp in (np, jnp):
        qh, s, over = mapping.sketch_fragments(xp, xp.asarray(frags), k, w,
                                               params.sketch_cap)
        lut = xp.asarray(stats.min_hits_lut(k, params.percentage_identity, 256))
        l1 = mapping.l1_candidates(xp, qh, s, xp.asarray(index.occ_hash),
                                   xp.asarray(index.occ_seqid),
                                   xp.asarray(index.occ_wpos), lut,
                                   index.freq_threshold, l,
                                   params.hits_cap, params.cand_cap)
        frag_ids, cand_ids = np.nonzero(np.asarray(l1.valid))
        l2 = mapping.l2_map_units(
            xp, qh, s, xp.asarray(frag_ids.astype(np.int32)),
            xp.asarray(np.asarray(l1.sid)[frag_ids, cand_ids]),
            xp.asarray(np.asarray(l1.start)[frag_ids, cand_ids]),
            xp.asarray(np.asarray(l1.end)[frag_ids, cand_ids]),
            xp.asarray(np.ones(len(frag_ids), bool)),
            xp.asarray(index.mi_hash), xp.asarray(index.mi_seqid),
            xp.asarray(index.mi_wpos), xp.asarray(index.seq_start),
            l, k, w, params.l2_entry_cap)
        outs[xp.__name__] = dict(
            qh=np.asarray(qh), s=np.asarray(s),
            sid=np.asarray(l1.sid), start=np.asarray(l1.start),
            end=np.asarray(l1.end), valid=np.asarray(l1.valid),
            shared=np.asarray(l2.shared), pos=np.asarray(l2.mean_pos),
            l2valid=np.asarray(l2.valid),
        )
    a, b = outs["numpy"], outs["jax.numpy"]
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
