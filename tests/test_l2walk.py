"""Event-walk L2 vs the (oracle-proven) NumPy closed form, bit-exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from fastani_tpu.models import l2walk, mapping
from fastani_tpu.ops import stats
from tests.test_mapping_parity import build_index_from_arrays, make_params, mutate


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(19)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref1 = bases[rng.integers(0, 4, 12000)]
    ref2 = bases[rng.integers(0, 4, 7000)]
    # a repeat-heavy contig to exercise duplicate-hash prev/nxt logic
    unit = bases[rng.integers(0, 4, 600)]
    ref3 = np.tile(unit, 10)
    params = make_params(frag_len=1000)
    params.sketch_cap = 256
    params.hits_cap = 1024
    params.cand_cap = 16
    params.l2_entry_cap = 256
    index = build_index_from_arrays(params, [ref1, ref2, ref3])
    frags = np.stack([
        mutate(rng, ref1[0:1000], 0.03),
        mutate(rng, ref1[5000:6000], 0.08),
        mutate(rng, ref2[1000:2000], 0.01),
        mutate(rng, ref3[600:1600], 0.02),       # repeat region
        np.concatenate([ref1[2000:2500], ref2[3000:3500]]),  # chimeric
        bases[rng.integers(0, 4, 1000)],
    ])
    return params, index, frags


def _units(params, index, frags):
    k, w, l = params.kmer_size, params.window_size, params.frag_len
    qh, s, _ = mapping.sketch_fragments(np, frags, k, w, params.sketch_cap)
    lut = np.asarray(stats.min_hits_lut(k, params.percentage_identity, 256))
    l1 = mapping.l1_candidates(np, qh, s, index.occ_hash, index.occ_seqid,
                               index.occ_wpos, lut, index.freq_threshold,
                               l, params.hits_cap, params.cand_cap)
    frag_ids, cand_ids = np.nonzero(np.asarray(l1.valid))
    u_frag = frag_ids.astype(np.int32)
    u_sid = np.asarray(l1.sid)[frag_ids, cand_ids]
    u_start = np.asarray(l1.start)[frag_ids, cand_ids]
    u_end = np.asarray(l1.end)[frag_ids, cand_ids]
    return qh, s, u_frag, u_sid, u_start, u_end


@pytest.mark.parametrize("backend", ["scan", "pallas"])
def test_walk_matches_closed_form(world, backend):
    params, index, frags = world
    k, w, l = params.kmer_size, params.window_size, params.frag_len
    qh, s, u_frag, u_sid, u_start, u_end = _units(params, index, frags)
    assert len(u_frag) > 4
    u_valid = np.ones(len(u_frag), bool)

    want = mapping.l2_map_units(np, qh, s, u_frag, u_sid, u_start, u_end,
                                u_valid, index.mi_hash, index.mi_seqid,
                                index.mi_wpos, index.seq_start,
                                l, k, w, params.l2_entry_cap)
    ev_args = (jnp.asarray(qh), jnp.asarray(s), jnp.asarray(u_frag),
               jnp.asarray(u_sid), jnp.asarray(u_start), jnp.asarray(u_end),
               jnp.asarray(u_valid), jnp.asarray(index.mi_hash),
               jnp.asarray(index.mi_seqid), jnp.asarray(index.mi_wpos))
    if backend == "scan":
        got = l2walk.l2_walk_units(*ev_args, l, k, w, params.l2_entry_cap,
                                   backend="scan")
    else:
        ev, (s_u, overflow, n_ev) = l2walk.build_events(
            *ev_args, l, k, w, params.l2_entry_cap)
        best, posf, posl = l2walk.walk_pallas(ev, s_u, n_ev, qh.shape[-1],
                                              interpret=True)
        got = mapping.L2Result(
            jnp.maximum(best, 0),
            jnp.where(jnp.asarray(u_valid) & (best > 0),
                      (posf + posl) // 2, 0),
            jnp.asarray(u_valid) & (best > 0), overflow)

    np.testing.assert_array_equal(np.asarray(got.overflow), want.overflow)
    assert np.asarray(want.overflow).any()  # the repeat unit must overflow
    # overflowed units are unspecified (production recomputes them on the
    # exact host model); everything else must match bit-for-bit
    ok = ~np.asarray(want.overflow)
    np.testing.assert_array_equal(np.asarray(got.shared)[ok], want.shared[ok])
    np.testing.assert_array_equal(np.asarray(got.valid)[ok], want.valid[ok])
    sel = np.asarray(want.valid) & ok
    np.testing.assert_array_equal(np.asarray(got.mean_pos)[sel],
                                  want.mean_pos[sel])


def test_walk_invalid_and_empty_units(world):
    params, index, frags = world
    k, w, l = params.kmer_size, params.window_size, params.frag_len
    qh, s, u_frag, u_sid, u_start, u_end = _units(params, index, frags)
    # mark half invalid, point one unit at a nonexistent contig range
    u_valid = np.ones(len(u_frag), bool)
    u_valid[::2] = False
    u_sid2 = u_sid.copy()
    u_sid2[-1] = 2_000_000
    got = l2walk.l2_walk_units(
        jnp.asarray(qh), jnp.asarray(s), jnp.asarray(u_frag),
        jnp.asarray(u_sid2), jnp.asarray(u_start), jnp.asarray(u_end),
        jnp.asarray(u_valid), jnp.asarray(index.mi_hash),
        jnp.asarray(index.mi_seqid), jnp.asarray(index.mi_wpos),
        l, k, w, params.l2_entry_cap, backend="scan")
    assert not np.asarray(got.valid)[::2].any()
    assert not np.asarray(got.valid)[-1]
