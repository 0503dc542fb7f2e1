"""Sharded many-to-many step on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from fastani_tpu.models import glue, jitmap
from fastani_tpu.parallel import mesh as pmesh
from tests import synth
from tests.test_mapping_parity import make_params


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    wd = tmp_path_factory.mktemp("mesh")
    rng = np.random.default_rng(5)
    base = synth.random_genome(rng, 24_000)
    refs = []
    for i in range(4):
        g = synth.mutate_genome(rng, base, 0.01 + 0.02 * i)
        path = str(wd / f"ref{i}.fa")
        synth.write_fasta(path, [(f"r{i}", g)])
        refs.append(path)
    query = synth.mutate_genome(rng, base, 0.02)
    params = make_params(frag_len=1000)
    params.frag_batch = 8
    params.sketch_cap = 256
    params.hits_cap = 1024
    params.cand_cap = 8
    params.l2_entry_cap = 256
    return params, refs, query


def test_sharded_step_matches_host(world):
    params, refs, query = world
    n_r, n_q = 2, 4
    assert len(jax.devices()) >= 8
    m = pmesh.make_mesh(n_r, n_q)
    sidx = pmesh.build_sharded_index(params, refs, n_r)

    F_total = len(query) // params.frag_len
    frags = query[: F_total * params.frag_len].reshape(F_total, params.frag_len)
    # pad fragments to n_q equal blocks
    F_local = -(-F_total // n_q)
    padded = np.zeros((n_q * F_local, params.frag_len), np.uint8)
    padded[:F_total] = frags
    stacked = padded.reshape(n_q, F_local, params.frag_len)

    cfg = jitmap.MapperConfig.from_params(params, sidx.freq_threshold,
                                          unit_factor=8, unit_chunk=8)
    cfg = cfg.__class__(**{**cfg.__dict__, "unit_cap": F_local * 8, "unit_chunk": 8})
    import jax.numpy as jnp

    from fastani_tpu.ops import stats

    s_max = params.sketch_cap
    step = pmesh.make_sharded_step(cfg, m, s_max, params.kmer_size,
                                   params.percentage_identity, params.frag_len,
                                   sidx.max_local_genomes)
    min_hits = jnp.asarray(stats.min_hits_lut(params.kmer_size,
                                              params.percentage_identity, s_max))
    gate = jnp.asarray(jitmap.gate_lut_np(params.kmer_size,
                                          params.percentage_identity, s_max))
    ident2d = jnp.asarray(pmesh.point_identity_lut(s_max, params.kmer_size))
    sum_ident, count = step(jnp.asarray(stacked), jnp.asarray(sidx.occ_hash),
                            jnp.asarray(sidx.occ_sid), jnp.asarray(sidx.occ_wpos),
                            jnp.asarray(sidx.mi_hash), jnp.asarray(sidx.mi_sid),
                            jnp.asarray(sidx.mi_wpos), jnp.asarray(sidx.seq_start),
                            jnp.asarray(sidx.genome_of_seq), jnp.asarray(sidx.n_occ), min_hits, gate, ident2d)
    sum_ident = np.asarray(sum_ident)   # (n_r, G)
    count = np.asarray(count)

    # host truth: full pipeline per ref file
    from fastani_tpu.models import ani
    from fastani_tpu.index.sketch import ReferenceIndex

    got = {}
    for r in range(2):
        for gl, g_global in enumerate([j for j in range(len(refs)) if j % 2 == r]):
            if count[r, gl] > 0:
                got[g_global] = (count[r, gl], sum_ident[r, gl] / count[r, gl])

    params_full = params
    params_full.ref_sequences = refs
    index = ReferenceIndex.build(params_full, refs)
    batch = glue.map_fragment_batch(np, frags, index, params_full, generous=True)
    maps = glue.gate_and_format(batch, np.arange(F_total), params_full)
    rows, _ = ani.compute_cgi(maps, index.genome_of_seq(), params_full.frag_len,
                              0, F_total)
    want = {r.ref_genome: (r.count_seq, float(r.identity)) for r in rows}

    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0], f"count mismatch for genome {g}"
        assert abs(got[g][1] - want[g][1]) < 1e-3, f"ANI mismatch for genome {g}"
