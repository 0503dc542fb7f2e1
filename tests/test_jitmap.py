"""Jitted device path vs the host (numpy, generous-caps) path."""

import numpy as np
import pytest

from fastani_tpu.models import glue, jitmap
from tests.test_mapping_parity import build_index_from_arrays, make_params, mutate


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref1 = bases[rng.integers(0, 4, 30_000)]
    ref2 = bases[rng.integers(0, 4, 20_000)]
    params = make_params(frag_len=1000)
    params.frag_batch = 16
    params.sketch_cap = 256
    params.hits_cap = 512
    params.cand_cap = 8
    params.l2_entry_cap = 256
    index = build_index_from_arrays(params, [ref1, ref2])
    frags = np.stack([
        mutate(rng, ref1[0:1000], 0.02),
        mutate(rng, ref1[5000:6000], 0.04),
        mutate(rng, ref2[3000:4000], 0.01),
        bases[rng.integers(0, 4, 1000)],
        mutate(rng, ref2[10_000:11_000], 0.08),
    ])
    return params, index, frags


def test_jit_mapper_matches_host_path(world):
    params, index, frags = world
    mapper = jitmap.JitMapper(params, index, unit_factor=4, unit_chunk=4)
    out = mapper(frags)
    assert len(out["fallback_frags"]) == 0
    got = set()
    for i in range(len(out["frag"])):
        got.add((int(out["frag"][i]), int(out["sid"][i]), int(out["shared"][i]),
                 int(out["sketch"][i]), int(out["mean_pos"][i])))

    batch = glue.map_fragment_batch(np, frags, index, params, generous=True)
    maps = glue.gate_and_format(batch, np.arange(len(frags)), params)
    want = {(m.query_seq_id, m.ref_seq_id, m.conserved, m.sketch_size,
             m.ref_start_pos) for m in maps}
    assert got == want
    assert len(want) > 0


def test_caps_do_not_change_results(world):
    """Results are bit-identical across different capacity settings (caps
    only size buffers; overflow falls back to the exact host model)."""
    params, index, frags = world
    import copy

    a = jitmap.JitMapper(params, index, unit_factor=4, unit_chunk=4)
    p2 = copy.deepcopy(params)
    p2.hits_cap = 1024
    p2.cand_cap = 16
    b = jitmap.JitMapper(p2, index, unit_factor=4, unit_chunk=8)

    def norm(o):
        return sorted(zip(o["frag"].tolist(), o["sid"].tolist(),
                          o["shared"].tolist(), o["sketch"].tolist(),
                          o["mean_pos"].tolist()))

    assert norm(a(frags)) == norm(b(frags))
    assert len(norm(a(frags))) > 0
