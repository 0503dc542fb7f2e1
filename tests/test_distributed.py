"""Multi-host planning layer (parallel/distributed.py) on the virtual mesh.

Single-process semantics are fully testable: mesh construction, the
round-robin shard law (host-count invariance), tally gathering, and global
placement of sharded index arrays.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from fastani_tpu.parallel import distributed as dist


def test_initialize_single_process_noop():
    assert dist.initialize() == 0
    assert dist.initialize(num_processes=1) == 0


def test_multihost_mesh_shapes():
    n = len(jax.devices())
    m = dist.multihost_mesh(1, n)
    assert m.devices.shape == (1, n)
    assert m.axis_names == ("r", "q")
    if n % 2 == 0 and n >= 2:
        m2 = dist.multihost_mesh(2, n // 2)
        assert m2.devices.shape == (2, n // 2)
    with pytest.raises(AssertionError):
        dist.multihost_mesh(3, n)  # 3*n != n for n>0


def test_ref_shard_law_matches_reference_split():
    files = [f"g{i}.fa" for i in range(10)]
    shards = dist.local_ref_shards(files, 3, [0, 1, 2])
    # splitReferenceGenomes: j % n_r == r (computeCoreIdentity.hpp:457-474)
    assert shards[0] == ["g0.fa", "g3.fa", "g6.fa", "g9.fa"]
    assert shards[1] == ["g1.fa", "g4.fa", "g7.fa"]
    assert shards[2] == ["g2.fa", "g5.fa", "g8.fa"]
    # every file appears exactly once across shards
    assert sorted(sum(shards, [])) == sorted(files)


def test_plan_single_process_owns_all_rows():
    files = [f"g{i}.fa" for i in range(6)]
    n = len(jax.devices())
    n_r = 2 if n % 2 == 0 and n >= 2 else 1
    p = dist.plan(files, n_r=n_r, n_q=n // n_r)
    assert p.n_r == n_r and p.n_q == n // n_r
    assert p.my_r_rows == list(range(n_r))
    assert len(p.ref_shards) == n_r


def test_gather_tallies_single_process():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    b = np.ones((2, 3), np.int32)
    sa, cb = dist.gather_tallies(a, b)
    assert np.array_equal(sa, a)
    assert np.array_equal(cb, b)


def test_shard_index_arrays_placement():
    from fastani_tpu.config import Parameters
    from fastani_tpu.parallel import mesh as pmesh
    from tests import synth
    import os, tempfile

    n = len(jax.devices())
    n_r = 2 if n % 2 == 0 and n >= 2 else 1
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    files = []
    base = synth.random_genome(rng, 6000)
    for i in range(2 * n_r):
        path = os.path.join(tmp, f"r{i}.fa")
        synth.write_fasta(path, [(f"r{i}", synth.mutate_genome(rng, base, 0.02))])
        files.append(path)
    params = Parameters(frag_len=1000)
    params.window_size = 24
    sidx = pmesh.build_sharded_index(params, files, n_r)
    p = dist.plan(files, n_r=n_r, n_q=n // n_r)
    placed = dist.shard_index_arrays(p, sidx)
    assert placed["occ_hash"].shape == sidx.occ_hash.shape
    # row r of the global array equals shard r built locally
    assert np.array_equal(np.asarray(placed["occ_hash"]), sidx.occ_hash)
    assert np.array_equal(np.asarray(placed["n_occ"]), sidx.n_occ)
