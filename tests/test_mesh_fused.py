"""Fused zero-fetch device-CGI stream on the (r, q) mesh vs the
single-device device-CGI path.

The mesh step runs the SAME selection laws (per-batch 1-way dedupe,
per-bin 2-way scatter-max, in-scan finalize) with the index sharded over
r and fragments over q, merging per-bin maxima with lax.pmax — so
per-pair COUNTS must be identical to the single-device run and identity
SUMS equal up to float32 summation order (reference invariance contract:
thread-count invariance, fastani_tests.cpp:199-255)."""

import numpy as np
import pytest

from fastani_tpu.config import Parameters


def _workload(tmp_path, n_genomes=4, size=40_000):
    from tests import synth

    rng = np.random.default_rng(47)
    base = synth.random_genome(rng, size)
    paths = []
    for i in range(n_genomes):
        g = synth.mutate_genome(rng, base, 0.01 + 0.02 * i)
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(str(p))
    return paths


def _params(paths, out=""):
    params = Parameters(frag_batch=16, out_file_name=out).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    return params


def _single_device_matrices(paths):
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    params = _params(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=8, unit_chunk=16)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    return pipeline.map_queries_cgi_device(
        queries, index, params, mapper, len(paths), len(paths))


@pytest.mark.parametrize("n_r,n_q", [(1, 1), (2, 2), (2, 4)])
def test_fused_mesh_matches_single_device(tmp_path, n_r, n_q):
    from fastani_tpu.parallel import runner

    paths = _workload(tmp_path)
    c0, s0 = _single_device_matrices(paths)

    params = _params(paths, out=str(tmp_path / f"out_{n_r}x{n_q}.txt"))
    stats = {}
    rows = runner.run_sharded_fused(params, n_r, n_q, stats=stats,
                                    log=lambda m: None)
    G = len(paths)
    c1 = np.zeros((G, G), np.int64)
    s1 = np.zeros((G, G), np.float32)
    for r in rows:
        c1[r.qry_genome, r.ref_genome] = r.count_seq
        s1[r.qry_genome, r.ref_genome] = (np.float32(r.identity)
                                          * np.float32(r.count_seq))
    np.testing.assert_array_equal(c1, c0)
    a0 = np.where(c0 > 0, s0 / np.maximum(c0, 1), 0.0)
    a1 = np.where(c1 > 0, s1 / np.maximum(c1, 1), 0.0)
    np.testing.assert_allclose(a1, a0, atol=1e-3)
    assert stats.get("fallback_frags", 0) == 0
    assert c1.sum() > 0
    # output file written with the gated TSV rows
    assert (tmp_path / f"out_{n_r}x{n_q}.txt").stat().st_size > 0


def test_fused_mesh_tsv_close_to_exact_cli(tmp_path):
    """Fused-mesh TSV vs the exact sharded path's TSV: same row set,
    ANI within the BASELINE tolerance (0.1)."""
    from fastani_tpu.parallel import runner

    paths = _workload(tmp_path)
    p_exact = _params(paths, out=str(tmp_path / "exact.txt"))
    runner.run_sharded(p_exact, 2, 2, log=lambda m: None)
    p_fast = _params(paths, out=str(tmp_path / "fast.txt"))
    runner.run_sharded_fused(p_fast, 2, 2, log=lambda m: None)

    def parse(fp):
        out = {}
        for ln in open(fp):
            q, r, ani_v, cnt, tot = ln.split("\t")
            out[(q, r)] = (float(ani_v), int(cnt), int(tot))
        return out

    ex = parse(tmp_path / "exact.txt")
    fa = parse(tmp_path / "fast.txt")
    assert set(ex) == set(fa)
    for key, (ani_e, cnt_e, tot_e) in ex.items():
        ani_f, cnt_f, tot_f = fa[key]
        assert abs(ani_e - ani_f) < 0.1, key
        assert cnt_e == cnt_f and tot_e == tot_f, key
