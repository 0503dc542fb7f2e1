"""Device CGI tallies vs the host aggregation (models/ani.py)."""

import jax.numpy as jnp
import numpy as np

from fastani_tpu.models import ani, device_cgi


def _random_rows(rng, n, n_qg, n_seqs, frag_len):
    qno = rng.integers(0, n_qg, n).astype(np.int32)
    qsid = rng.integers(0, 40, n).astype(np.int32)
    sid = rng.integers(0, n_seqs, n).astype(np.int32)
    sketch = rng.integers(100, 300, n).astype(np.int32)
    shared = (sketch * rng.uniform(0.3, 1.0, n)).astype(np.int32)
    pos = rng.integers(0, 200_000, n).astype(np.int32)
    return qno, qsid, sid, shared, sketch, pos


def test_cgi_matrices_match_host():
    rng = np.random.default_rng(7)
    n_qg, n_rg, n_seqs, frag_len = 3, 4, 9, 3000
    genome_of_seq = np.sort(rng.integers(0, n_rg, n_seqs)).astype(np.int32)
    k = 16
    lut = device_cgi.identity_lut_full(k, 384)
    qno, qsid, sid, shared, sketch, pos = _random_rows(
        rng, 500, n_qg, n_seqs, frag_len)
    valid = rng.uniform(size=500) < 0.8

    counts, sums = device_cgi.cgi_matrices(
        jnp.asarray(qno), jnp.asarray(qsid), jnp.asarray(sid),
        jnp.asarray(shared), jnp.asarray(sketch), jnp.asarray(pos),
        jnp.asarray(valid), jnp.asarray(genome_of_seq), jnp.asarray(lut),
        frag_len, n_qg, n_rg)
    counts = np.asarray(counts)
    sums = np.asarray(sums)

    ident = lut[sketch, shared]
    for q in range(n_qg):
        sel = (qno == q) & valid
        rows, _ = ani.compute_cgi_arrays(
            sid[sel].astype(np.int64), qsid[sel].astype(np.int64),
            pos[sel].astype(np.int64), ident[sel], genome_of_seq,
            frag_len, q, 100, want_visual=False)
        want = {r.ref_genome: r for r in rows}
        for g in range(n_rg):
            if g in want:
                assert counts[q, g] == want[g].count_seq, (q, g)
                got_ani = sums[q, g] / counts[q, g]
                np.testing.assert_allclose(got_ani, want[g].identity,
                                           rtol=2e-6)
            else:
                assert counts[q, g] == 0, (q, g)


def test_cgi_matrices_all_invalid():
    lut = device_cgi.identity_lut_full(16, 384)
    z = jnp.zeros(16, jnp.int32)
    counts, sums = device_cgi.cgi_matrices(
        z, z, z, z, z, z, jnp.zeros(16, bool),
        jnp.zeros(4, jnp.int32), jnp.asarray(lut), 3000, 2, 2)
    assert int(np.asarray(counts).sum()) == 0
    assert float(np.asarray(sums).sum()) == 0.0


def test_map_queries_cgi_device_matches_host(tmp_path):
    """Full device path (map + device CGI) vs the host aggregation on a
    synthetic all-vs-all workload."""
    from tests import synth

    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    rng = np.random.default_rng(13)
    base = synth.random_genome(rng, 60_000)
    paths = []
    for i in range(3):
        g = synth.mutate_genome(rng, base, 0.01 + 0.03 * i)
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(str(p))
    params = Parameters(frag_batch=32).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=32)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]

    counts, sums = pipeline.map_queries_cgi_device(
        queries, index, params, mapper, len(paths), len(paths))

    mapper2 = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=32)
    maps = pipeline.map_queries_batched(queries, index, params, mapper2)
    genome_of_seq = index.genome_of_seq()
    for q, m in enumerate(maps):
        rows, _ = ani.compute_cgi_arrays(
            m["ref_seq_id"], m["query_seq_id"], m["ref_start_pos"],
            m["ident"], genome_of_seq, params.frag_len, q,
            queries[q].total_fragments, want_visual=False)
        want = {r.ref_genome: r for r in rows}
        for g in range(len(paths)):
            if g in want:
                assert counts[q, g] == want[g].count_seq, (q, g)
                np.testing.assert_allclose(sums[q, g] / counts[q, g],
                                           want[g].identity, rtol=2e-6)
            else:
                assert counts[q, g] == 0, (q, g)
    assert counts.sum() > 0
