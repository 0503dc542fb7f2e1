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


def test_streaming_cgi_matches_oneshot():
    """StreamingCGI (batched folds + fallback injection) vs cgi_matrices
    over the same row set."""
    import dataclasses

    from fastani_tpu.config import Parameters

    rng = np.random.default_rng(21)
    n_qg, n_rg, frag_len = 4, 2, 3000
    lengths = [50_000, 30_000, 20_000, 10_000]
    genome_of_seq = np.array([0, 0, 1, 1], np.int32)

    @dataclasses.dataclass
    class _Ix:
        metadata: list

        def genome_of_seq(self):
            return genome_of_seq

    @dataclasses.dataclass
    class _C:
        length: int

    params = Parameters(frag_batch=8).finalize()
    index = _Ix([_C(l) for l in lengths])

    # fragment-grouped rows: fragments are (qno, qsid) pairs in order
    frags = [(q, f) for q in range(n_qg) for f in range(rng.integers(2, 6))]
    rows = []          # (qno, qsid, sid, shared, sketch, pos) per mapping
    for (q, f) in frags:
        for _ in range(int(rng.integers(1, 5))):
            sid = int(rng.integers(0, len(lengths)))
            sketch = int(rng.integers(100, 300))
            shared = int(sketch * rng.uniform(0.3, 1.0))
            pos = int(rng.integers(0, lengths[sid] - 1))
            rows.append((q, f, sid, shared, sketch, pos))
    rows = np.asarray(rows, np.int32)

    # one-shot oracle
    lut = device_cgi.identity_lut_full(16, params.sketch_cap)
    want_c, want_s = map(np.asarray, device_cgi.cgi_matrices(
        *(jnp.asarray(rows[:, i]) for i in (0, 1, 2, 3, 4, 5)),
        jnp.ones(len(rows), bool), jnp.asarray(genome_of_seq),
        jnp.asarray(lut), frag_len, n_qg, n_rg))

    # streaming: batches of B fragments, fragment-aligned
    B = 8
    cgi = device_cgi.StreamingCGI(index, params, n_qg, n_rg, n_slots=n_qg,
                                  frag_cap=B, donate=False)
    U = 64
    next_fin = 0
    for b0 in range(0, len(frags), B):
        batch_frags = frags[b0:b0 + B]
        packed = np.zeros((7, U), np.int32)
        n = 0
        inject_rows = []
        excl = np.zeros(B, bool)
        excl[1 % len(batch_frags)] = True     # exercise the fallback path
        for li, (q, f) in enumerate(batch_frags):
            sel = (rows[:, 0] == q) & (rows[:, 1] == f)
            for r in rows[sel]:
                if excl[li]:
                    inject_rows.append((li, r[0], r[1], r[2], r[3], r[4], r[5]))
                else:
                    packed[:, n] = (li, r[0], r[1], r[2], r[3], r[4], r[5])
                    n += 1
        cgi.update(jnp.asarray(packed), n, excl)
        if inject_rows:
            cgi.inject(np.asarray(inject_rows, np.int32).T)
        nxt = frags[b0 + B][0] if b0 + B < len(frags) else n_qg
        while next_fin < nxt:
            cgi.finalize_query(next_fin)
            next_fin += 1
    got_c, got_s = cgi.result()
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_allclose(got_s, want_s, rtol=2e-6, atol=1e-4)


def test_lazy_path_ingest_matches_preloaded(tmp_path):
    """map_queries_cgi_device accepts query PATHS and streams them with
    bounded host memory; result equals the preloaded-array run."""
    from tests import synth

    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    rng = np.random.default_rng(29)
    base = synth.random_genome(rng, 50_000)
    paths = []
    for i in range(3):
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", synth.mutate_genome(rng, base,
                                                            0.01 + 0.02 * i))])
        paths.append(str(p))
    params = Parameters(frag_batch=16).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=16)
    G = len(paths)

    preloaded = [pipeline.load_query_fragments(p, params) for p in paths]
    want_c, want_s = pipeline.map_queries_cgi_device(
        preloaded, index, params, mapper, G, G)
    got_c, got_s = pipeline.map_queries_cgi_device(
        list(paths), index, params, mapper, G, G)
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)


def test_stream_invariant_to_fuse_grouping(tmp_path):
    """The in-scan-finalize stream must produce BITWISE identical
    tallies for any fuse_k grouping of the same batch sequence (the
    per-batch finalize/update order is the invariant, not the program
    grouping)."""
    from tests import synth

    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    rng = np.random.default_rng(29)
    base = synth.random_genome(rng, 50_000)
    paths = []
    for i in range(3):
        g = synth.mutate_genome(rng, base, 0.01 + 0.02 * i)
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(str(p))
    params = Parameters(frag_batch=16).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=16)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    G = len(paths)

    results = []
    for fuse_k in (1, 4):
        h = pipeline.map_queries_cgi_stream(queries, index, params, mapper,
                                            G, G, fuse_k=fuse_k)
        results.append(pipeline.map_queries_cgi_finish(h, index, params,
                                                       mapper))
    (c1, s1), (c4, s4) = results
    np.testing.assert_array_equal(c1, c4)
    np.testing.assert_array_equal(s1, s4)
    assert c1.sum() > 0


def test_stream_slot_recycling_across_groups(tmp_path):
    """In-scan finalize with heavy slot recycling: genomes of very
    different sizes (1-5 batches each) across several fused K-groups,
    so slots recycle repeatedly and finalize lists land mid-group and at
    group boundaries.  Counts must equal the host aggregation."""
    from tests import synth

    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    rng = np.random.default_rng(37)
    base = synth.random_genome(rng, 120_000)
    sizes = [100_000, 24_000, 45_000, 12_000, 78_000, 30_000]
    paths = []
    for i, sz in enumerate(sizes):
        g = synth.mutate_genome(rng, base[:sz], 0.01 + 0.01 * (i % 4))
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(str(p))
    params = Parameters(frag_batch=8).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=8, unit_chunk=16)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    G = len(paths)

    starts, fins, tail, n_slots, fin_cap = pipeline.cgi_stream_schedule(
        pipeline.FragmentStream(queries, params), 8, G)
    assert n_slots < G            # slots genuinely recycle
    assert any(fins)              # finalize lists genuinely fire

    h = pipeline.map_queries_cgi_stream(queries, index, params, mapper,
                                        G, G, fuse_k=4)
    c_dev, s_dev = pipeline.map_queries_cgi_finish(h, index, params,
                                                   mapper)

    mapper2 = jitmap.JitMapper(params, index, unit_factor=8, unit_chunk=16)
    maps = pipeline.map_queries_batched(queries, index, params, mapper2)
    genome_of_seq = index.genome_of_seq()
    for q, m in enumerate(maps):
        rows, _ = ani.compute_cgi_arrays(
            m["ref_seq_id"], m["query_seq_id"], m["ref_start_pos"],
            m["ident"], genome_of_seq, params.frag_len, q,
            queries[q].total_fragments, want_visual=False)
        want = {r.ref_genome: r for r in rows}
        for g in range(G):
            assert c_dev[q, g] == (want[g].count_seq if g in want else 0), \
                (q, g)
            if g in want:
                np.testing.assert_allclose(
                    s_dev[q, g] / c_dev[q, g], want[g].identity, rtol=2e-6)
    assert c_dev.sum() > 0


def test_stream_excludes_pad_rows_of_partial_batch(tmp_path, monkeypatch):
    """Regression (advisor r4, high): the device-CGI stream must mark
    rows past n_used of the final PARTIAL batch invalid — their content
    is out of contract (zero fill today, but the row_valid mask is the
    guarantee, not the fill).  To make a violation observable, pad rows
    are filled with a REAL mappable fragment: without the n_used-based
    exclusion they map and fold spurious counts into query genome 0."""
    from tests import synth

    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    rng = np.random.default_rng(31)
    base = synth.random_genome(rng, 33_000)   # 11 frags/genome -> 33 total
    paths = []
    for i in range(3):
        g = synth.mutate_genome(rng, base, 0.01 + 0.02 * i)
        p = tmp_path / f"g{i}.fa"
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(str(p))
    # frag_batch=16: 33 frags -> final batch has 1 used + 15 pad rows
    params = Parameters(frag_batch=16).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=16)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    assert sum(len(q.frags) for q in queries) % params.frag_batch != 0

    real_frag = queries[0].frags[0].copy()
    orig_make_batch = pipeline.FragmentStream.make_batch

    def poisoned_make_batch(self, b0, B):
        frags, qno_row, gid_row, n = orig_make_batch(self, b0, B)
        if n < B:                     # fill pads with a mappable fragment
            frags[n:] = real_frag
        return frags, qno_row, gid_row, n

    monkeypatch.setattr(pipeline.FragmentStream, "make_batch",
                        poisoned_make_batch)

    # host oracle counts (exact aggregation over the REAL fragments)
    mapper2 = jitmap.JitMapper(params, index, unit_factor=5, unit_chunk=16)
    maps = pipeline.map_queries_batched(queries, index, params, mapper2)
    genome_of_seq = index.genome_of_seq()
    want_c = np.zeros((len(paths), len(paths)), np.int64)
    for q, m in enumerate(maps):
        rows, _ = ani.compute_cgi_arrays(
            m["ref_seq_id"], m["query_seq_id"], m["ref_start_pos"],
            m["ident"], genome_of_seq, params.frag_len, q,
            queries[q].total_fragments, want_visual=False)
        for r in rows:
            want_c[q, r.ref_genome] = r.count_seq

    c_dev, s_dev = pipeline.map_queries_cgi_device(
        queries, index, params, mapper, len(paths), len(paths))
    np.testing.assert_array_equal(c_dev, want_c)
    assert want_c.sum() > 0
