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


def test_cli_mesh_bit_identical_to_single(world, tmp_path):
    """Product mesh path: CLI --mesh 2x4 output files must be BYTE-equal
    to the single-device run (the reference's -t N invariance contract,
    fastani_tests.cpp:199-255) — exact, no tolerance."""
    params, refs, query = world
    qpath = str(tmp_path / "query.fa")
    synth.write_fasta(qpath, [("q0", query)])
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(refs) + "\n")

    from fastani_tpu import cli

    single = str(tmp_path / "single.txt")
    meshed = str(tmp_path / "meshed.txt")
    base_args = ["-q", qpath, "--rl", lst, "--fragLen", "1000", "--matrix"]
    assert cli.main(base_args + ["-o", single]) == 0
    assert cli.main(base_args + ["-o", meshed, "--mesh", "2x4"]) == 0
    a = open(single).read()
    b = open(meshed).read()
    assert a == b and a.strip()
    assert open(single + ".matrix").read() == open(meshed + ".matrix").read()


def test_runner_exact_vs_pipeline(world, tmp_path):
    """run_sharded CGI rows equal pipeline.run rows bit-for-bit
    (identity float32 equality, not approximate)."""
    from fastani_tpu.config import Parameters
    from fastani_tpu.models import pipeline
    from fastani_tpu.parallel import runner

    params, refs, query = world
    qpath = str(tmp_path / "q.fa")
    synth.write_fasta(qpath, [("q0", query)])

    def mk():
        p = Parameters(frag_len=1000)
        p.window_size = params.window_size
        p.ref_sequences = list(refs)
        p.query_sequences = [qpath]
        return p.finalize()

    want = pipeline.run(mk(), backend="numpy")
    got = runner.run_sharded(mk(), 2, 4, log=lambda m: None)
    key = lambda r: (r.qry_genome, r.ref_genome)
    want_d = {key(r): r for r in want}
    got_d = {key(r): r for r in got}
    assert set(want_d) == set(got_d)
    for kk in want_d:
        assert got_d[kk].count_seq == want_d[kk].count_seq, kk
        assert np.float32(got_d[kk].identity) == np.float32(want_d[kk].identity), kk


def test_cli_mesh_sanity_and_visual_match_single(world, tmp_path):
    """--mesh with -s and --visualize: output files (incl. .visual) must be
    byte-equal to the single-device run (reference: per-split sanityCheck
    reporting + per-thread .visual concat, core_genome_identity.cpp:125-165;
    our canonical order is the -t 1 form)."""
    params, refs, query = world
    qpath = str(tmp_path / "query.fa")
    synth.write_fasta(qpath, [("q0", query)])
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(refs) + "\n")

    from fastani_tpu import cli

    single = str(tmp_path / "single.txt")
    meshed = str(tmp_path / "meshed.txt")
    base_args = ["-q", qpath, "--rl", lst, "--fragLen", "1000",
                 "--matrix", "-s", "--visualize"]
    assert cli.main(base_args + ["-o", single]) == 0
    assert cli.main(base_args + ["-o", meshed, "--mesh", "2x4"]) == 0
    for suf in ("", ".matrix", ".visual"):
        a = open(single + suf).read()
        b = open(meshed + suf).read()
        assert a == b, suf
    assert open(single + ".visual").read().strip()


def test_mesh_sanity_rejects_repeats(world, tmp_path):
    """A repeat-degenerate shard must be flagged and contribute no rows in
    mesh mode (reference skips the failing split's map loop)."""
    params, refs, query = world
    # shard 1 (files 1, 3) replaced by a pure-AT repeat genome
    bad = str(tmp_path / "bad.fa")
    synth.write_fasta(bad, [("bad", np.frombuffer(b"AT" * 6000,
                                                  np.uint8).copy())])
    mixed = [refs[0], bad, refs[2], bad]
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(mixed) + "\n")
    qpath = str(tmp_path / "query.fa")
    synth.write_fasta(qpath, [("q0", query)])

    from fastani_tpu import cli

    out = str(tmp_path / "mesh_s.txt")
    err = []
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert cli.main(["-q", qpath, "--rl", lst, "--fragLen", "1000",
                         "-s", "--maxRatioDiff", "0.5",
                         "-o", out, "--mesh", "2x4"]) == 0
    msgs = buf.getvalue()
    assert "SPLIT 1" in msgs and "exceeds maximum thresholds" in msgs
    for line in open(out):
        assert bad not in line.split("\t")[1]


def test_mesh_index_persist_roundtrip(world, tmp_path):
    """--saveIndex/--loadIndex on the mesh path: per-shard .npz files, and
    a load-run byte-equal to the build-run."""
    params, refs, query = world
    qpath = str(tmp_path / "query.fa")
    synth.write_fasta(qpath, [("q0", query)])
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(refs) + "\n")

    from fastani_tpu import cli

    saved = str(tmp_path / "built.txt")
    loaded = str(tmp_path / "loaded.txt")
    idx = str(tmp_path / "shardidx")
    base = ["-q", qpath, "--rl", lst, "--fragLen", "1000", "--mesh", "2x4"]
    assert cli.main(base + ["-o", saved, "--saveIndex", idx]) == 0
    import os

    assert os.path.exists(idx + ".r0of2.npz")
    assert os.path.exists(idx + ".r1of2.npz")
    assert cli.main(base + ["-o", loaded, "--loadIndex", idx]) == 0
    assert open(saved).read() == open(loaded).read()
    assert open(saved).read().strip()
