"""Graceful capacity-overflow handling (VERDICT r2 weak #8).

Forces work-unit truncation in the jitted mapper and checks (a) the exact
per-fragment fallback attribution (only genuinely truncated fragments are
recomputed) and (b) byte-identical CLI output to the host path.
"""

import numpy as np

from tests import synth
from fastani_tpu.config import Parameters
from fastani_tpu.index.sketch import ReferenceIndex
from fastani_tpu.models import jitmap, pipeline


def _world(tmp_path, n_refs=4):
    rng = np.random.default_rng(77)
    base = synth.random_genome(rng, 40_000)
    refs = []
    for i in range(n_refs):
        p = str(tmp_path / f"r{i}.fa")
        synth.write_fasta(p, [(f"r{i}", synth.mutate_genome(
            rng, base, 0.01 + 0.01 * i))])
        refs.append(p)
    q = str(tmp_path / "q.fa")
    synth.write_fasta(q, [("q", synth.mutate_genome(rng, base, 0.02))])
    return refs, q


def test_unit_truncation_exact_fallback(tmp_path):
    refs, q = _world(tmp_path)
    params = Parameters(frag_len=1000, frag_batch=16).finalize()
    params.ref_sequences = refs
    params.query_sequences = [q]
    index = ReferenceIndex.build(params)

    # generous capacity: no truncation
    big = jitmap.JitMapper(params, index, unit_factor=8, unit_chunk=16)
    qf = pipeline.load_query_fragments(q, params)
    want = big(qf.frags[:16])
    assert len(want["fallback_frags"]) == 0

    # starved capacity: every fragment maps to ~4 genomes but only
    # 16 * 2 = 32 units fit -> truncation must fall back per fragment
    small = jitmap.JitMapper(params, index, unit_factor=2, unit_chunk=16)
    got = small(qf.frags[:16])
    assert len(got["fallback_frags"]) > 0
    # NOT the whole batch: early fragments' units fit
    assert len(got["fallback_frags"]) < 16
    # combined device + host-fallback results must equal the generous run
    # (same (frag, sid) -> (shared, pos) mapping set)
    def as_set(out):
        return set(zip(out["frag"].tolist(), out["sid"].tolist(),
                       out["shared"].tolist(), out["mean_pos"].tolist()))
    kept = as_set(got)
    # fallback fragments' rows recomputed by the caller; emulate pipeline
    from fastani_tpu.utils import refmodel

    for fb in got["fallback_frags"]:
        for m in refmodel.map_fragment(qf.frags[int(fb)], index, params,
                                       int(fb)):
            kept.add((int(fb), m.ref_seq_id, m.conserved, m.ref_start_pos))
    assert kept == as_set(want)


def test_cli_overflow_byte_identical(tmp_path, monkeypatch):
    """CLI whose jitted mapper is starved to a unit capacity that MUST
    truncate still matches the host backend byte-for-byte (the exact
    per-fragment fallback engages end-to-end)."""
    refs, q = _world(tmp_path)
    lst = str(tmp_path / "refs.txt")
    with open(lst, "w") as f:
        f.write("\n".join(refs) + "\n")

    from fastani_tpu import cli

    a = str(tmp_path / "np.txt")
    b = str(tmp_path / "jx.txt")
    base = ["-q", q, "--rl", lst, "--fragLen", "1000", "--matrix"]
    assert cli.main(base + ["-o", a]) == 0

    starved = {"engaged": 0}
    orig_init = jitmap.JitMapper.__init__

    def patched(self, params, index, unit_factor=4, unit_chunk=128):
        orig_init(self, params, index, unit_factor=1, unit_chunk=8)
        starved["engaged"] += 1

    monkeypatch.setattr(jitmap.JitMapper, "__init__", patched)
    assert cli.main(base + ["-o", b, "--backend", "jax", "--exact"]) == 0
    assert starved["engaged"] > 0
    assert open(a).read() == open(b).read()
    assert open(a + ".matrix").read() == open(b + ".matrix").read()
