"""Thread-count invariance: -t N output must equal -t 1 output.

The reference's mt/st golden pairs assert identical values for -t 2 vs
-t 1 (fastani_tests.cpp:199-255).  Our engine is shard-count invariant by
construction (one logical shard; device sharding reproduces the same
reductions), so the flag must parse and change nothing.
"""

import numpy as np
import pytest

from tests import synth


def test_t2_equals_t1(tmp_path):
    from fastani_tpu import cli

    rng = np.random.default_rng(77)
    base = synth.random_genome(rng, 60_000)
    synth.write_fasta(tmp_path / "q.fa", [("q", base)])
    synth.write_fasta(tmp_path / "r1.fa", [("r1", synth.mutate_genome(rng, base, 0.02))])
    synth.write_fasta(tmp_path / "r2.fa", [("r2", synth.mutate_genome(rng, base, 0.06))])
    (tmp_path / "refs.txt").write_text(f"{tmp_path}/r1.fa\n{tmp_path}/r2.fa\n")

    outs = {}
    for t in (1, 2):
        out = tmp_path / f"out_t{t}.txt"
        rc = cli.main(["-q", str(tmp_path / "q.fa"), "--rl",
                       str(tmp_path / "refs.txt"), "-t", str(t),
                       "-o", str(out), "--matrix"])
        assert rc == 0
        outs[t] = (out.read_text(), (tmp_path / f"out_t{t}.txt.matrix").read_text())
    assert outs[1] == outs[2]
    assert outs[1][0] != ""
