"""Frozen-golden regression tests (no oracle binary needed).

The reference checkout's real-genome goldens are git-lfs stubs, so the
repo commits its OWN golden outputs for the deterministic synthetic e2e
fixtures (generated once from the compiled reference binary — see
tests/test_e2e_oracle.py for the live-oracle versions).  These catch
regressions even in environments where the oracle cannot be rebuilt.
"""

import os
import pathlib

import numpy as np
import pytest

from tests import synth

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _sorted_lines(path):
    with open(path) as f:
        return sorted(line.rstrip("\n") for line in f if line.strip())


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("golden")
    rng = np.random.default_rng(2024)
    base = synth.random_genome(rng, 150_000)
    strain_a = synth.mutate_genome(rng, base, sub_rate=0.02, indel_rate=0.0003)
    strain_b = synth.mutate_genome(rng, base, sub_rate=0.05, indel_rate=0.0005)
    multi = [
        ("m_ctg1", synth.mutate_genome(rng, base[:80_000], 0.01)),
        ("m_short", synth.random_genome(rng, 800)),
        ("m_ctg2", synth.mutate_genome(rng, base[80_000:], 0.03)),
    ]
    synth.write_fasta(wd / "base.fa", [("base_ctg", base)])
    synth.write_fasta(wd / "strainA.fa", [("sA_ctg", strain_a)])
    synth.write_fasta(wd / "strainB.fa", [("sB_ctg", strain_b)])
    synth.write_fasta(wd / "multi.fa", multi)
    (wd / "refs.txt").write_text("strainA.fa\nstrainB.fa\n")
    return wd


def _run(wd, args):
    from fastani_tpu import cli

    cwd = os.getcwd()
    os.chdir(wd)
    try:
        assert cli.main(args) == 0
    finally:
        os.chdir(cwd)


def test_one_to_one_matches_frozen_golden(workdir):
    _run(workdir, ["-q", "base.fa", "-r", "strainA.fa", "-o", "g1.txt",
                   "--visualize", "--matrix"])
    for suf in ("", ".matrix", ".visual"):
        assert _sorted_lines(workdir / ("g1.txt" + suf)) == \
            _sorted_lines(GOLDEN / ("one2one.txt" + suf)), suf


def test_multicontig_matches_frozen_golden(workdir):
    _run(workdir, ["-q", "multi.fa", "--rl", "refs.txt", "-o", "g2.txt",
                   "--visualize", "--matrix"])
    for suf in ("", ".matrix", ".visual"):
        assert _sorted_lines(workdir / ("g2.txt" + suf)) == \
            _sorted_lines(GOLDEN / ("multi.txt" + suf)), suf
