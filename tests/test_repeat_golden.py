"""Reference repeat-genome golden matrix, replayed on the real data files.

Mirrors the 8 degenerate-repeat Catch2 cases
(/root/reference/tests/fastani_tests.cpp:302-416): a pure-A 2-Mbp genome
mapped against N-period AT-repeat genomes with --sanityCheck must produce
ZERO output rows (the repeat false-positive guard).  The inputs are the
reference's own committed FASTA fixtures; expected output is empty.

(The D4 draft-genome golden cases can't be replayed here: those FASTAs are
git-lfs pointer stubs in the read-only reference checkout.)
"""

import os

import pytest

REF_DATA = "/root/reference/tests/data"

REPEAT_REFS = ["repeat_8ats_2048.fa", "repeat_12ats_2048.fa",
               "repeat_16ats_2048.fa", "repeat_20ats_2048.fa",
               "repeat_24ats_2048.fa", "repeat_32ats_2048.fa",
               "repeat_64ats_2048.fa", "repeat_128ats_2048.fa"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference test data not mounted")


@pytest.mark.parametrize("ref_fa", REPEAT_REFS)
def test_repeat_guard_zero_rows(tmp_path, ref_fa):
    from fastani_tpu import cli

    out = tmp_path / f"out_{ref_fa}.txt"
    rc = cli.main(["-q", os.path.join(REF_DATA, "repeat_as_2048.fa"),
                   "-r", os.path.join(REF_DATA, ref_fa),
                   "-o", str(out), "-s", "--matrix"])
    assert rc == 0
    assert out.read_text() == ""
