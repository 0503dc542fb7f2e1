"""End-to-end golden tests: our pipeline vs the reference binary.

Builds the reference fastANI from /root/reference (with the local beta shim)
and compares full outputs — ANI TSV, phylip matrix, .visual rows — on
deterministic synthetic genome sets.  Line sets are compared sorted, the
same way the reference's own Catch2 suite compares goldens
(/root/reference/tests/fastani_tests.cpp:22-31).
"""

import os
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from tests import synth

pytestmark = pytest.mark.e2e


def _read_sorted(path):
    with open(path) as f:
        return sorted(line.rstrip("\n") for line in f if line.strip())


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(2024)
    base = synth.random_genome(rng, 150_000)
    strain_a = synth.mutate_genome(rng, base, sub_rate=0.02, indel_rate=0.0003)
    strain_b = synth.mutate_genome(rng, base, sub_rate=0.05, indel_rate=0.0005)
    # multi-contig genome: 3 contigs, one too short to map
    multi = [
        ("m_ctg1", synth.mutate_genome(rng, base[:80_000], 0.01)),
        ("m_short", synth.random_genome(rng, 800)),
        ("m_ctg2", synth.mutate_genome(rng, base[80_000:], 0.03)),
    ]
    synth.write_fasta(wd / "base.fa", [("base_ctg", base)])
    synth.write_fasta(wd / "strainA.fa", [("sA_ctg", strain_a)])
    synth.write_fasta(wd / "strainB.fa", [("sB_ctg", strain_b)])
    synth.write_fasta(wd / "multi.fa", multi)
    # the .visual offset quirk (write_visual indexes query_offsets directly
    # by querySeqId, replicating computeCoreIdentity.hpp:103-153): exercise
    # a mapped contig AFTER a short one and the reverse order
    synth.write_fasta(wd / "shortfirst.fa", [
        ("sf_tiny", synth.random_genome(rng, 500)),
        ("sf_big", synth.mutate_genome(rng, base[:90_000], 0.02)),
    ])
    synth.write_fasta(wd / "shortlast.fa", [
        ("sl_big", synth.mutate_genome(rng, base[:90_000], 0.02)),
        ("sl_tiny", synth.random_genome(rng, 500)),
    ])
    (wd / "refs.txt").write_text("strainA.fa\nstrainB.fa\n")
    return wd


@pytest.fixture(scope="module", params=["numpy", "jax"])
def backend(request):
    """Every e2e case runs against BOTH backends: the numpy host path and
    the jitted jax path (JitMapper + batched pipeline + LUT identities),
    with the Pallas kernels active in interpret mode so the TPU code path
    is the one being byte-checked (VERDICT r2 weak #7)."""
    if request.param == "jax":
        os.environ["FASTANI_PALLAS_WINNOW"] = "interpret"
        yield "jax"
        os.environ.pop("FASTANI_PALLAS_WINNOW", None)
    else:
        yield "numpy"


def run_ours(wd, args, backend="numpy"):
    from fastani_tpu import cli

    cwd = os.getcwd()
    os.chdir(wd)
    try:
        rc = cli.main(list(args) + ["--backend", backend])
        assert rc == 0
    finally:
        os.chdir(cwd)


def compare_outputs(wd, ours, oracle, visual=False, matrix=False):
    assert _read_sorted(wd / ours) == _read_sorted(wd / oracle), "ANI TSV differs"
    if matrix:
        assert _read_sorted(wd / (ours + ".matrix")) == _read_sorted(wd / (oracle + ".matrix")), "matrix differs"
    if visual:
        assert _read_sorted(wd / (ours + ".visual")) == _read_sorted(wd / (oracle + ".visual")), "visual differs"


def test_one_to_one(workdir, backend):
    wd = workdir
    synth.run_oracle(str(wd), ["-q", "base.fa", "-r", "strainA.fa",
                               "-o", f"o_ref_{backend}.txt", "--visualize", "--matrix"])
    run_ours(wd, ["-q", "base.fa", "-r", "strainA.fa",
                  "-o", f"o_our_{backend}.txt",
                  "--visualize", "--matrix"], backend)
    compare_outputs(wd, f"o_our_{backend}.txt", f"o_ref_{backend}.txt",
                    visual=True, matrix=True)


def test_one_to_many_multicontig(workdir, backend):
    wd = workdir
    synth.run_oracle(str(wd), ["-q", "multi.fa", "--rl", "refs.txt",
                               "-o", f"m_ref_{backend}.txt", "--visualize", "--matrix"])
    run_ours(wd, ["-q", "multi.fa", "--rl", "refs.txt",
                  "-o", f"m_our_{backend}.txt",
                  "--visualize", "--matrix"], backend)
    compare_outputs(wd, f"m_our_{backend}.txt", f"m_ref_{backend}.txt",
                    visual=True, matrix=True)


def test_repeat_sanity_check_zero_rows(workdir, backend):
    wd = workdir
    # degenerate repeat genomes (reference tests/gen_tests_data.py pattern):
    # pure-A query vs 8A+1T repeat reference must produce zero output rows
    unit = b"A" * 32
    q = np.frombuffer((unit * ((300_000 // len(unit)) + 1))[:300_000], np.uint8)
    unit2 = b"A" * 8 + b"T"
    r = np.frombuffer((unit2 * ((300_000 // len(unit2)) + 1))[:300_000], np.uint8)
    synth.write_fasta(wd / "rpt_q.fa", [("q", q.copy())])
    synth.write_fasta(wd / "rpt_r.fa", [("r", r.copy())])
    synth.run_oracle(str(wd), ["-q", "rpt_q.fa", "-r", "rpt_r.fa",
                               "-o", f"r_ref_{backend}.txt", "-s", "--matrix"])
    run_ours(wd, ["-q", "rpt_q.fa", "-r", "rpt_r.fa",
                  "-o", f"r_our_{backend}.txt",
                  "-s", "--matrix"], backend)
    assert _read_sorted(wd / f"r_our_{backend}.txt") == \
        _read_sorted(wd / f"r_ref_{backend}.txt") == []


def test_fast_path_ani_close_to_reference(workdir):
    """The product fast path (--backend jax WITHOUT --exact: device index
    build + fused zero-fetch device CGI) vs the reference binary: same
    row set, identical mapped/total fragment counts, ANI within the
    BASELINE 0.1 tolerance (float32 summation order is the only
    difference by construction)."""
    wd = workdir
    synth.run_oracle(str(wd), ["-q", "multi.fa", "--rl", "refs.txt",
                               "-o", "fastref.txt"])
    run_ours(wd, ["-q", "multi.fa", "--rl", "refs.txt",
                  "-o", "fastour.txt"], "jax")

    def parse(fp):
        out = {}
        for ln in open(fp):
            q, r, ani_v, cnt, tot = ln.split("\t")
            out[(os.path.basename(q), os.path.basename(r))] = (
                float(ani_v), int(cnt), int(tot))
        return out

    ref = parse(wd / "fastref.txt")
    ours = parse(wd / "fastour.txt")
    assert set(ref) == set(ours) and ref
    for key, (ani_r, cnt_r, tot_r) in ref.items():
        ani_o, cnt_o, tot_o = ours[key]
        assert abs(ani_r - ani_o) < 0.1, key
        assert (cnt_r, tot_r) == (cnt_o, tot_o), key


def test_visual_offsets_short_contig_both_orders(workdir, backend):
    """Byte-parity of .visual global query offsets when a short
    (unmappable) contig precedes or follows the mapped contig — the
    reference's offset bookkeeping quirk, both ways."""
    wd = workdir
    for tag, q in (("sf", "shortfirst.fa"), ("sl", "shortlast.fa")):
        synth.run_oracle(str(wd), ["-q", q, "--rl", "refs.txt",
                                   "-o", f"{tag}_ref_{backend}.txt", "--visualize"])
        run_ours(wd, ["-q", q, "--rl", "refs.txt",
                      "-o", f"{tag}_our_{backend}.txt",
                      "--visualize"], backend)
        compare_outputs(wd, f"{tag}_our_{backend}.txt",
                        f"{tag}_ref_{backend}.txt", visual=True)
