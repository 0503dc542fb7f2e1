"""Index persistence: save -> load must reproduce identical results.

The reference has no sketch checkpointing (winSketch.hpp rebuilds every
run); this subsystem is the sketch-once / map-many extension.  The load
path must be bit-identical to a fresh build, and parameter mismatches must
be rejected.
"""

import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope="module")
def genomes(tmp_path_factory):
    wd = tmp_path_factory.mktemp("persist")
    rng = np.random.default_rng(7)
    base = synth.random_genome(rng, 60_000)
    synth.write_fasta(wd / "a.fa", [("a", base)])
    synth.write_fasta(wd / "b.fa", [("b", synth.mutate_genome(rng, base, 0.03))])
    return wd


def test_save_load_roundtrip(genomes, tmp_path):
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex

    params = Parameters(ref_sequences=[str(genomes / "a.fa"),
                                       str(genomes / "b.fa")]).finalize()
    built = ReferenceIndex.build(params)
    idx_path = str(tmp_path / "ref.idx.npz")
    built.save(idx_path)

    params2 = Parameters().finalize()
    loaded = ReferenceIndex.load(idx_path, params2)
    for f in ("mi_hash", "mi_seqid", "mi_wpos", "occ_hash", "occ_seqid",
              "occ_wpos", "seq_start", "sequences_by_file"):
        np.testing.assert_array_equal(getattr(built, f), getattr(loaded, f))
    assert loaded.freq_threshold == built.freq_threshold
    assert [c.name for c in loaded.metadata] == [c.name for c in built.metadata]
    assert params2.ref_sequences == params.ref_sequences


def test_param_mismatch_rejected(genomes, tmp_path):
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex

    params = Parameters(ref_sequences=[str(genomes / "a.fa")]).finalize()
    idx_path = str(tmp_path / "ref.idx.npz")
    ReferenceIndex.build(params).save(idx_path)
    bad = Parameters(kmer_size=14).finalize()
    with pytest.raises(ValueError, match="kmer_size"):
        ReferenceIndex.load(idx_path, bad)


def test_cli_load_index_matches_fresh_run(genomes, tmp_path):
    from fastani_tpu import cli

    out_fresh = tmp_path / "fresh.txt"
    out_loaded = tmp_path / "loaded.txt"
    idx = tmp_path / "ref.npz"
    rc = cli.main(["-q", str(genomes / "a.fa"), "-r", str(genomes / "b.fa"),
                   "-o", str(out_fresh), "--saveIndex", str(idx)])
    assert rc == 0
    rc = cli.main(["-q", str(genomes / "a.fa"), "--loadIndex", str(idx),
                   "-o", str(out_loaded)])
    assert rc == 0
    assert out_fresh.read_text() == out_loaded.read_text()
    assert out_fresh.read_text() != ""
