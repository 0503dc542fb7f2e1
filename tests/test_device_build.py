"""Device-resident index build vs the host build: bit-identical arrays."""

import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    wd = tmp_path_factory.mktemp("devbuild")
    rng = np.random.default_rng(21)
    base = synth.random_genome(rng, 50_000)
    synth.write_fasta(wd / "a.fa", [
        ("a1", base[:30_000]),
        ("a_short", synth.random_genome(rng, 20)),   # below k/w: no entries
        ("a2", synth.mutate_genome(rng, base[30_000:], 0.02)),
    ])
    synth.write_fasta(wd / "b.fa", [("b1", synth.mutate_genome(rng, base, 0.05))])
    return [str(wd / "a.fa"), str(wd / "b.fa")]


def test_device_build_matches_host(files):
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex

    params = Parameters(ref_sequences=files).finalize()
    host = ReferenceIndex.build(params)
    dev = ReferenceIndex.build_device(params)
    assert dev.num_entries == host.num_entries
    hv = dev.host_view()    # pads stripped
    for f in ("mi_hash", "mi_seqid", "mi_wpos", "occ_hash", "occ_seqid",
              "occ_wpos"):
        np.testing.assert_array_equal(getattr(hv, f), getattr(host, f),
                                      err_msg=f)
    np.testing.assert_array_equal(dev.seq_start, host.seq_start)
    np.testing.assert_array_equal(dev.sequences_by_file, host.sequences_by_file)
    assert dev.num_unique_hashes == host.num_unique_hashes
    assert dev.freq_threshold == host.freq_threshold


def test_device_build_chunked_carry(files, tmp_path):
    """Contig longer than one chunk: cross-chunk emit carry must match."""
    from fastani_tpu.config import Parameters
    from fastani_tpu.index import device_build
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.ops import minimizer

    rng = np.random.default_rng(33)
    seq = synth.random_genome(rng, 300_000)
    k, w = 16, 24
    want_h, want_w = minimizer.winnow_model(seq, k, w)

    pieces, overflows = device_build.winnow_contig_device(seq, k, w,
                                                          chunk=1 << 16)
    assert not any(bool(o) for o in overflows)
    got_h, got_w = [], []
    for hr, wr, cnt in pieces:
        hr, wr, cnt = np.asarray(hr), np.asarray(wr), np.asarray(cnt)
        for r in range(len(cnt)):
            got_h.append(hr[r, :cnt[r]])
            got_w.append(wr[r, :cnt[r]])
    got_h = np.concatenate(got_h)
    got_w = np.concatenate(got_w)
    assert len(got_h) == len(want_h)
    np.testing.assert_array_equal(got_h, want_h)
    np.testing.assert_array_equal(got_w, want_w)


def test_device_build_pallas_matches_host(files, monkeypatch):
    """The fused Pallas winnow producer (interpret mode on CPU) must build
    a bit-identical index to the host build, including multi-segment
    contigs exercising the SMEM emit-carry chain."""
    monkeypatch.setenv("FASTANI_PALLAS_WINNOW", "interpret")
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex

    params = Parameters(ref_sequences=files).finalize()
    host = ReferenceIndex.build(params)
    dev = ReferenceIndex.build_device(params)
    assert dev.num_entries == host.num_entries
    hv = dev.host_view()
    for f in ("mi_hash", "mi_seqid", "mi_wpos", "occ_hash", "occ_seqid",
              "occ_wpos"):
        np.testing.assert_array_equal(getattr(hv, f), getattr(host, f),
                                      err_msg=f)
    np.testing.assert_array_equal(dev.seq_start, host.seq_start)
    assert dev.num_unique_hashes == host.num_unique_hashes


def test_device_build_pallas_mixed_purity(files, tmp_path, monkeypatch):
    """Packed (2-bit) vs raw upload decision per flush: an N-containing
    contig forces the raw path; interleaving it with pure-ACGT contigs in
    one build must still be bit-identical to the host build (the packed
    flush re-zeroes halo/tail pads from position arithmetic)."""
    monkeypatch.setenv("FASTANI_PALLAS_WINNOW", "interpret")
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex

    rng = np.random.default_rng(31)
    g = synth.random_genome(rng, 40_000)
    withn = g.copy()
    withn[5_000:5_030] = ord("N")
    p = tmp_path / "mixed.fa"
    synth.write_fasta(p, [("pure1", g[:20_000]), ("n_ctg", withn),
                          ("pure2", g[20_000:])])
    params = Parameters(ref_sequences=[str(p)] + files).finalize()
    host = ReferenceIndex.build(params)
    dev = ReferenceIndex.build_device(params)
    assert dev.num_entries == host.num_entries
    hv = dev.host_view()
    for f in ("mi_hash", "mi_seqid", "mi_wpos", "occ_hash", "occ_seqid",
              "occ_wpos"):
        np.testing.assert_array_equal(getattr(hv, f), getattr(host, f),
                                      err_msg=f)


def test_winnow_batched_pallas_matches_xla(monkeypatch):
    """Fragment-batch winnowing: Pallas (interpret) vs the XLA doubling
    pipeline, elementwise equal."""
    import jax.numpy as jnp

    from fastani_tpu.models import mapping

    rng = np.random.default_rng(9)
    frags = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, (6, 1000))].copy()
    frags[2, 100:200] = ord("N")
    lens = np.full(6, 1000, np.int32)
    k, w = 16, 24
    e0, h0, w0 = mapping.winnow_batched(jnp, jnp.asarray(frags), k, w,
                                        jnp.asarray(lens))
    monkeypatch.setenv("FASTANI_PALLAS_WINNOW", "interpret")
    e1, h1, w1 = mapping.winnow_batched(jnp, jnp.asarray(frags), k, w,
                                        jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(h0)[np.asarray(e0)],
                                  np.asarray(h1)[np.asarray(e1)])
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
