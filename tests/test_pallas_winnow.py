"""Fused Pallas winnow kernel vs the literal deque oracle, bit-exact."""

import numpy as np
import pytest

from fastani_tpu.ops import hashing, minimizer, pallas_winnow as pw


def _rows_from_seq(seq, k, w, seg):
    """Split one contig into haloed segment rows (host-side layout)."""
    halo = w - 1
    L = len(seq)
    rows, base, ctg = [], [], []
    for b0 in range(0, L, seg):
        buf = np.zeros(pw.SEG_W, np.int32)
        lo = b0 - halo
        src_lo, src_hi = max(lo, 0), min(lo + pw.SEG_W, L)
        buf[src_lo - lo: src_hi - lo] = seq[src_lo:src_hi]
        rows.append(buf)
        base.append(b0)
        ctg.append(0)
    return (np.stack(rows), np.asarray(ctg, np.int32),
            np.asarray(base, np.int32), np.full(len(rows), L, np.int32))


def _collect(emit, h, wp, base, seg, L, k, w):
    """Gather emitted (hash, wpos) from scored flat positions only."""
    halo = w - 1
    out_h, out_w = [], []
    for r in range(emit.shape[0]):
        lo, hi = halo, halo + seg
        e = np.asarray(emit[r])[lo:hi]
        out_h.append(np.asarray(h[r])[lo:hi][e])
        out_w.append(np.asarray(wp[r])[lo:hi][e])
    return np.concatenate(out_h).astype(np.uint32), np.concatenate(out_w)


SEG = pw.SEG_W - (24 - 1) - (16 - 1)  # kernel default scored span (k=16,w=24)


@pytest.mark.parametrize("L,k,w", [(300, 16, 24), (5000, 16, 24),
                                   (40000, 16, 24), (5000, 14, 16)])
def test_pallas_winnow_matches_oracle(L, k, w):
    rng = np.random.default_rng(L + k + w)
    bases = np.frombuffer(b"ACGTacgt", dtype=np.uint8)
    seq = bases[rng.integers(0, 8, L)]
    # sprinkle N-runs (palindromic invalid stretches) and AT repeats
    seq[50:80] = ord("N")
    if L > 2000:
        seq[1000:1400] = np.frombuffer(b"AT" * 200, dtype=np.uint8)
    rows, ctg, base, tl = _rows_from_seq(hashing.upper_np(seq), k, w, SEG)
    emit, h, wp = pw.winnow_rows(rows, ctg, base, tl, k, w, interpret=True)
    got_h, got_w = _collect(emit, h, wp, base, SEG, L, k, w)
    want_h, want_w = minimizer.winnow_model(seq, k, w)
    np.testing.assert_array_equal(got_h, want_h)
    np.testing.assert_array_equal(got_w, want_w)


def test_pallas_winnow_multirow_carry():
    """Two contigs back-to-back in one dispatch: carry must chain within a
    contig (multi-segment) and reset between contigs."""
    k, w = 16, 24
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [bases[rng.integers(0, 4, 2 * SEG + 500)],
            bases[rng.integers(0, 4, 700)]]
    all_rows, all_ctg, all_base, all_tl = [], [], [], []
    for i, s in enumerate(seqs):
        r, c, b, t = _rows_from_seq(s, k, w, SEG)
        all_rows.append(r)
        all_ctg.append(np.full(len(b), i, np.int32))
        all_base.append(b)
        all_tl.append(t)
    rows = np.concatenate(all_rows)
    emit, h, wp = pw.winnow_rows(rows, np.concatenate(all_ctg),
                                 np.concatenate(all_base),
                                 np.concatenate(all_tl), k, w,
                                 interpret=True)
    halo = w - 1
    ofs = 0
    for i, s in enumerate(seqs):
        n_rows = -(-len(s) // SEG) if len(s) > SEG else 1
        gh, gw = [], []
        for r in range(ofs, ofs + n_rows):
            e = np.asarray(emit[r])[halo:halo + SEG]
            gh.append(np.asarray(h[r])[halo:halo + SEG][e])
            gw.append(np.asarray(wp[r])[halo:halo + SEG][e])
        ofs += n_rows
        want_h, want_w = minimizer.winnow_model(s, k, w)
        np.testing.assert_array_equal(np.concatenate(gh).astype(np.uint32),
                                      want_h, err_msg=f"contig {i}")
        np.testing.assert_array_equal(np.concatenate(gw), want_w,
                                      err_msg=f"contig {i}")
