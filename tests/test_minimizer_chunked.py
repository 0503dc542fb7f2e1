import numpy as np
import pytest

from fastani_tpu.ops import minimizer


@pytest.mark.parametrize("chunk", [256, 1000])
def test_chunked_matches_model(chunk):
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # include an N-run crossing a chunk boundary to exercise the carry
    seq = np.concatenate([
        bases[rng.integers(0, 4, 700)],
        np.frombuffer(b"N" * 200, dtype=np.uint8),
        bases[rng.integers(0, 4, 1500)],
    ])
    k, w = 16, 24
    mh, mw = minimizer.winnow_model(seq, k, w)
    vh, vw = minimizer.winnow_sequence_chunked(seq, k, w, chunk=chunk)
    np.testing.assert_array_equal(vh, mh)
    np.testing.assert_array_equal(vw, mw)


def test_chunked_matches_bucketed():
    rng = np.random.default_rng(4)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, 10_000)]
    k, w = 16, 24
    bh, bw = minimizer.winnow_sequence_np(seq, k, w)
    ch, cw = minimizer.winnow_sequence_chunked(seq, k, w, chunk=1024)
    np.testing.assert_array_equal(bh, ch)
    np.testing.assert_array_equal(bw, cw)
