import numpy as np
import pytest

from fastani_tpu.ops import minimizer


def random_dna(rng, n, alphabet=b"ACGT"):
    return np.frombuffer(bytes(rng.choice(list(alphabet), size=n)), dtype=np.uint8)


@pytest.mark.parametrize("w", [5, 24])
@pytest.mark.parametrize("n", [40, 300, 1000])
def test_winnow_dense_matches_deque_model(w, n):
    rng = np.random.default_rng(n * w)
    seq = random_dna(rng, n)
    k = 16
    mh, mw = minimizer.winnow_model(seq, k, w)
    vh, vw = minimizer.winnow_sequence_np(seq, k, w)
    np.testing.assert_array_equal(vh, mh)
    np.testing.assert_array_equal(vw, mw)


def test_winnow_with_n_runs_and_lowercase():
    rng = np.random.default_rng(7)
    k, w = 16, 24
    parts = [
        random_dna(rng, 200),
        np.frombuffer(b"N" * 50, dtype=np.uint8),
        np.frombuffer(b"acgtacgtacgtacgtacgtacgt" * 10, dtype=np.uint8),
        random_dna(rng, 200),
    ]
    seq = np.concatenate(parts)
    mh, mw = minimizer.winnow_model(seq, k, w)
    vh, vw = minimizer.winnow_sequence_np(seq, k, w)
    np.testing.assert_array_equal(vh, mh)
    np.testing.assert_array_equal(vw, mw)


def test_winnow_repeat_at_pattern():
    # degenerate repeat genomes from the reference test suite: 8A+1T period
    k, w = 16, 24
    unit = b"A" * 8 + b"T"
    seq = np.frombuffer((unit * 300)[:2048], dtype=np.uint8)
    mh, mw = minimizer.winnow_model(seq, k, w)
    vh, vw = minimizer.winnow_sequence_np(seq, k, w)
    np.testing.assert_array_equal(vh, mh)
    np.testing.assert_array_equal(vw, mw)


def test_winnow_all_a_is_empty():
    # pure-A sequence: every kmer is its own revcomp's complement... fwd==bwd
    # only for palindromes; poly-A fwd=AAAA.., bwd=TTTT.. hashes differ, so
    # minimizers exist but are all identical hash — emit-on-change keeps few.
    k, w = 16, 24
    seq = np.frombuffer(b"A" * 500, dtype=np.uint8)
    mh, mw = minimizer.winnow_model(seq, k, w)
    vh, vw = minimizer.winnow_sequence_np(seq, k, w)
    np.testing.assert_array_equal(vh, mh)
    np.testing.assert_array_equal(vw, mw)
    # all kmers identical -> the same position can only be selected while in
    # window; emissions happen when the rightmost argmin advances
    assert len(mh) >= 1


def test_winnow_short_sequence():
    seq = np.frombuffer(b"ACGTACGTACGT", dtype=np.uint8)  # < k
    vh, vw = minimizer.winnow_sequence_np(seq, 16, 24)
    assert len(vh) == 0
