import numpy as np
import pytest

from fastani_tpu.ops import hashing
from tests.murmur3_oracle import murmur3_low32


@pytest.mark.parametrize("length", [1, 4, 7, 8, 9, 12, 15, 16])
def test_murmur3_np_matches_oracle(length):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 256, size=(64, length), dtype=np.uint8)
    got = hashing.murmur3_low32_np(keys, length)
    want = np.array([murmur3_low32(bytes(k), 42) for k in keys], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [5, 9, 16])
def test_kmer_hashes_jax_matches_np(k):
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 256, size=300, dtype=np.uint8)
    want = hashing.kmer_hashes_np(seq, k)
    got = np.asarray(hashing.kmer_hashes_jax(seq, k))
    np.testing.assert_array_equal(got, want)


def test_kmer_hashes_on_dna_text():
    seq = np.frombuffer(b"ACGTACGTTTGGCCAANNNACGTACGTACGTT", dtype=np.uint8)
    k = 16
    got = hashing.kmer_hashes_np(seq, k)
    for i in range(len(seq) - k + 1):
        assert got[i] == murmur3_low32(bytes(seq[i : i + k]), 42)


def test_revcomp_matches_reference_semantics():
    # A<->T, C<->G, other bytes (e.g. N) unchanged; output reversed.
    seq = np.frombuffer(b"ACGTN", dtype=np.uint8)
    rc = hashing.revcomp_np(seq)
    assert rc.tobytes() == b"NACGT"
    rcj = np.asarray(hashing.revcomp_jax(np.asarray(seq)))
    assert rcj.tobytes() == b"NACGT"


def test_upper():
    seq = np.frombuffer(b"acgTn!", dtype=np.uint8)
    assert hashing.upper_np(seq).tobytes() == b"ACGTN!"
