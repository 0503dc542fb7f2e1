"""Native C++ FASTA/FASTQ reader vs the pure-Python oracle parser.

Both must implement kseq record semantics (reference: src/common/kseq.h):
multi-record, multi-line, CRLF, FASTQ quality skipping, gzip, leading junk.
"""

import gzip

import numpy as np
import pytest

from fastani_tpu import native
from fastani_tpu.io import fasta


def _lib():
    lib = native.load_io_lib()
    if lib is None:
        pytest.skip("native IO library unavailable")
    return lib


CASES = {
    "plain": b">a desc\nACGT\nacgt\n>b\nNNNN\n",
    "crlf": b">a one\r\nACGT\r\nTT\r\n>b two\r\nGG\r\n",
    "no_trailing_newline": b">x\nACGTACGT",
    "empty_record": b">a\n>b\nACGT\n",
    "leading_junk": b"; comment\n# more\n>a\nAC\n",
    "fastq": b"@r1 d\nACGT\n+\nIIII\n@r2\nGGCC\nTT\n+ junk\nIIIIII\n@r3\nAA\n+\nII\n",
    "mixed": b">fa1\nACGT\n@fq1\nGGTT\n+\nIIII\n>fa2\nCC\n",
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, name, gz):
    _lib()
    raw = CASES[name]
    p = tmp_path / (name + (".fa.gz" if gz else ".fa"))
    p.write_bytes(gzip.compress(raw) if gz else raw)
    py = list(fasta.read_sequences_py(str(p)))
    nat = list(fasta._read_sequences_native(_lib(), str(p)))
    assert [n for n, _ in nat] == [n for n, _ in py]
    for (_, a), (_, b) in zip(nat, py):
        np.testing.assert_array_equal(a, b)


def test_native_large_roundtrip(tmp_path):
    _lib()
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", np.uint8)
    seqs = [bases[rng.integers(0, 4, int(n))] for n in (100_000, 5, 70_000)]
    lines = []
    for i, s in enumerate(seqs):
        lines.append(f">s{i}\n".encode())
        b = s.tobytes()
        lines += [b[j:j + 61] + b"\n" for j in range(0, len(b), 61)]
    p = tmp_path / "big.fa"
    p.write_bytes(b"".join(lines))
    out = list(fasta.read_sequences(str(p)))
    assert len(out) == 3
    for (_, a), b in zip(out, seqs):
        np.testing.assert_array_equal(a, b)


def test_native_missing_file_raises(tmp_path):
    lib = _lib()
    with pytest.raises(OSError):
        list(fasta._read_sequences_native(lib, str(tmp_path / "nope.fa")))
