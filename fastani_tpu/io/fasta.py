"""FASTA/FASTQ reading (plain or gzip) into NumPy byte arrays.

Replaces the reference's kseq parser (reference: src/common/kseq.h, used at
winSketch.hpp:141-147 and computeMap.hpp:122-132) with the same record
semantics: records begin at '>' (FASTA) or '@' (FASTQ), the name is the text
up to the first whitespace, the sequence is the concatenation of sequence
lines, FASTQ quality lines are skipped.

Two implementations with identical record semantics:
* the native C++ reader (fastani_tpu/native/io_reader.cpp, zlib-backed,
  dense buffer+offsets output) — used when its .so builds/loads;
* this module's pure-Python parser — the always-available fallback and
  the parity oracle for the native one (tests/test_native_io.py).
Set FASTANI_TPU_NO_NATIVE=1 to force the Python path.
"""

from __future__ import annotations

import gzip
from typing import Iterator, List, Tuple

import numpy as np


def _open_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head[:2] == b"\x1f\x8b":
            with gzip.open(f) as gz:
                return gz.read()
        return f.read()


def read_sequences(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, sequence bytes as uint8 array) per record, in file order.

    Dispatches to the native C++ reader when available; falls back to the
    pure-Python parser below.
    """
    import os

    trace = os.environ.get("FASTANI_TRACE_READS")
    if trace:  # test hook: record which genome files this process parses
        with open(trace, "a") as tf:
            tf.write(path + "\n")
    from fastani_tpu import native

    lib = native.load_io_lib()
    if lib is not None:
        yield from _read_sequences_native(lib, path)
        return
    yield from read_sequences_py(path)


def _read_sequences_native(lib, path: str) -> Iterator[Tuple[str, np.ndarray]]:
    import ctypes

    h = lib.fai_read_file(path.encode())
    try:
        err = lib.fai_error(h)
        if err is not None:
            raise OSError(f"{path}: {err.decode()}")
        n = lib.fai_num_records(h)
        total = lib.fai_total_len(h)
        seq = np.empty(total, np.uint8)
        offsets = np.empty(n + 1, np.int64)
        if total:
            lib.fai_copy_seq(h, seq.ctypes.data_as(ctypes.c_void_p))
        lib.fai_copy_offsets(h, offsets.ctypes.data_as(ctypes.c_void_p))
        names = [lib.fai_name(h, i).decode("ascii", "replace") for i in range(n)]
    finally:
        lib.fai_free(h)
    for i, name in enumerate(names):
        yield name, seq[offsets[i]:offsets[i + 1]]


def read_sequences_py(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Pure-Python parser (fallback + oracle for the native reader)."""
    data = _open_bytes(path)
    n = len(data)
    i = 0
    # skip leading junk until first record marker (kseq does the same)
    while i < n and data[i] not in (0x3E, 0x40):  # '>' '@'
        i = data.find(b"\n", i)
        if i < 0:
            return
        i += 1
    while i < n:
        marker = data[i]
        eol = data.find(b"\n", i)
        if eol < 0:
            eol = n
        header = data[i + 1 : eol]
        # name = up to first whitespace
        for ws in (b" ", b"\t"):
            cut = header.find(ws)
            if cut >= 0:
                header = header[:cut]
        name = header.decode("ascii", "replace").strip("\r")
        i = eol + 1
        chunks: List[bytes] = []
        if marker == 0x3E:  # FASTA: read until next '>' or '@' at line start
            while i < n and data[i] not in (0x3E, 0x40):
                eol = data.find(b"\n", i)
                if eol < 0:
                    eol = n
                chunks.append(data[i:eol].rstrip(b"\r"))
                i = eol + 1
        else:  # FASTQ: one or more seq lines until '+', then skip qualities
            while i < n and data[i] != 0x2B:  # '+'
                eol = data.find(b"\n", i)
                if eol < 0:
                    eol = n
                chunks.append(data[i:eol].rstrip(b"\r"))
                i = eol + 1
            # skip the '+' line, then as many quality bytes as sequence bytes
            seq_len = sum(len(c) for c in chunks)
            eol = data.find(b"\n", i)
            i = n if eol < 0 else eol + 1
            qual = 0
            while i < n and qual < seq_len:
                eol = data.find(b"\n", i)
                if eol < 0:
                    eol = n
                qual += eol - i - (1 if data[eol - 1 : eol] == b"\r" else 0)
                i = eol + 1
        seq = np.frombuffer(b"".join(chunks), dtype=np.uint8)
        yield name, seq


def genome_length_for_ani(path: str, frag_len: int) -> int:
    """Genome length as counted for the minFraction gate.

    Mirrors cgi::computeGenomeLengths (computeCoreIdentity.hpp:48-92):
    contigs shorter than frag_len are excluded; others are truncated down to
    a multiple of frag_len.
    """
    total = 0
    for _, seq in read_sequences(path):
        l = len(seq)
        if l >= frag_len:
            total += (l // frag_len) * frag_len
    return total
