"""Synthetic genome generation + reference-oracle binary harness.

The reference checkout's real genome fixtures are git-lfs pointers (no
payload), so golden testing is done by building the reference binary from
/root/reference with a local incomplete-beta stand-in for GSL (tests/
gsl_cdf_shim.h — our own code) and comparing our pipeline's outputs against
it on deterministic synthetic genomes.
"""

from __future__ import annotations

import os
import pathlib
import subprocess

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

REF_SRC = "/root/reference/src"
ORACLE_DIR = pathlib.Path("/tmp/fastani_tpu_oracle")
ORACLE_BIN = ORACLE_DIR / "fastANI_oracle"
_SHIM = pathlib.Path(__file__).parent / "gsl_cdf_shim.h"


def random_genome(rng, length: int) -> np.ndarray:
    return _BASES[rng.integers(0, 4, length)]


def mutate_genome(rng, seq: np.ndarray, sub_rate: float = 0.02,
                  indel_rate: float = 0.0005, indel_max: int = 12) -> np.ndarray:
    """Point mutations + small indels, like diverged strains."""
    seq = seq.copy()
    n_sub = int(len(seq) * sub_rate)
    if n_sub:
        pos = rng.choice(len(seq), size=n_sub, replace=False)
        seq[pos] = _BASES[rng.integers(0, 4, n_sub)]
    if indel_rate > 0:
        parts = []
        cur = 0
        n_ind = int(len(seq) * indel_rate)
        cuts = np.sort(rng.choice(len(seq), size=n_ind, replace=False))
        for c in cuts:
            parts.append(seq[cur:c])
            if rng.random() < 0.5:
                parts.append(random_genome(rng, int(rng.integers(1, indel_max))))
                cur = c
            else:
                cur = min(len(seq), c + int(rng.integers(1, indel_max)))
        parts.append(seq[cur:])
        seq = np.concatenate(parts)
    return seq


def write_fasta(path: str, contigs, line_width: int = 70) -> None:
    with open(path, "wb") as f:
        for name, seq in contigs:
            f.write(b">" + name.encode() + b"\n")
            b = seq.tobytes()
            for i in range(0, len(b), line_width):
                f.write(b[i : i + line_width] + b"\n")


def write_fasta_gz(path: str, contigs, line_width: int = 70) -> None:
    """Gzipped FASTA (kseq.h reads via gzFile; plain files pass through)."""
    import gzip
    import io

    buf = io.BytesIO()
    for name, seq in contigs:
        buf.write(b">" + name.encode() + b"\n")
        b = seq.tobytes()
        for i in range(0, len(b), line_width):
            buf.write(b[i : i + line_width] + b"\n")
    with gzip.open(path, "wb") as f:
        f.write(buf.getvalue())


def write_fastq(path: str, contigs, gz: bool = False) -> None:
    """FASTQ records (one per contig, constant quality); kseq.h parses
    FASTA and FASTQ through the same state machine."""
    import gzip

    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        for name, seq in contigs:
            b = seq.tobytes()
            f.write(b"@" + name.encode() + b"\n")
            f.write(b + b"\n+\n")
            f.write(b"I" * len(b) + b"\n")


def ensure_oracle() -> str:
    """Build the reference binary (out of tree) once; returns its path."""
    if ORACLE_BIN.exists():
        return str(ORACLE_BIN)
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    gsl_dir = ORACLE_DIR / "gsl"
    gsl_dir.mkdir(exist_ok=True)
    shim = _SHIM.read_text()
    (gsl_dir / "gsl_cdf.h").write_text(shim)
    cmd = [
        "g++", "-O2", "-std=c++11", "-fopenmp",
        "-I", REF_SRC, "-I", str(ORACLE_DIR),
        "-o", str(ORACLE_BIN),
        f"{REF_SRC}/cgi/core_genome_identity.cpp", f"{REF_SRC}/cgi/main.cpp",
        "-lz", "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return str(ORACLE_BIN)


def run_oracle(workdir: str, args) -> None:
    subprocess.run([ensure_oracle()] + list(args), cwd=workdir, check=True,
                   capture_output=True)
