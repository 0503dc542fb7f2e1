"""Native (C++) runtime components.

The reference is pure C++ (SURVEY.md §2); the TPU build keeps compute on
XLA/Pallas but implements host-runtime pieces natively too.  Currently:

* ``io_reader`` — kseq-analog FASTA/FASTQ(.gz) parser returning dense
  (bytes, offsets, names) arrays (reference: src/common/kseq.h).

Shared objects are compiled on first use with g++ (no pip deps) and cached
next to the sources; loading failures degrade gracefully to the pure-Python
paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-lz", "-o", out]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=240)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        print(f"fastani_tpu.native: build failed:\n{r.stderr.decode()[:2000]}",
              file=sys.stderr)
        return False
    return True


def load_io_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native IO library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FASTANI_TPU_NO_NATIVE"):
            return None
        src = os.path.join(_DIR, "io_reader.cpp")
        so = os.path.join(_DIR, "_io_reader.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            # build into a temp file then rename (atomic wrt other processes)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            if not _build(src, tmp):
                os.unlink(tmp)
                return None
            os.replace(tmp, so)
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fai_read_file.restype = ctypes.c_void_p
        lib.fai_read_file.argtypes = [ctypes.c_char_p]
        lib.fai_error.restype = ctypes.c_char_p
        lib.fai_error.argtypes = [ctypes.c_void_p]
        lib.fai_num_records.restype = ctypes.c_int64
        lib.fai_num_records.argtypes = [ctypes.c_void_p]
        lib.fai_total_len.restype = ctypes.c_int64
        lib.fai_total_len.argtypes = [ctypes.c_void_p]
        lib.fai_copy_seq.restype = None
        lib.fai_copy_seq.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fai_copy_offsets.restype = None
        lib.fai_copy_offsets.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fai_name.restype = ctypes.c_char_p
        lib.fai_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fai_free.restype = None
        lib.fai_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB
