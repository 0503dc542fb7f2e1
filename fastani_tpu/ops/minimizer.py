"""Winnowed-minimizer extraction.

Replicates the reference's streaming deque winnowing
(reference: src/map/include/commonFunc.hpp:92-167) with a data-parallel
formulation suited to TPUs:

The C++ algorithm, restated declaratively (proved equivalent; unit tests
compare against a literal deque model):

* position i in [0, L-k] is *valid* iff hash(fwd kmer) != hash(revcomp kmer)
  (symmetric k-mers are skipped entirely — including the emission check);
* canonical hash h[i] = min(fwd, bwd) as uint32;
* at each valid i >= w-1 (an *event*), the selected position p(i) is the
  RIGHTMOST argmin of h over valid positions in [i-w+1, i] (the deque's
  back-pop uses >=, so equal minima resolve to the newest position);
* a minimizer (h[p(i)], seqId, wpos=i-w+1) is emitted exactly when p(i)
  differs from p at the previous event (or at the first event of the
  sequence): the reference's "save if we are seeing it for first time"
  dedupe against minimizerIndex.back().

The windowed argmin uses the blocked prefix/suffix (two-stacks) scheme:
O(n) work, fully vectorized — the same recurrence as the parallel
sliding-window-sum construction (Zhang et al., arXiv:1811.10074).
"""

from __future__ import annotations

from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastani_tpu.ops import hashing

_U32 = jnp.uint32
_UMAX = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Literal deque model (oracle; mirrors commonFunc.hpp:92-167 step by step)
# ---------------------------------------------------------------------------

def winnow_model(seq: np.ndarray, k: int, w: int, seq_id: int = 0):
    """Exact scalar model. Returns (hash u32[], wpos i32[]) arrays."""
    seq = hashing.upper_np(np.asarray(seq, dtype=np.uint8))
    L = len(seq)
    out_h, out_w = [], []
    if L - k + 1 <= 0:
        return np.array(out_h, np.uint32), np.array(out_w, np.int32)
    rev = hashing.revcomp_np(seq)
    hf = hashing.kmer_hashes_np(seq, k)
    hb_arr = hashing.kmer_hashes_np(rev, k)

    q = deque()  # entries: [hash, push_pos, wpos] (wpos mutated on emit)
    last_emitted = None
    for i in range(L - k + 1):
        cwid = i - w + 1
        fwd = hf[i]
        bwd = hb_arr[L - i - k]
        if fwd == bwd:
            continue
        cur = min(fwd, bwd)
        while q and q[0][1] <= i - w:
            q.popleft()
        while q and q[-1][0] >= cur:
            q.pop()
        q.append([cur, i, -1])
        if cwid >= 0:
            front = q[0]
            triple = (int(front[0]), seq_id, int(front[2]))
            if last_emitted is None or triple != last_emitted:
                front[2] = cwid
                out_h.append(int(front[0]))
                out_w.append(cwid)
                last_emitted = (int(front[0]), seq_id, cwid)
    return np.array(out_h, np.uint32), np.array(out_w, np.int32)


# ---------------------------------------------------------------------------
# Vectorized JAX kernel
# ---------------------------------------------------------------------------

def _sliding_argmin(key_h, key_p, w: int):
    """win[i] = lexicographic (hash asc, pos desc) min over
    [max(0, i-w+1), i].  Sparse-table doubling — static shifts only, no
    scans or gathers (those compile 50-100x slower on XLA:TPU)."""
    from fastani_tpu.ops.xputils import sliding_pairmin

    return sliding_pairmin(jnp, key_h, key_p, w)


def winnow_dense(seq_u8, k: int, w: int, true_len):
    """Dense winnowing of one (possibly padded) sequence row.

    seq_u8: (Lp,) uint8, uppercased bytes (pad arbitrary).
    true_len: scalar (traced ok) — actual sequence length <= Lp.

    Returns (emit bool[n], hash u32[n], wpos i32[n]) with n = Lp-k+1;
    emitted minimizers are at emit positions, hash = canonical hash of the
    selected argmin position, wpos = i-w+1.
    """
    Lp = seq_u8.shape[0]
    n = Lp - k + 1
    hf = hashing.kmer_hashes_jax(seq_u8, k)
    hb = hashing.kmer_hashes_jax(hashing.revcomp_jax(seq_u8), k)[::-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = (hf != hb) & (idx <= true_len - k)
    h = jnp.minimum(hf, hb)

    key_h = jnp.where(valid, h, _UMAX)
    key_p = jnp.where(valid, idx, -1)
    win_h, win_p = _sliding_argmin(key_h, key_p, w)

    event = valid & (idx >= w - 1)
    # emit-on-change vs the previous event's selection, via shift-based
    # last-event propagation (no scans/gathers)
    from fastani_tpu.ops.xputils import last_event_value

    last_sel, _ = last_event_value(jnp, event, win_p, jnp.int32(-2))
    prev_sel = jnp.concatenate([jnp.full((1,), -2, jnp.int32), last_sel[:-1]])
    emit = event & (win_p != prev_sel)
    out_h = win_h
    out_w = idx - (w - 1)
    return emit, out_h, out_w


def winnow_chunk_kernel(seq_u8, base, carry_sel, carry_has, true_len, k: int, w: int):
    """Fixed-shape winnowing of one chunk with exact cross-chunk carry.

    seq_u8: (halo + CH + k - 1,) bytes where halo = w-1; covers global
    positions [base - halo, base + CH + k - 1).  Emits minimizers for the CH
    global positions [base, base + CH).

    carry_sel / carry_has: the previous chunk's last-event selected position
    (global) — the emit-on-change rule crosses chunk boundaries through it.
    true_len: total sequence length (masks the tail).
    Returns (emit (CH,), hash (CH,), wpos (CH,), new_carry_sel, new_carry_has).
    """
    halo = w - 1
    n = seq_u8.shape[0] - k + 1          # local kmer positions
    hf = hashing.kmer_hashes_jax(seq_u8, k)
    hb = hashing.kmer_hashes_jax(hashing.revcomp_jax(seq_u8), k)[::-1]
    lidx = jnp.arange(n, dtype=jnp.int32)
    gidx = lidx + (base - halo)          # global positions
    valid = (hf != hb) & (gidx >= 0) & (gidx <= true_len - k)
    h = jnp.minimum(hf, hb)
    key_h = jnp.where(valid, h, _UMAX)
    key_p = jnp.where(valid, gidx, -1)
    win_h, win_p = _sliding_argmin(key_h, key_p, w)

    # only the CH main rows (local index >= halo) are events: halo rows have
    # truncated windows (their win_p is wrong) and are covered by the carry
    event = valid & (gidx >= w - 1) & (lidx >= halo)
    from fastani_tpu.ops.xputils import last_event_value

    # rows with no in-chunk predecessor seed from the carry
    seed = jnp.where(carry_has, carry_sel, -2).astype(jnp.int32)
    last_sel, _ = last_event_value(jnp, event, win_p, seed)
    prev_sel = jnp.concatenate([seed.reshape(1), last_sel[:-1]])
    emit = event & (win_p != prev_sel)

    out_emit = emit[halo:]
    out_h = win_h[halo:]
    out_w = (gidx - (w - 1))[halo:]

    # carry out: selection at the last event seen so far (seed if none)
    new_sel = last_sel[-1]
    new_has = event.any() | carry_has
    return out_emit, out_h, out_w, new_sel, new_has


_CHUNK = 1 << 20

# Host-build kernels are pinned to the in-process CPU backend: the index
# build is a host pipeline (read -> winnow -> compact) and the session TPU
# sits behind a tunnel whose device->host link runs at ~1 MB/s, so pulling
# dense per-position winnowing output off the TPU costs far more than the
# compute.  The device-resident build (index stays in HBM) uses the same
# kernels via the mapping path instead.


def _host_backend() -> str:
    import jax

    try:
        jax.devices("cpu")
        return "cpu"
    except RuntimeError:
        return jax.default_backend()


_jit_cache = {}


def _host_jit(fn, static_argnums):
    """jax.jit on the CPU backend, resolved lazily (first call)."""
    key = fn.__name__
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(fn, static_argnums=static_argnums,
                                  backend=_host_backend())
    return _jit_cache[key]


def _winnow_chunk_jit(seq, base, carry_sel, carry_has, true_len, k, w):
    return _host_jit(winnow_chunk_kernel, (5, 6))(
        seq, base, carry_sel, carry_has, true_len, k, w)


def winnow_sequence_chunked(seq: np.ndarray, k: int, w: int,
                            chunk: int = _CHUNK):
    """Host driver: fixed-shape chunked winnowing (one compile per (k,w))."""
    seq = hashing.upper_np(np.asarray(seq, dtype=np.uint8))
    L = len(seq)
    if L - k + 1 <= 0 or L < w:
        return np.array([], np.uint32), np.array([], np.int32)
    halo = w - 1
    width = halo + chunk + k - 1
    carry_sel, carry_has = np.int32(-2), False
    outs_h, outs_w = [], []
    for base in range(0, L, chunk):
        buf = np.zeros(width, np.uint8)
        lo = base - halo
        src_lo = max(lo, 0)
        src_hi = min(base + chunk + k - 1, L)
        buf[src_lo - lo : src_hi - lo] = seq[src_lo:src_hi]
        emit, h, wp, carry_sel, carry_has = _winnow_chunk_jit(
            jnp.asarray(buf), base, carry_sel, carry_has, L, k, w)
        emit = np.asarray(emit)
        outs_h.append(np.asarray(h)[emit])
        outs_w.append(np.asarray(wp)[emit])
        carry_sel = int(carry_sel)
        carry_has = bool(carry_has)
    return np.concatenate(outs_h), np.concatenate(outs_w)


def _bucket_len(L: int) -> int:
    """Pad lengths into coarse buckets so jit compiles once per bucket, not
    once per contig length."""
    if L <= 4096:
        return 4096
    b = 1 << (L - 1).bit_length()  # next power of two
    # refine to quarters of the power of two to bound padding waste at 25%
    for frac in (b // 2 + b // 8, b // 2 + b // 4, b // 2 + 3 * b // 8):
        if L <= frac:
            return frac
    return b


def winnow_sequence_np(seq: np.ndarray, k: int, w: int):
    """Host path: vectorized winnowing of one contig via the JAX kernel,
    compacted to (hash, wpos) numpy arrays.

    Short contigs use a size-bucketed single-shot kernel; long ones the
    fixed-shape chunked kernel (one compile per (k, w) regardless of
    genome sizes)."""
    seq = hashing.upper_np(np.asarray(seq, dtype=np.uint8))
    L = len(seq)
    if L - k + 1 <= 0 or L < w:
        return np.array([], np.uint32), np.array([], np.int32)
    if L > 65536:
        return winnow_sequence_chunked(seq, k, w)
    Lp = _bucket_len(L)
    padded = np.zeros(Lp, dtype=np.uint8)
    padded[:L] = seq
    emit, h, wpos = _winnow_jit(jnp.asarray(padded), k, w, L)
    emit = np.asarray(emit)
    return np.asarray(h)[emit], np.asarray(wpos)[emit]


def _winnow_jit(seq, k, w, true_len):
    return _host_jit(winnow_dense, (1, 2))(seq, k, w, true_len)
