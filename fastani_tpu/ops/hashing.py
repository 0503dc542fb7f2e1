"""Vectorized MurmurHash3 x64_128 (low 32 bits) for k-mer hashing.

The reference hashes each k-mer's raw ASCII bytes with MurmurHash3_x64_128
(seed 42) and keeps the low 32 bits of h1 (reference:
src/map/include/commonFunc.hpp:71-81, src/common/murmur3.h x64_128 variant).
Since k <= 16, every k-mer is at most one 16-byte block: len==16 exercises
the single body round, len<16 only the tail round — both fully vectorizable.

Two implementations with identical semantics:

* NumPy (native uint64) — host-side oracle + index building fallback.
* JAX (uint32 hi/lo pairs) — device kernels.  TPUs have no native 64-bit
  integer path, so u64 arithmetic is spelled out in uint32 ops (the same
  decomposition XLA would emit, but kept explicit and minimal).

This is a fresh implementation of the public MurmurHash3 algorithm
(public-domain, Austin Appleby); nothing is copied from the reference tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SEED = 42  # commonFunc.hpp:32

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)


# ---------------------------------------------------------------------------
# NumPy implementation (native u64)
# ---------------------------------------------------------------------------

def _rotl64_np(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> np.uint64(64 - r))


def _fmix64_np(h):
    h ^= h >> np.uint64(33)
    h *= _F1
    h ^= h >> np.uint64(33)
    h *= _F2
    h ^= h >> np.uint64(33)
    return h


def _pack_le_np(b: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Little-endian pack bytes b[..., lo:hi] into u64 (missing bytes = 0)."""
    out = np.zeros(b.shape[:-1], dtype=np.uint64)
    n = b.shape[-1]
    for j in range(lo, min(hi, n)):
        out |= b[..., j].astype(np.uint64) << np.uint64(8 * (j - lo))
    return out


def murmur3_low32_np(keys: np.ndarray, length: int, seed: int = SEED) -> np.ndarray:
    """Low 32 bits of MurmurHash3_x64_128 over the last axis (length<=16)."""
    assert 1 <= length <= 16
    keys = np.asarray(keys, dtype=np.uint8)[..., :length]
    with np.errstate(over="ignore"):
        h1 = np.full(keys.shape[:-1], np.uint64(seed))
        h2 = np.full(keys.shape[:-1], np.uint64(seed))
        if length == 16:
            k1 = _pack_le_np(keys, 0, 8)
            k2 = _pack_le_np(keys, 8, 16)
            k1 *= _C1
            k1 = _rotl64_np(k1, 31)
            k1 *= _C2
            h1 ^= k1
            h1 = _rotl64_np(h1, 27)
            h1 += h2
            h1 = h1 * _M5 + _A1
            k2 *= _C2
            k2 = _rotl64_np(k2, 33)
            k2 *= _C1
            h2 ^= k2
            h2 = _rotl64_np(h2, 31)
            h2 += h1
            h2 = h2 * _M5 + _A2
        else:
            if length > 8:
                k2 = _pack_le_np(keys, 8, 16)
                k2 *= _C2
                k2 = _rotl64_np(k2, 33)
                k2 *= _C1
                h2 ^= k2
            k1 = _pack_le_np(keys, 0, 8)
            k1 *= _C1
            k1 = _rotl64_np(k1, 31)
            k1 *= _C2
            h1 ^= k1
        ln = np.uint64(length)
        h1 ^= ln
        h2 ^= ln
        h1 += h2
        h2 += h1
        h1 = _fmix64_np(h1)
        h2 = _fmix64_np(h2)
        h1 += h2
        h2 += h1
    return (h1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def kmer_hashes_np(seq: np.ndarray, k: int, seed: int = SEED) -> np.ndarray:
    """Hashes of all k-mers of a byte sequence: out[i] = H(seq[i:i+k])."""
    seq = np.asarray(seq, dtype=np.uint8)
    n = seq.shape[-1] - k + 1
    if n <= 0:
        return np.zeros(seq.shape[:-1] + (0,), dtype=np.uint32)
    windows = np.lib.stride_tricks.sliding_window_view(seq, k, axis=-1)
    return murmur3_low32_np(windows, k, seed)


# ---------------------------------------------------------------------------
# JAX implementation (u32 hi/lo pairs)
# ---------------------------------------------------------------------------

_U32 = jnp.uint32


def _split(c: np.uint64):
    c = int(c)
    return (_U32(c >> 32), _U32(c & 0xFFFFFFFF))


def _umulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 vectors."""
    a0 = a & _U32(0xFFFF)
    a1 = a >> _U32(16)
    b0 = b & _U32(0xFFFF)
    b1 = b >> _U32(16)
    lo_lo = a0 * b0
    mid1 = a1 * b0 + (lo_lo >> _U32(16))
    mid2 = a0 * b1 + (mid1 & _U32(0xFFFF))
    return a1 * b1 + (mid1 >> _U32(16)) + (mid2 >> _U32(16))


def _mul64(ahi, alo, bhi, blo):
    lo = alo * blo
    hi = _umulhi32(alo, blo) + alo * bhi + ahi * blo
    return hi, lo


def _mulc64(ahi, alo, c: np.uint64):
    chi, clo = _split(c)
    return _mul64(ahi, alo, chi, clo)


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(_U32)
    return ahi + bhi + carry, lo


def _xor64(ahi, alo, bhi, blo):
    return ahi ^ bhi, alo ^ blo


def _rotl64(hi, lo, r: int):
    if r == 32:
        return lo, hi
    if r > 32:
        hi, lo = lo, hi
        r -= 32
    rr = _U32(r)
    ri = _U32(32 - r)
    return (hi << rr) | (lo >> ri), (lo << rr) | (hi >> ri)


def _shr64(hi, lo, r: int):
    if r == 32:
        return jnp.zeros_like(hi), hi
    if r > 32:
        return jnp.zeros_like(hi), hi >> _U32(r - 32)
    rr = _U32(r)
    ri = _U32(32 - r)
    return hi >> rr, (lo >> rr) | (hi << ri)


def _fmix64(hi, lo):
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 33))
    hi, lo = _mulc64(hi, lo, _F1)
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 33))
    hi, lo = _mulc64(hi, lo, _F2)
    hi, lo = _xor64(hi, lo, *_shr64(hi, lo, 33))
    return hi, lo


def _mul5_add(hi, lo, addend: np.uint64):
    """h*5 + addend in u64, via h*5 = (h << 2) + h."""
    shi = (hi << _U32(2)) | (lo >> _U32(30))
    slo = lo << _U32(2)
    hi5, lo5 = _add64(shi, slo, hi, lo)
    ahi, alo = _split(addend)
    return _add64(hi5, lo5, ahi, alo)


def murmur3_low32_block16(w1hi, w1lo, w2hi, w2lo, seed: int = SEED):
    """Low 32 bits of murmur3 x64_128 for exactly-16-byte keys.

    Inputs are the two little-endian u64 words of the key as uint32 hi/lo
    arrays (any broadcastable shape).  This is the hot path for k=16.
    """
    shi = _U32(0)
    slo = _U32(seed)
    h1hi = jnp.broadcast_to(shi, w1lo.shape).astype(_U32)
    h1lo = jnp.broadcast_to(slo, w1lo.shape).astype(_U32)
    h2hi, h2lo = h1hi, h1lo

    k1hi, k1lo = _mulc64(w1hi, w1lo, _C1)
    k1hi, k1lo = _rotl64(k1hi, k1lo, 31)
    k1hi, k1lo = _mulc64(k1hi, k1lo, _C2)
    h1hi, h1lo = _xor64(h1hi, h1lo, k1hi, k1lo)
    h1hi, h1lo = _rotl64(h1hi, h1lo, 27)
    h1hi, h1lo = _add64(h1hi, h1lo, h2hi, h2lo)
    h1hi, h1lo = _mul5_add(h1hi, h1lo, _A1)

    k2hi, k2lo = _mulc64(w2hi, w2lo, _C2)
    k2hi, k2lo = _rotl64(k2hi, k2lo, 33)
    k2hi, k2lo = _mulc64(k2hi, k2lo, _C1)
    h2hi, h2lo = _xor64(h2hi, h2lo, k2hi, k2lo)
    h2hi, h2lo = _rotl64(h2hi, h2lo, 31)
    h2hi, h2lo = _add64(h2hi, h2lo, h1hi, h1lo)
    h2hi, h2lo = _mul5_add(h2hi, h2lo, _A2)

    return _finalize(h1hi, h1lo, h2hi, h2lo, 16)


def murmur3_low32_tail(w1hi, w1lo, w2hi, w2lo, length: int, seed: int = SEED):
    """Low 32 bits for keys of length < 16 (tail-only path)."""
    h1hi = jnp.zeros_like(w1lo)
    h1lo = jnp.full_like(w1lo, _U32(seed))
    h2hi, h2lo = h1hi, h1lo
    if length > 8:
        k2hi, k2lo = _mulc64(w2hi, w2lo, _C2)
        k2hi, k2lo = _rotl64(k2hi, k2lo, 33)
        k2hi, k2lo = _mulc64(k2hi, k2lo, _C1)
        h2hi, h2lo = _xor64(h2hi, h2lo, k2hi, k2lo)
    k1hi, k1lo = _mulc64(w1hi, w1lo, _C1)
    k1hi, k1lo = _rotl64(k1hi, k1lo, 31)
    k1hi, k1lo = _mulc64(k1hi, k1lo, _C2)
    h1hi, h1lo = _xor64(h1hi, h1lo, k1hi, k1lo)
    return _finalize(h1hi, h1lo, h2hi, h2lo, length)


def _finalize(h1hi, h1lo, h2hi, h2lo, length: int):
    h1lo = h1lo ^ _U32(length)
    h2lo = h2lo ^ _U32(length)
    h1hi, h1lo = _add64(h1hi, h1lo, h2hi, h2lo)
    h2hi, h2lo = _add64(h2hi, h2lo, h1hi, h1lo)
    h1hi, h1lo = _fmix64(h1hi, h1lo)
    h2hi, h2lo = _fmix64(h2hi, h2lo)
    h1hi, h1lo = _add64(h1hi, h1lo, h2hi, h2lo)
    return h1lo


def pack_kmer_words(seq_u32, k: int, n_out: int):
    """Build the two LE u64 words (as u32 hi/lo) for every k-mer position.

    seq_u32: (L,) uint32 array of byte values; returns four (n_out,) arrays
    (w1hi, w1lo, w2hi, w2lo) where position i packs seq[i:i+k].
    """
    z = jnp.zeros(n_out, dtype=_U32)
    w1lo, w1hi, w2lo, w2hi = z, z, z, z
    for j in range(min(k, 16)):
        b = jax_dynamic_byte(seq_u32, j, n_out)
        sh = _U32(8 * (j % 4))
        v = b << sh
        if j < 4:
            w1lo = w1lo | v
        elif j < 8:
            w1hi = w1hi | v
        elif j < 12:
            w2lo = w2lo | v
        else:
            w2hi = w2hi | v
    return w1hi, w1lo, w2hi, w2lo


def jax_dynamic_byte(seq_u32, j: int, n_out: int):
    return jax.lax.dynamic_slice_in_dim(seq_u32, j, n_out).astype(_U32)


def kmer_hashes_jax(seq_u8, k: int, seed: int = SEED):
    """JAX: hashes of all k-mers; seq_u8 is a (L,) uint8 array, L >= k.

    Returns (L-k+1,) uint32.  Use jax.vmap for batches of equal-length rows.
    """
    seq_u32 = seq_u8.astype(_U32)
    n_out = seq_u8.shape[-1] - k + 1
    w1hi, w1lo, w2hi, w2lo = pack_kmer_words(seq_u32, k, n_out)
    if k == 16:
        return murmur3_low32_block16(w1hi, w1lo, w2hi, w2lo, seed)
    return murmur3_low32_tail(w1hi, w1lo, w2hi, w2lo, k, seed)


# ---------------------------------------------------------------------------
# Reverse complement (byte-level, matching commonFunc.hpp:37-54: A<->T,
# C<->G, all other bytes unchanged)
# ---------------------------------------------------------------------------

_RC_TABLE = np.arange(256, dtype=np.uint8)
_RC_TABLE[ord("A")] = ord("T")
_RC_TABLE[ord("T")] = ord("A")
_RC_TABLE[ord("C")] = ord("G")
_RC_TABLE[ord("G")] = ord("C")

def _rc_table_j():
    # built per call, never cached: a module-level jnp.asarray would
    # initialize the XLA backend at import time (breaking
    # jax.distributed.initialize ordering), and caching the first result
    # would leak a tracer when first touched inside a jit trace
    return jnp.asarray(_RC_TABLE)


def revcomp_np(seq: np.ndarray) -> np.ndarray:
    return _RC_TABLE[np.asarray(seq, dtype=np.uint8)][..., ::-1]


def revcomp_jax(seq_u8):
    return _rc_table_j()[seq_u8][..., ::-1]


_UPPER_TABLE = np.arange(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    _UPPER_TABLE[_c] = _c - 32
def _upper_table_j():
    return jnp.asarray(_UPPER_TABLE)


def upper_np(seq: np.ndarray) -> np.ndarray:
    """Uppercase fixup matching makeUpperCase (commonFunc.hpp:57-66)."""
    return _UPPER_TABLE[np.asarray(seq, dtype=np.uint8)]


def upper_jax(seq_u8):
    return _upper_table_j()[seq_u8]


# ---------------------------------------------------------------------------
# 2-bit sequence packing for host->device transfer
#
# The tunneled TPU's H2D path runs at ~39 MB/s (sync mode), so sequence
# bytes dominate upload time; pure-ACGT sequences pack 4 bases/byte on
# host and unpack on device (VPU-trivial), a 4x H2D cut.  Only applies
# to uppercased pure-ACGT data — any other byte (N, IUPAC) must hash
# as its raw value (commonFunc.hpp:71-81), so callers check
# is_pure_acgt() and fall back to raw upload otherwise.
# ---------------------------------------------------------------------------

_PACK_CODE = np.zeros(256, np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _PACK_CODE[_b] = _i
_ACGT_SET = np.zeros(256, bool)
for _b in b"ACGT":
    _ACGT_SET[_b] = True


def is_pure_acgt(seq: np.ndarray) -> bool:
    """True iff every byte is uppercase A/C/G/T (packable)."""
    return bool(_ACGT_SET[np.asarray(seq, np.uint8)].all())


def pack2_np(rows: np.ndarray) -> np.ndarray:
    """(..., W) uint8 ASCII -> (..., W//4) uint8, 4 bases per byte
    (little-endian within the byte).  W must be a multiple of 4;
    non-ACGT bytes (including zero pads) pack as code 0 ('A')."""
    codes = _PACK_CODE[np.asarray(rows, np.uint8)]
    c = codes.reshape(rows.shape[:-1] + (-1, 4))
    return (c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4)
            | (c[..., 3] << 6)).astype(np.uint8)


def unpack2_jax(packed):
    """Device inverse of pack2_np: (..., W//4) uint8 -> (..., W) uint8
    ASCII over the 'ACGT' alphabet (code 0 -> 'A': callers masking pad
    regions do so with position arithmetic, not byte values)."""
    sh = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    codes = (packed[..., None] >> sh) & jnp.uint8(3)
    lut = jnp.asarray(np.frombuffer(b"ACGT", np.uint8))
    out = lut[codes]
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 4,))
