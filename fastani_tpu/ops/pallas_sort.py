"""Pallas bitonic row-sort for uint32 keys.

XLA:TPU's variadic sort runs at ~50-100 M elements/s and dominates the
mapping pipeline (L1 hit sort, sketch sort, L2 event merge).  Rows here
are independent power-of-two-width sorts, which a bitonic network does
entirely in VMEM: the XOR-distance compare-exchange is two lane/sublane
rolls plus selects (`pallas_winnow._shift`), ~10 vector ops per element
per stage, n·log²(n)/2 stages — a (512, 4096) sort prices at well under
a millisecond.

Determinism note: bitonic networks are not stable.  Callers that need a
stable order pack a tie-breaking index into the key (all in-repo call
sites either sort pure values, where ties are interchangeable, or pack
`(flag << B) | position` keys, which are unique).
"""

from __future__ import annotations

import functools

import numpy as np

from fastani_tpu.ops.pallas_winnow import _shift, pallas_mode

_MAX_LANES = 2048          # per-block lane width (VMEM budget)


def _sort_block_kernel(n: int, w8: int, x_ref, o_ref):
    """Sort each n-aligned row inside one (8, w8) block, ascending u32."""
    import jax
    import jax.numpy as jnp

    y = x_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 0)
    flat = row8 * w8 + col
    cn = flat & (n - 1)                      # index within the row
    n_flat = 8 * w8
    zero = jnp.uint32(0)

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up = (cn & j) == 0
            pu = _shift(y, -j, zero, col, flat, n_flat, w8)
            pd = _shift(y, j, zero, col, flat, n_flat, w8)
            p = jnp.where(up, pu, pd)
            c = y < p
            mn = jnp.where(c, y, p)
            mx = jnp.where(c, p, y)
            asc = (cn & k) == 0
            y = jnp.where(up == asc, mn, mx)
            j //= 2
        k *= 2
    o_ref[0] = y


@functools.lru_cache(maxsize=None)
def _sort_call(n: int, blocks: int, m: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w8 = m * n // 8
    kern = functools.partial(_sort_block_kernel, n, w8)
    spec = pl.BlockSpec((1, 8, w8), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((blocks, 8, w8), jnp.uint32),
        interpret=interpret,
    )


def sort_rows_u32(x, interpret: bool = None):
    """Ascending per-row sort of a (R, n) uint32 array; n a power of two,
    n in [1024, 32768].  Returns the sorted array (same shape/dtype).

    Rows wider than 8 * _MAX_LANES get one row per block ((8, n/8)
    layout); the n*log^2(n)/2 compare-exchange network stays VMEM-resident
    either way."""
    import jax.numpy as jnp

    R, n = x.shape
    assert n & (n - 1) == 0 and 1024 <= n <= 32768, n
    if interpret is None:
        use, interpret = pallas_mode()
        assert use, "sort_rows_u32 called without a Pallas backend"
    m = max(1, (8 * _MAX_LANES) // n)        # rows per block
    Rp = -(-R // m) * m
    xin = x.astype(jnp.uint32)
    if Rp > R:
        xin = jnp.concatenate(
            [xin, jnp.full((Rp - R, n), jnp.uint32(0xFFFFFFFF))])
    out = _sort_call(n, Rp // m, m, interpret)(xin.reshape(Rp // m, 8,
                                                           m * n // 8))
    return out.reshape(Rp, n)[:R]


def use_pallas_sort(xp_is_jax: bool, n: int) -> bool:
    """True when the Pallas row-sort applies (jax + TPU/interpret + pow2)."""
    if not xp_is_jax or n & (n - 1) or not (1024 <= n <= 32768):
        return False
    return pallas_mode()[0]


# ---------------------------------------------------------------------------
# Key-value variant: one u32 payload rides the compare-exchange network
# ---------------------------------------------------------------------------

def _sort_kv_block_kernel(n: int, w8: int, x_ref, p_ref, o_ref, q_ref):
    """Sort each n-aligned row by key ascending; payload follows the key.

    Keys must be unique per row for a deterministic payload permutation
    (bitonic networks are unstable under ties) — all in-repo callers pack
    position/code bits into the key.
    """
    import jax
    import jax.numpy as jnp

    y = x_ref[0]
    v = p_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 0)
    flat = row8 * w8 + col
    cn = flat & (n - 1)
    n_flat = 8 * w8
    zero = jnp.uint32(0)

    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            up = (cn & j) == 0
            pu = _shift(y, -j, zero, col, flat, n_flat, w8)
            pd = _shift(y, j, zero, col, flat, n_flat, w8)
            vu = _shift(v, -j, zero, col, flat, n_flat, w8)
            vd = _shift(v, j, zero, col, flat, n_flat, w8)
            p = jnp.where(up, pu, pd)
            q = jnp.where(up, vu, vd)
            c = y < p
            asc = (cn & k) == 0
            # want ~c when up==asc else c  ==  (up == asc) XOR c
            # (xor keeps everything i1; a where() on bool operands trips
            # Mosaic's i8->i1 truncation)
            take_other = (up == asc) ^ c
            y = jnp.where(take_other, p, y)
            v = jnp.where(take_other, q, v)
            j //= 2
        k *= 2
    o_ref[0] = y
    q_ref[0] = v


@functools.lru_cache(maxsize=None)
def _sort_kv_call(n: int, blocks: int, m: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w8 = m * n // 8
    kern = functools.partial(_sort_kv_block_kernel, n, w8)
    spec = pl.BlockSpec((1, 8, w8), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((blocks, 8, w8), jnp.uint32),
                   jax.ShapeDtypeStruct((blocks, 8, w8), jnp.uint32)),
        interpret=interpret,
    )


def sort_rows_u32_kv(x, payload, interpret: bool = None,
                     debug_check_unique: bool = False):
    """Ascending per-row key sort of (R, n) uint32 `x`, with a uint32
    `payload` permuted alongside.  Returns (sorted_keys, permuted_payload).

    KEYS MUST BE ROW-UNIQUE for a deterministic payload permutation: on a
    key tie both compare-exchange partners take the same side, so one
    payload is duplicated and the other dropped.  In-repo callers either
    pack position/code bits into the key (row-unique by construction) or
    mask tied (clamped/pad) payloads downstream.  New callers can pass
    debug_check_unique=True to assert uniqueness of the real (non-pad)
    keys eagerly (host fetch — debug only, never on a hot path).
    """
    import jax.numpy as jnp

    if debug_check_unique:
        import numpy as _np

        hk = _np.asarray(x, dtype=_np.uint32)
        for r, row in enumerate(hk):
            real = row[row != _np.uint32(0xFFFFFFFF)]
            if len(_np.unique(real)) != len(real):
                raise AssertionError(
                    f"sort_rows_u32_kv: duplicate non-pad keys in row {r}")

    R, n = x.shape
    assert n & (n - 1) == 0 and 1024 <= n <= 32768, n
    if interpret is None:
        use, interpret = pallas_mode()
        assert use, "sort_rows_u32_kv called without a Pallas backend"
    m = max(1, (4 * _MAX_LANES) // n)        # rows per block (2 arrays)
    Rp = -(-R // m) * m
    xin = x.astype(jnp.uint32)
    pin = payload.astype(jnp.uint32)
    if Rp > R:
        xin = jnp.concatenate(
            [xin, jnp.full((Rp - R, n), jnp.uint32(0xFFFFFFFF))])
        pin = jnp.concatenate([pin, jnp.zeros((Rp - R, n), jnp.uint32)])
    ko, po = _sort_kv_call(n, Rp // m, m, interpret)(
        xin.reshape(Rp // m, 8, m * n // 8),
        pin.reshape(Rp // m, 8, m * n // 8))
    return ko.reshape(Rp, n)[:R], po.reshape(Rp, n)[:R]
