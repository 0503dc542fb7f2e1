"""Sub-op timings for the L1/L2 hot paths, with candidate optimizations,
on the bench shapes (512-fragment batch, 1M-entry padded index)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    M = 1 << 20
    F, scap, hits_cap = 512, 384, 4096

    occ = jnp.asarray(np.sort(rng.integers(0, 2**32, M, dtype=np.uint64)
                              .astype(np.uint32)))
    qh = jnp.asarray(rng.integers(0, 2**32, (F, scap), dtype=np.uint64)
                     .astype(np.uint32))

    # ---- L1.a: fused searchsorted, sort-based
    @jax.jit
    def ss_sort(occ, qh):
        q2 = jnp.concatenate([qh, qh + jnp.uint32(1)], axis=-1)
        return jnp.searchsorted(occ, q2, side="left", method="sort")

    timeit(f"L1 searchsorted sort (q={F}x{2*scap}, M=1M)", ss_sort, occ, qh)

    # ---- L1.b: gather-descent binary search (20 rounds)
    @jax.jit
    def ss_gather(occ, qh):
        q2 = jnp.concatenate([qh, qh + jnp.uint32(1)], axis=-1)
        n = occ.shape[0]
        pos = jnp.zeros(q2.shape, jnp.int32)
        for b in reversed(range(20)):
            cand = pos + (1 << b)
            av = occ[jnp.clip(cand - 1, 0, n - 1)]
            pos = jnp.where((cand <= n) & (av < q2), cand, pos)
        return pos

    timeit("L1 searchsorted gather-descent", ss_gather, occ, qh)

    # ---- L1.c: bucket LUT + 6-round descent
    BUCKET_BITS = 16
    nb = 1 << BUCKET_BITS

    @jax.jit
    def make_buckets(occ):
        b = (jnp.arange(nb + 1, dtype=jnp.uint32) << (32 - BUCKET_BITS))
        b = jnp.where(jnp.arange(nb + 1) == nb, jnp.uint32(0xFFFFFFFF), b)
        lo = jnp.searchsorted(occ, b, side="left", method="sort")
        return lo.astype(jnp.int32)

    blut = jax.block_until_ready(make_buckets(occ))
    width = int(np.max(np.asarray(blut)[1:] - np.asarray(blut)[:-1]))
    rounds = max(int(np.ceil(np.log2(max(width, 2)))) + 1, 1)
    print(f"bucket max width {width} -> {rounds} rounds")

    @jax.jit
    def ss_bucket(occ, blut, qh):
        q2 = jnp.concatenate([qh, qh + jnp.uint32(1)], axis=-1)
        n = occ.shape[0]
        bidx = (q2 >> (32 - BUCKET_BITS)).astype(jnp.int32)
        pos = blut[bidx]
        hi = blut[jnp.clip(bidx + 1, 0, nb)]
        # branchless descent within [pos, hi)
        for b in reversed(range(rounds)):
            cand = pos + (1 << b)
            av = occ[jnp.clip(cand - 1, 0, n - 1)]
            pos = jnp.where((cand <= hi) & (av < q2), cand, pos)
        return pos

    r_sort = ss_sort(occ, qh)
    r_buck = timeit("L1 searchsorted bucket-LUT", ss_bucket, occ, blut, qh)
    assert np.array_equal(np.asarray(r_sort), np.asarray(r_buck)), "mismatch!"

    # ---- L1.d: row sort of hit keys
    keys = jnp.asarray(rng.integers(0, 2**32, (F, hits_cap), dtype=np.uint64)
                       .astype(np.uint32))
    timeit("L1 row sort (512x4096 u32)", jax.jit(lambda k: jnp.sort(k, axis=-1)), keys)
    keys2 = jnp.asarray(rng.integers(0, 2**32, (F, 1024), dtype=np.uint64)
                        .astype(np.uint32))
    timeit("L1 row sort (512x1024 u32)", jax.jit(lambda k: jnp.sort(k, axis=-1)), keys2)

    @jax.jit
    def row_argsort(k):
        o = jnp.argsort(k, axis=-1, stable=True)
        return jnp.take_along_axis(k, o, axis=-1)

    timeit("L1 row argsort+take (512x4096)", row_argsort, keys)

    # ---- L2: one-hot rank matmuls, bf16 hi/lo vs int8 planes
    U, ncap = 128, 768
    T = 2 * ncap + 1
    lb = jnp.asarray(rng.integers(0, ncap, (U, T)).astype(np.int32))
    le = jnp.asarray(np.minimum(np.asarray(lb) + rng.integers(0, 400, (U, T)), ncap).astype(np.int32))
    m1 = jnp.asarray(np.cumsum(rng.integers(0, 2, (U, scap, ncap)), axis=-1,
                               dtype=np.int32))
    m1 = jnp.concatenate([jnp.zeros((U, scap, 1), jnp.int32), m1], axis=-1)

    def mm(a, b, pt):
        return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=pt)

    @jax.jit
    def rank_bf16(lb, le, m1):
        col = jnp.arange(ncap + 1, dtype=jnp.int32)
        wdiff = ((col[None, None, :] == le[:, :, None]).astype(jnp.bfloat16)
                 - (col[None, None, :] == lb[:, :, None]).astype(jnp.bfloat16))
        t = jnp.swapaxes(m1, -1, -2)
        hi = (t >> 8).astype(jnp.bfloat16)
        lo = (t & 0xFF).astype(jnp.bfloat16)
        return mm(wdiff, hi, jnp.float32) * 256.0 + mm(wdiff, lo, jnp.float32)

    @jax.jit
    def rank_int8(lb, le, m1):
        col = jnp.arange(ncap + 1, dtype=jnp.int32)
        wdiff = ((col[None, None, :] == le[:, :, None]).astype(jnp.int8)
                 - (col[None, None, :] == lb[:, :, None]).astype(jnp.int8))
        t = jnp.swapaxes(m1, -1, -2)
        hi = (t >> 7).astype(jnp.int8)
        lo = (t & 0x7F).astype(jnp.int8)
        return (mm(wdiff, hi, jnp.int32) << 7) + mm(wdiff, lo, jnp.int32)

    a = timeit("L2 rank matmul bf16 hi/lo", rank_bf16, lb, le, m1)
    b = timeit("L2 rank matmul int8 hi/lo", rank_int8, lb, le, m1)
    assert np.array_equal(np.asarray(a).astype(np.int32), np.asarray(b)), "int8 mismatch"

    # gather alternative
    @jax.jit
    def rank_gather(lb, le, m1):
        t = jnp.swapaxes(m1, -1, -2)  # (U, ncap+1, scap)
        g = lambda idx: jnp.take_along_axis(
            t, jnp.broadcast_to(idx[:, :, None], (U, T, scap)), axis=-2)
        return g(le) - g(lb)

    timeit("L2 rank gather", rank_gather, lb, le, m1)

    # compare-count piece
    lp1 = jnp.asarray(np.sort(rng.integers(0, 3000, (U, ncap)).astype(np.int32)))
    v = jnp.asarray(np.sort(rng.integers(0, 3000, (U, T)).astype(np.int32)))

    @jax.jit
    def cc(lp1, v):
        return (lp1[:, None, :] <= v[:, :, None]).sum(-1).astype(jnp.int32)

    timeit("L2 compare-count (U,T,ncap)", cc, lp1, v)

    # int8 matmul version of compare-count? one-sided prefix counts via
    # monotone compare is VPU; try MXU: counts = sum over ncap of step fn —
    # not a matmul. skip.


if __name__ == "__main__":
    main()
