"""Microbenchmark the winnow sub-ops on the session TPU: murmur3 hashing,
sliding pairmin, last-event propagation, and the per-row argsort compaction,
each on the (16, 1 Mbp) batched-chunk shape the device build uses."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()

import jax
import jax.numpy as jnp

from fastani_tpu.ops import hashing
from fastani_tpu.ops.xputils import last_event_value, sliding_pairmin


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms")
    return out


def main():
    k, w = 16, 24
    B, L = 16, 1 << 20
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = jnp.asarray(bases[rng.integers(0, 4, (B, L + k - 1))])
    n = L

    @jax.jit
    def f_hash(s):
        from fastani_tpu.models import mapping
        hf = mapping.kmer_hashes(jnp, s, k)
        hb = mapping.kmer_hashes(jnp, hashing.revcomp_jax(s), k)[..., ::-1]
        return jnp.minimum(hf, hb)

    h = timeit("murmur3 fwd+rc (16x1M)", f_hash, seq)

    idx = jnp.arange(n, dtype=jnp.int32)
    p = jnp.broadcast_to(idx, (B, n))

    @jax.jit
    def f_slide(h, p):
        return sliding_pairmin(jnp, h, p, w)

    wh, wp = timeit("sliding_pairmin w=24", f_slide, h, p)

    ev = wh < jnp.uint32(1 << 29)

    @jax.jit
    def f_lev(ev, wp):
        return last_event_value(jnp, ev, wp, jnp.int32(-2))

    timeit("last_event_value (16x1M)", f_lev, ev, wp)

    @jax.jit
    def f_sortcomp(ev, h2, p2):
        R = (B * n) // 1024
        e2 = ev.reshape(R, 1024)
        hh = h2.reshape(R, 1024)
        pp = p2.reshape(R, 1024)
        order = jnp.argsort(jnp.where(e2, 0, 1).astype(jnp.int32), axis=1,
                            stable=True)[:, :256]
        return (jnp.take_along_axis(hh, order, axis=1),
                jnp.take_along_axis(pp, order, axis=1))

    timeit("row argsort compaction", f_sortcomp, ev, wh, wp)

    # combined current kernel for reference
    from fastani_tpu.index import device_build as db
    halo = w - 1
    width = halo + db._CHUNK + k - 1
    buf = np.zeros((16, width), np.uint8)
    buf[:, halo:halo + db._CHUNK] = bases[rng.integers(0, 4, (16, db._CHUNK))]
    lens = np.full(16, db._CHUNK, np.int32)
    fn = db._chunk_batch_jit(k, w, db._CHUNK)
    timeit("full winnow_chunk batch (16x1M)", fn, jnp.asarray(buf),
           jnp.asarray(lens))


if __name__ == "__main__":
    main()
