"""Stage-level profile of one L2 unit chunk on the live device.

Times l2_map_units with _stage = 1 (window slice), 2 (+event staircase),
3 (+rank tables), 4 (+pair machinery), 99 (full), so the per-stage cost is
the successive difference.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, mapping, pipeline

    genomes, size, B = 8, 1_000_000, 512
    workdir = tempfile.mkdtemp(prefix="fastani_profl2_")
    paths = build_workload(workdir, genomes, size)
    params = Parameters(frag_batch=B).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build_device(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=genomes + 2,
                              unit_chunk=128)
    cfg = mapper.cfg
    print(f"caps: sketch={cfg.sketch_cap} l2={cfg.l2_entry_cap} "
          f"chunk={cfg.unit_chunk}", flush=True)

    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    frags = queries[0].frags[:B]
    fd = jnp.asarray(np.ascontiguousarray(frags))

    # reproduce map_step's unit construction up to the first L2 chunk
    k, w, l = cfg.kmer_size, cfg.window_size, cfg.frag_len

    @jax.jit
    def prep(frags):
        qh, s, _ = mapping.sketch_fragments(jnp, frags, k, w, cfg.sketch_cap)
        l1 = mapping.l1_candidates(jnp, qh, s, mapper._occ_hash,
                                   mapper._occ_sid, mapper._occ_wpos,
                                   mapper._min_hits, cfg.freq_threshold, l,
                                   cfg.hits_cap, cfg.cand_cap,
                                   n_occ=mapper._n_occ,
                                   wpos_bits=cfg.wpos_bits,
                                   occ_packed=mapper._occ_packed)
        F = frags.shape[0]
        u_frag = jnp.repeat(jnp.arange(F, dtype=jnp.int32), cfg.cand_cap)
        u_sid = l1.sid.reshape(-1)
        u_start = l1.start.reshape(-1)
        u_end = l1.end.reshape(-1)
        u_valid = l1.valid.reshape(-1)
        order = jnp.argsort(jnp.where(u_valid, 0, 1).astype(jnp.int32),
                            stable=True)
        take = order[: cfg.unit_chunk]          # first chunk only
        u_frag, u_sid = u_frag[take], u_sid[take]
        u_start, u_end, u_valid = u_start[take], u_end[take], u_valid[take]
        bits = cfg.wpos_bits
        sid_m = jnp.where(u_valid, u_sid, 0).astype(jnp.uint32)
        key = lambda pos: (sid_m << bits) | pos.astype(jnp.uint32)
        q2 = jnp.concatenate([key(u_start), key(u_end + l)])
        r2 = jnp.searchsorted(mapper._mi_packed, q2, side="left",
                              method="sort").astype(jnp.int32)
        r2 = jnp.minimum(r2, mapper._n_occ)
        b0, eL = r2[: u_sid.shape[0]], r2[u_sid.shape[0]:]
        return qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, eL

    out = jax.block_until_ready(prep(fd))
    (qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, eL) = out
    print(f"chunk: {int(np.asarray(u_valid.sum()))} valid units", flush=True)

    from fastani_tpu.models import l2walk

    def timed(name, f, *args, reps=5):
        r = jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(reps):
            r = jax.block_until_ready(f(*args))
        print(f"{name:24s}: {(time.time()-t0)/reps*1e3:7.2f} ms", flush=True)
        return r

    uargs = (qh, s, u_frag, u_sid, u_start, u_end, u_valid)
    mi = (mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos)

    @jax.jit
    def ev_only(qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, eL):
        ev, aux = l2walk.build_events(
            qh, s, u_frag, u_sid, u_start, u_end, u_valid, *mi,
            l, k, w, cfg.l2_entry_cap, begin_end=(b0, eL),
            prev_g=mapper._mi_prev, nxt_g=mapper._mi_nxt)
        return ev, aux

    def walk_fn(backend):
        @jax.jit
        def f(qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, eL):
            return mapping.l2_map_units(
                jnp, qh, s, u_frag, u_sid, u_start, u_end, u_valid,
                *mi, mapper._seq_start, l, k, w, cfg.l2_entry_cap,
                begin_end=(b0, eL), prev_g=mapper._mi_prev,
                nxt_g=mapper._mi_nxt, backend=backend)
        return f

    args = uargs + (b0, eL)
    timed("build_events", ev_only, *args)
    timed("events + scan walk", walk_fn("scan"), *args)
    import jax as _j
    if _j.default_backend() == "tpu":
        timed("events + pallas walk", walk_fn("pallas"), *args)


if __name__ == "__main__":
    main()
