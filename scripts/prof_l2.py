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
    paths, _ = build_workload(workdir, genomes, size)
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
        C = l - (w - 1) - (k - 1)
        sid_m = jnp.where(u_valid, u_sid, 0).astype(jnp.uint32)
        key = lambda pos: (sid_m << bits) | pos.astype(jnp.uint32)
        b0 = jnp.searchsorted(mapper._mi_packed, key(u_start), side="left",
                              method="sort").astype(jnp.int32)
        b0 = jnp.minimum(b0, mapper._n_occ)
        Mp = mapper._mi_wpos.shape[0]
        sw0 = jnp.where(u_valid & (b0 < mapper._n_occ),
                        mapper._mi_wpos[jnp.clip(b0, 0, Mp - 1)], 0)
        q2 = jnp.concatenate([key(sw0 + C), key(u_end + l)])
        r2 = jnp.searchsorted(mapper._mi_packed, q2, side="left",
                              method="sort").astype(jnp.int32)
        r2 = jnp.minimum(r2, mapper._n_occ)
        e0, eL = r2[: b0.shape[0]], r2[b0.shape[0]:]
        return qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, e0, eL

    out = jax.block_until_ready(prep(fd))
    (qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, e0, eL) = out
    print(f"chunk: {int(np.asarray(u_valid.sum()))} valid units", flush=True)

    def stage_fn(stage):
        @jax.jit
        def f(qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, e0, eL):
            return mapping.l2_map_units(
                jnp, qh, s, u_frag, u_sid, u_start, u_end, u_valid,
                mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
                mapper._seq_start, l, k, w, cfg.l2_entry_cap,
                begin_end=(b0, e0, eL), _stage=stage)
        return f

    prev = 0.0
    for stage in (1, 2, 3, 4, 99):
        f = stage_fn(stage)
        args = (qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, e0, eL)
        r = jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(5):
            r = jax.block_until_ready(f(*args))
        dt = (time.time() - t0) / 5 * 1e3
        print(f"stage {stage:2d}: {dt:7.2f} ms  (delta {dt - prev:+7.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
