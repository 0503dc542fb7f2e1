"""Complete stage budget of the engine on the live device.

Emits the measured per-stage table for PERF.md:
  - production winnow+compact throughput (the driver hashing metric)
  - map_step substages at the bench workload: sketch, L1, window location,
    full step; for unit_chunk in a sweep
  - streaming-CGI update cost per batch
  - end-to-end map_queries_cgi_device rate

Run:  python scripts/prof_stages.py [--genomes 8 --size 1000000
      --frag-batch 512 --chunks 128,256,512]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()


def t(fn, *a, reps=3, **kw):
    import jax

    out = jax.block_until_ready(fn(*a, **kw))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*a, **kw))
    return (time.time() - t0) / reps, out


def t_chain(fn, *a, reps=6):
    """Enqueue `reps` dispatches, sync once (amortizes tunnel latency)."""
    import jax

    jax.block_until_ready(fn(*a))
    t0 = time.time()
    outs = [fn(*a) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=8)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--frag-batch", type=int, default=512)
    ap.add_argument("--chunks", default="128,256")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload, measure_hashing_gbps
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import device_cgi, jitmap, mapping, pipeline

    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- production winnow throughput --------------------------------------
    try:
        g = measure_hashing_gbps()
        print(f"hashing (winnow+compact, chained): {g:8.2f} Gbp/s", flush=True)
    except Exception as e:
        print(f"hashing metric failed: {e}", flush=True)

    workdir = tempfile.mkdtemp(prefix="fastani_prof_")
    paths = build_workload(workdir, args.genomes, args.size)
    params = Parameters(frag_batch=args.frag_batch).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)

    t0 = time.time()
    index = ReferenceIndex.build_device(params)
    print(f"index build: {index.num_entries} entries in {time.time()-t0:.2f}s",
          flush=True)
    t0 = time.time()
    index2 = ReferenceIndex.build_device(params)
    print(f"index build (steady-state): {time.time()-t0:.2f}s", flush=True)
    del index2

    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    frags = queries[0].frags[: params.frag_batch]
    if len(frags) < params.frag_batch:
        frags = np.concatenate([frags, np.zeros(
            (params.frag_batch - len(frags), params.frag_len), np.uint8)])
    fd = jnp.asarray(frags)

    for unit_chunk in [int(x) for x in args.chunks.split(",")]:
        mapper = jitmap.JitMapper(params, index,
                                  unit_factor=len(paths) + 2,
                                  unit_chunk=unit_chunk)
        cfg = mapper.cfg

        # sketch only
        sk = jax.jit(functools.partial(mapping.sketch_fragments, jnp,
                                       k=cfg.kmer_size, w=cfg.window_size,
                                       scap=cfg.sketch_cap))
        dt_sk, (qh, s, _) = t(sk, fd)

        # L1 only
        l1fn = jax.jit(lambda qh, s: mapping.l1_candidates(
            jnp, qh, s, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
            mapper._min_hits, cfg.freq_threshold, cfg.frag_len, cfg.hits_cap,
            cfg.cand_cap, n_occ=mapper._n_occ, wpos_bits=cfg.wpos_bits,
            occ_packed=mapper._occ_packed, occ_lut=mapper._occ_lut,
            occ_rounds=cfg.occ_rounds))
        dt_l1, l1 = t(l1fn, qh, s)

        # full map step (single dispatch, then chained)
        step = lambda f: mapper._fn(
            f, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
            mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
            mapper._seq_start, mapper._min_hits, mapper._gate,
            mapper._n_occ, mapper._occ_packed, mapper._mi_packed,
            mapper._mi_prev, mapper._mi_nxt, mapper._occ_lut,
            mapper._mi_lut)
        dt_full, out = t(step, fd)
        dt_chain = t_chain(step, fd)
        counts = np.asarray(out["counts"])
        print(f"unit_chunk={unit_chunk:4d}: sketch {dt_sk*1e3:7.1f} ms | "
              f"L1 {dt_l1*1e3:7.1f} ms | full {dt_full*1e3:7.1f} ms | "
              f"chained {dt_chain*1e3:7.1f} ms "
              f"(valid={counts[0]}, units={counts[9]})", flush=True)

    # ---- streaming CGI update ---------------------------------------------
    mapper = jitmap.JitMapper(params, index, unit_factor=len(paths) + 2,
                              unit_chunk=256)
    G = len(paths)
    cgi = device_cgi.StreamingCGI(index, params, G, G, n_slots=2,
                                  frag_cap=params.frag_batch, donate=True)
    h = mapper.dispatch(frags, np.zeros(len(frags), np.int32),
                        np.arange(len(frags), dtype=np.int32))
    packed, n_valid, fb = mapper.collect_device(h)
    excl = np.zeros(params.frag_batch, bool)
    jax.block_until_ready(packed)
    cgi.update(packed, n_valid, excl)   # compile
    t0 = time.time()
    for _ in range(5):
        cgi.update(packed, n_valid, excl)
    import jax as _j
    _j.block_until_ready(cgi._tab)
    print(f"CGI update/batch: {(time.time()-t0)/5*1e3:7.1f} ms", flush=True)
    cgi.finalize_query(0)               # compile
    _j.block_until_ready(cgi._tab)
    t0 = time.time()
    for q in range(1, 6):
        cgi.finalize_query(q % G)
    _j.block_until_ready(cgi._tab)
    print(f"CGI finalize/query: {(time.time()-t0)/5*1e3:7.1f} ms", flush=True)

    # ---- end-to-end --------------------------------------------------------
    if not args.skip_e2e:
        mapper2 = jitmap.JitMapper(params, index,
                                   unit_factor=len(paths) + 2,
                                   unit_chunk=256)
        t0 = time.time()
        counts, sums = pipeline.map_queries_cgi_device(
            queries, index, params, mapper2, G, G)
        dt = time.time() - t0
        nfr = sum(len(q.frags) for q in queries)
        print(f"e2e map+CGI: {dt:7.2f} s  ({nfr} frags, "
              f"{G*G/dt:.1f} pairs/s excl. index)", flush=True)


if __name__ == "__main__":
    main()
