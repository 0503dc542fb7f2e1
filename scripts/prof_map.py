"""Profile the mapping hot path stage by stage on the live device.

Builds the bench workload (smaller by default), then times:
  A. sketch_fragments only
  B. sketch + L1
  C. full map_step_packed (what the bench runs)
  D. per-batch host round trip (dispatch vs collect)
Run:  python scripts/prof_map.py [--genomes 8 --size 1000000 --frag-batch 512]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=8)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--frag-batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, mapping, pipeline

    workdir = tempfile.mkdtemp(prefix="fastani_prof_")
    paths, _ = build_workload(workdir, args.genomes, args.size)
    params = Parameters(frag_batch=args.frag_batch).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)

    t0 = time.time()
    index = ReferenceIndex.build_device(params)
    print(f"index: {index.num_entries} entries in {time.time()-t0:.1f}s",
          flush=True)
    mapper = jitmap.JitMapper(params, index, unit_factor=len(paths) + 2,
                              unit_chunk=128)
    cfg = mapper.cfg

    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    frags = queries[0].frags[: params.frag_batch]
    if len(frags) < params.frag_batch:
        pad = np.zeros((params.frag_batch - len(frags), params.frag_len),
                       np.uint8)
        frags = np.concatenate([frags, pad])
    fd = jnp.asarray(frags)

    # A: sketch only
    sk = jax.jit(functools.partial(mapping.sketch_fragments, jnp,
                                   k=cfg.kmer_size, w=cfg.window_size,
                                   scap=cfg.sketch_cap))
    dt, (qh, s, _) = t(sk, fd)
    print(f"A sketch_fragments      : {dt*1e3:8.1f} ms", flush=True)

    # B: L1 only (on precomputed sketches)
    l1fn = jax.jit(lambda qh, s: mapping.l1_candidates(
        jnp, qh, s, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
        mapper._min_hits, cfg.freq_threshold, cfg.frag_len, cfg.hits_cap,
        cfg.cand_cap, n_occ=mapper._n_occ, wpos_bits=cfg.wpos_bits,
        occ_packed=mapper._occ_packed, occ_lut=mapper._occ_lut,
        occ_rounds=cfg.occ_rounds))
    dt, l1 = t(l1fn, qh, s)
    print(f"B l1_candidates         : {dt*1e3:8.1f} ms  "
          f"(units={int(np.asarray(l1.valid.sum()))}, "
          f"max_hits={int(np.asarray(l1.n_hits.max()))}, "
          f"max_groups={int(np.asarray(l1.n_groups.max()))})", flush=True)

    # C: full step
    dt, out = t(lambda f: mapper._fn(
        f, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
        mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos, mapper._seq_start,
        mapper._min_hits, mapper._gate, mapper._n_occ, mapper._occ_packed,
        mapper._mi_packed, mapper._mi_prev, mapper._mi_nxt,
        mapper._occ_lut, mapper._mi_lut), fd)
    counts = np.asarray(out["counts"])
    print(f"C map_step              : {dt*1e3:8.1f} ms  "
          f"(valid={counts[0]}, n_units={counts[9]}, max_span={counts[8]}, "
          f"max_s={counts[7]})", flush=True)

    # D: host round-trip of collect()
    h = mapper.dispatch(frags)
    jax.block_until_ready(h["out"]["packed"])
    t0 = time.time()
    res = mapper.collect(h)
    print(f"D collect (host fetch)  : {(time.time()-t0)*1e3:8.1f} ms  "
          f"({len(res['frag'])} rows)", flush=True)

    # E: whole-run replay (what bench times)
    t0 = time.time()
    pipeline.map_queries_batched(queries, index, params, mapper)
    nfr = sum(len(q.frags) for q in queries)
    print(f"E map_queries_batched   : {time.time()-t0:8.1f} s  "
          f"({nfr} frags, {nfr/(time.time()-t0):.0f} frags/s)", flush=True)


if __name__ == "__main__":
    main()
