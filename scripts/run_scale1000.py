"""1000-genome all-vs-all on the REAL single chip (BASELINE config 4).

Workload: 1000 x 1 Mbp genomes in ``--clusters`` related groups
(within-cluster divergence 1-5%, clusters mutually unrelated) — the
realistic shape of large taxonomy runs, where a query fragment maps to
its cluster rather than to all 1000 genomes.  (The bench ladder's dense
single-cluster shape at G=1000 needs the r-sharded mesh: per-fragment L1
hits scale with the number of RELATED genomes, and a 1000-strong single
cluster exceeds any single-chip hits_cap — exactly the axis the (r, q)
mesh shards.)

Runs the product fused zero-fetch path one-shot (device index build +
K-batch scan + in-scan per-query finalize + ONE readout) and prints one
JSON line; the in-scan finalize is what makes Gq = 1000 stream in
O(slots x bins) HBM (round-4 verdict item 2).

Run:  python scripts/run_scale1000.py [--genomes 1000 --size 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()

SEED = 1234


def build_clustered(workdir: str, n: int, size: int, clusters: int):
    from tests import synth

    paths = [os.path.join(workdir, f"g{i}.fa") for i in range(n)]
    if all(os.path.exists(p) and os.path.getsize(p) > size for p in paths):
        return paths
    rng = np.random.default_rng(SEED)
    per = -(-n // clusters)
    i = 0
    for c in range(clusters):
        base = synth.random_genome(rng, size)
        for j in range(min(per, n - i)):
            g = synth.mutate_genome(rng, base,
                                    0.01 + 0.04 * (j / max(per - 1, 1)),
                                    indel_rate=0.0002)
            synth.write_fasta(paths[i], [(f"g{i}", g)])
            i += 1
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=1000)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--clusters", type=int, default=20)
    ap.add_argument("--frag-batch", type=int, default=512)
    ap.add_argument("--fuse-k", type=int, default=16)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--queries", type=int, default=0,
                    help="query subset (default all)")
    args = ap.parse_args()

    import tempfile

    import jax

    from fastani_tpu.config import Parameters, scale_caps
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, pipeline

    workdir = args.workdir or os.path.join(
        tempfile.gettempdir(), f"fastani_scale_{args.genomes}x{args.size}")
    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()
    paths = build_clustered(workdir, args.genomes, args.size, args.clusters)
    print(f"workload ready in {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    G = args.genomes
    per_cluster = -(-G // args.clusters)
    params = Parameters(frag_batch=args.frag_batch).finalize()
    # caps scale with the RELATED genome count (one cluster), not G
    scale_caps(per_cluster, params)
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths[: args.queries] if args.queries
                                  else paths)
    n_q = len(params.query_sequences)

    t_init0 = time.time()
    jax.devices()
    if jax.default_backend() == "tpu":
        from fastani_tpu.utils import jitops

        jitops.engage_sync()
    t_backend = time.time() - t_init0

    t0 = time.time()
    index = ReferenceIndex.build_device(params)
    t_build = time.time() - t0

    t0 = time.time()
    uf = max(per_cluster + 2, int(1.7 * per_cluster) + 8)
    mapper = jitmap.JitMapper(params, index, unit_factor=uf,
                              unit_chunk=512)
    t_mapper = time.time() - t0

    t0 = time.time()
    stream = pipeline.FragmentStream(list(params.query_sequences), params)
    t_ingest = time.time() - t0

    t0 = time.time()
    static_cap = params.hits_cap
    cap = pipeline.autotune_hits_cap(mapper, stream, params)
    t_tune = time.time() - t0
    print(f"hits_cap auto-tuned to {cap} (static formula: {static_cap})",
          file=sys.stderr, flush=True)

    stats: dict = {}
    t0 = time.time()
    handle = pipeline.map_queries_cgi_stream(stream, index, params, mapper,
                                             n_q, G, fuse_k=args.fuse_k)
    t_stream = time.time() - t0
    t0 = time.time()
    counts, sums = pipeline.map_queries_cgi_finish(handle, index, params,
                                                   mapper, stats=stats)
    t_readout = time.time() - t0
    total = t_build + t_mapper + t_ingest + t_tune + t_stream + t_readout

    res = dict(
        metric="genome-pairs/sec (clustered 1000-genome all-vs-all @ "
               "%d x %.1f Mbp, %d clusters, one-shot)" % (
                   args.genomes, args.size / 1e6, args.clusters),
        value=round(n_q * G / total, 1),
        unit="pairs/s",
        detail=dict(
            total_seconds=round(total, 1),
            backend_init_seconds=round(t_backend, 1),
            build_enqueue_seconds=round(t_build, 1),
            mapper_init_seconds=round(t_mapper, 1),
            ingest_seconds=round(t_ingest, 1),
            autotune_seconds=round(t_tune, 1),
            stream_enqueue_seconds=round(t_stream, 1),
            readout_seconds=round(t_readout, 1),
            hits_cap=cap, frags=stream.F, queries=n_q,
            ani_rows=int((counts > 0).sum()),
            fallback_frags=stats.get("fallback_frags"),
            observed={k: stats.get(k) for k in (
                "max_hits", "max_groups", "max_s", "max_span", "n_units",
                "sum_hits")},
        ),
    )
    print(json.dumps(res), flush=True)
    assert (counts > 0).sum() > 0


if __name__ == "__main__":
    main()
