"""Reduced-size rehearsal of the 1000-genome sharded all-vs-all config.

BASELINE.json config 4 calls for a 1000-genome all-vs-all over a sharded
index; this rehearses the same product path (`parallel.runner.run_sharded`,
(r, q) device mesh, per-shard index build, 2-way survivor rows, exact host
fold) at a reduced size on the virtual CPU mesh and reports the stats the
round-3 verdict asked for (item 9):

  * peak host RSS (the bounded-memory contract of the streaming design)
  * rows_cap sizing vs the observed survivor-row maxima (no mid-run
    recompile: the initial heuristic must hold)
  * wall time per phase

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/dryrun_sharded.py [--genomes 200 --size 1000000]

Reference anchor: the reference handles this scale only via manual DB
splitting (scripts/splitDatabase.sh + README.md:104-106); the law being
rehearsed is round-robin shard ids global = local * n_r + r
(computeCoreIdentity.hpp:457-487).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the env var alone does not displace the axon plugin; config.update does
jax.config.update("jax_platforms", "cpu")

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=200)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--mesh", default="4x2")
    ap.add_argument("--path", choices=["rows", "fused"], default="rows",
                    help="rows = exact 2-way survivor rows + host fold; "
                         "fused = zero-fetch device-CGI stream (the "
                         "throughput default of the product CLI)")
    ap.add_argument("--queries", type=int, default=0,
                    help="query-genome count (default: all = genomes); "
                         "a reduced query set still certifies index + "
                         "table memory at full reference scale")
    ap.add_argument("--workdir", default="",
                    help="reuse an existing workload directory")
    ap.add_argument("--caps-genomes", type=int, default=0,
                    help="scale the L1 caps for this many RELATED genomes "
                         "instead of the total count (clustered workloads "
                         "+ r-sharding shrink per-device hit density)")
    args = ap.parse_args()

    from bench import build_workload
    from fastani_tpu.config import Parameters, scale_caps
    from fastani_tpu.parallel import runner

    n_r, n_q = (int(x) for x in args.mesh.split("x"))
    wd = args.workdir or tempfile.mkdtemp(prefix="fastani_dryrun_")
    t0 = time.time()
    paths = build_workload(wd, args.genomes, args.size)
    t_synth = time.time() - t0
    print(f"workload: {args.genomes} x {args.size/1e6:.1f} Mbp "
          f"({t_synth:.0f}s to synthesize, rss {rss_mb():.0f} MB)", flush=True)

    n_queries = args.queries or args.genomes
    params = Parameters(out_file_name=os.path.join(wd, "out.txt"),
                        matrix_output=True).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths[:n_queries])

    logs = []

    def log(m):
        logs.append(m)
        print(m, file=sys.stderr, flush=True)

    stats: dict = {}
    t0 = time.time()
    if args.path == "fused":
        scale_caps(args.caps_genomes or args.genomes, params)
        final = runner.run_sharded_fused(params, n_r=n_r, n_q=n_q,
                                         backend="jax", stats=stats,
                                         log=log)
    else:
        final = runner.run_sharded(params, n_r=n_r, n_q=n_q,
                                   backend="jax", log=log)
    t_run = time.time() - t0

    retries = sum("retrying" in m for m in logs)
    result = dict(
        genomes=args.genomes, size=args.size, mesh=args.mesh,
        path=args.path, queries=n_queries,
        ani_rows=len(final), run_seconds=round(t_run, 1),
        peak_rss_mb=round(rss_mb(), 1),
        rows_cap_retries=retries,
        fallback_frags=stats.get("fallback_frags"),
        observed={k: stats.get(k) for k in (
            "max_hits", "max_groups", "max_s", "max_span", "n_units")},
        pairs_per_sec=round(n_queries * args.genomes / t_run, 2),
    )
    print(json.dumps(result), flush=True)
    assert retries == 0, "rows_cap heuristic forced a mid-run recompile"
    assert len(final) > 0


if __name__ == "__main__":
    main()
