"""Host-phase breakdown of map_queries_cgi_device on the live device.

Times every host-side step per batch (make_batch, H2D+dispatch enqueue,
counts sync in collect_device, CGI update enqueue, finalize) across two
passes so compile/warm cost separates from steady state.

Run:  python scripts/prof_e2e.py [--genomes 8 --size 1000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=8)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--frag-batch", type=int, default=512)
    ap.add_argument("--unit-chunk", type=int, default=256)
    args = ap.parse_args()

    import jax

    from bench import build_workload, scaled_caps
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import device_cgi, jitmap, pipeline

    workdir = tempfile.mkdtemp(prefix="fastani_prof_")
    paths = build_workload(workdir, args.genomes, args.size)
    params = Parameters(frag_batch=args.frag_batch).finalize()
    scaled_caps(len(paths), params)
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build_device(params)
    print(f"index: {index.num_entries} entries", flush=True)
    mapper = jitmap.JitMapper(params, index, unit_factor=len(paths) + 2,
                              unit_chunk=args.unit_chunk)
    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    G = len(paths)

    for rep in range(2):
        stream = pipeline.FragmentStream(list(queries), params)
        B = params.frag_batch
        F = stream.F
        starts = list(range(0, F, B))
        n_slots = 1
        for b0 in starts:
            n_slots = max(n_slots, stream.qno_of_row(min(b0 + B, F) - 1)
                          - stream.qno_of_row(b0) + 1)
        tt = defaultdict(float)
        t_all = time.time()
        t0 = time.time()
        cgi = device_cgi.StreamingCGI(index, params, G, G, n_slots,
                                      frag_cap=B,
                                      donate=jax.default_backend() != "cpu")
        tt["cgi_init"] += time.time() - t0
        next_fin = 0

        def handle(b0, batch, qno_row, gid_row, h):
            nonlocal next_fin
            t0 = time.time()
            packed, n_valid, fb = mapper.collect_device(h)
            tt["collect(counts sync)"] += time.time() - t0
            n_used = min(B, F - b0)
            excl = np.zeros(B, bool)
            excl[n_used:] = True
            t0 = time.time()
            cgi.update(packed, n_valid, excl)
            tt["cgi.update enqueue"] += time.time() - t0
            nb = b0 + B
            fin_to = stream.qno_of_row(nb) if nb < F else G
            t0 = time.time()
            while next_fin < fin_to:
                cgi.finalize_query(next_fin)
                next_fin += 1
            tt["finalize enqueue"] += time.time() - t0

        inflight = []
        for b0 in starts:
            t0 = time.time()
            batch, qno_row, gid_row, _n = stream.make_batch(b0, B)
            tt["make_batch"] += time.time() - t0
            t0 = time.time()
            h = mapper.dispatch(batch, qno_row, gid_row)
            tt["dispatch enqueue"] += time.time() - t0
            inflight.append((b0, batch, qno_row, gid_row, h))
            if len(inflight) >= 2:
                handle(*inflight.pop(0))
        for item in inflight:
            handle(*item)
        while next_fin < G:
            t0 = time.time()
            cgi.finalize_query(next_fin)
            next_fin += 1
            tt["finalize enqueue"] += time.time() - t0
        t0 = time.time()
        counts, sums = cgi.result()
        tt["result fetch"] += time.time() - t0
        total = time.time() - t_all
        print(f"--- pass {rep + 1}: total {total:.2f}s over {len(starts)} "
              f"batches (rows={int(counts.sum())})")
        acct = 0.0
        for k, v in sorted(tt.items(), key=lambda kv: -kv[1]):
            print(f"  {k:24s} {v:7.2f} s  ({v/len(starts)*1e3:6.1f} ms/batch)")
            acct += v
        print(f"  {'(unaccounted)':24s} {total-acct:7.2f} s", flush=True)


if __name__ == "__main__":
    main()
