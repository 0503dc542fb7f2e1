"""Command-line interface mirroring the reference fastANI flags.

Reference: src/map/include/parseCmdArgs.hpp:114-234.  Usage:

    python -m fastani_tpu.cli -q genome1.fa -r genome2.fa -o output.txt
    python -m fastani_tpu.cli --ql queries.txt --rl refs.txt -o out.txt --matrix
"""

from __future__ import annotations

import argparse
import sys
from typing import List

from fastani_tpu import __version__
from fastani_tpu.config import Parameters


def parse_file_list(path: str) -> List[str]:
    out = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(line)
    except OSError:
        print(f"ERROR, fastani_tpu, could not open {path}", file=sys.stderr)
        raise SystemExit(1)
    return out


def validate_input_files(paths: List[str]) -> None:
    """Fail fast with a per-file error before any compute (reference:
    parseCmdArgs.hpp:59-90 validateInputFiles): every genome file must
    open and be non-empty."""
    import gzip
    import os

    bad = False
    for p in paths:
        try:
            if os.path.getsize(p) == 0:
                print(f"ERROR, fastani_tpu, input file {p} is empty",
                      file=sys.stderr)
                bad = True
                continue
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rb") as f:
                if not f.read(1):
                    print(f"ERROR, fastani_tpu, input file {p} is empty",
                          file=sys.stderr)
                    bad = True
        except OSError as e:
            print(f"ERROR, fastani_tpu, could not open input file {p}: "
                  f"{e.strerror or e}", file=sys.stderr)
            bad = True
    if bad:
        raise SystemExit(1)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fastani_tpu",
        description="TPU-native alignment-free whole-genome ANI computation "
                    "(capabilities of ParBLiSS/FastANI)")
    p.add_argument("-r", "--ref", help="reference genome (fasta/fastq)[.gz]")
    p.add_argument("--rl", "--refList", dest="refList",
                   help="file with list of reference genomes, one per line")
    p.add_argument("-q", "--query", help="query genome (fasta/fastq)[.gz]")
    p.add_argument("--ql", "--queryList", dest="queryList",
                   help="file with list of query genomes, one per line")
    p.add_argument("-k", "--kmer", type=int, default=16, help="kmer size <= 16 [16]")
    p.add_argument("-t", "--threads", type=int, default=1,
                   help="accepted for compatibility; output is shard-count invariant")
    p.add_argument("--fragLen", type=int, default=3000, help="fragment length [3000]")
    p.add_argument("--minFraction", type=float, default=0.2,
                   help="minimum shared-genome fraction for trusting ANI [0.2]")
    p.add_argument("--maxRatioDiff", type=float, default=100.0,
                   help="max sanity-check ratio difference [100.0]")
    p.add_argument("--visualize", action="store_true",
                   help="output mappings for visualization (.visual)")
    p.add_argument("--matrix", action="store_true",
                   help="also output phylip-style lower-triangular matrix")
    p.add_argument("-o", "--output", required=False, help="output file name")
    p.add_argument("-s", "--sanityCheck", action="store_true", help="run sanity check")
    p.add_argument("-v", "--version", action="store_true", help="show version")
    p.add_argument("--backend", choices=["numpy", "jax"], default="numpy",
                   help="compute backend (jax = TPU path)")
    p.add_argument("--exact", action="store_true",
                   help="force the byte-parity exact aggregation path "
                        "(host CGI fold); without it --backend jax uses "
                        "the fused device-CGI throughput path, whose ANI "
                        "matches the exact path within float32 summation "
                        "order (<< the 0.1-ANI contract).  --visualize "
                        "and -s imply --exact.")
    p.add_argument("--saveIndex", dest="saveIndex", default="",
                   help="persist the built reference index to this .npz")
    p.add_argument("--loadIndex", dest="loadIndex", default="",
                   help="restore a persisted reference index instead of "
                        "sketching (reference file list comes from the index)")
    p.add_argument("--profile", dest="profile", default="",
                   help="write a jax.profiler trace of the mapping phase "
                        "to this directory (jax backend)")
    p.add_argument("--mesh", default="",
                   help="run sharded on an RxQ device mesh, e.g. --mesh 2x4 "
                        "(R reference shards x Q query-parallel devices); "
                        "'auto' factors jax.device_count(). Output is "
                        "bit-identical to the single-device run.")
    p.add_argument("--coordinator", default="",
                   help="multi-host coordinator address host:port "
                        "(jax.distributed); every process runs this CLI")
    p.add_argument("--nprocs", type=int, default=0,
                   help="multi-host: total number of processes")
    p.add_argument("--procid", type=int, default=-1,
                   help="multi-host: this process's id (0-based)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.version:
        print(f"fastani_tpu {__version__}")
        return 0
    if not args.ref and not args.refList and not args.loadIndex:
        print("Provide reference file(s)", file=sys.stderr)
        return 1
    if not args.query and not args.queryList:
        print("Provide query file(s)", file=sys.stderr)
        return 1
    if not args.output:
        print("Provide output file (-o)", file=sys.stderr)
        return 1

    from fastani_tpu.utils import platform

    platform.setup_cache()
    if args.backend != "jax":
        # the host backend still jits winnowing on CPU; don't require a TPU
        # runtime (the session's axon plugin only registers in some cwds)
        platform.force_cpu()

    params = Parameters(
        kmer_size=args.kmer,
        frag_len=args.fragLen,
        min_fraction=args.minFraction,
        max_ratio_diff=args.maxRatioDiff,
        visualize=args.visualize,
        matrix_output=args.matrix,
        sanity_check=args.sanityCheck,
        threads=args.threads,
        out_file_name=args.output,
        save_index=args.saveIndex,
        load_index=args.loadIndex,
        profile_dir=args.profile,
        ref_sequences=([args.ref] if args.ref
                       else parse_file_list(args.refList) if args.refList
                       else []),
        query_sequences=[args.query] if args.query else parse_file_list(args.queryList),
    )
    validate_input_files(list(params.query_sequences)
                         + list(params.ref_sequences))
    from fastani_tpu.models import pipeline

    print(">>>>>>>>>>>>>>>>>>", file=sys.stderr)
    print(f"Reference = {params.ref_sequences}", file=sys.stderr)
    print(f"Query = {params.query_sequences}", file=sys.stderr)
    print(f"Kmer size = {params.kmer_size}", file=sys.stderr)
    print(f"Fragment length = {params.frag_len}", file=sys.stderr)
    print(f"ANI output file = {params.out_file_name}", file=sys.stderr)
    print(f"Backend = {args.backend}", file=sys.stderr)
    print(">>>>>>>>>>>>>>>>>>", file=sys.stderr)

    # fast path: fused zero-fetch device CGI (--backend jax default).
    # --visualize needs the exact mapping rows; -s resolves the sanity
    # ratios on host — both imply --exact (reference: one binary covers
    # all modes, parseCmdArgs.hpp:114-234)
    fast = (args.backend == "jax" and not args.exact
            and not args.visualize and not args.sanityCheck)

    if args.mesh or args.coordinator:
        from fastani_tpu.parallel import runner

        n_r = n_q = None
        if args.mesh and args.mesh != "auto":
            n_r, n_q = (int(x) for x in args.mesh.lower().split("x"))
        run = runner.run_sharded_fused if fast else runner.run_sharded
        run(params, n_r, n_q,
            coordinator=args.coordinator or None,
            num_processes=args.nprocs or None,
            process_id=args.procid if args.procid >= 0 else None,
            backend=args.backend)
        return 0

    if fast:
        pipeline.run_fast(params)
    else:
        pipeline.run(params, backend=args.backend)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
