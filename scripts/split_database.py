#!/usr/bin/env python3
"""Split a genome-list database into N partitions for scale-out runs.

TPU-native analog of the reference's multi-node sharding helper
(reference: scripts/splitDatabase.sh:14-39): shuffles the list and splits
it into ceil(total/count)-line partition files.  Each partition is an
independent fastani_tpu reference set; run one process (or one pod slice)
per partition and concatenate the outputs, exactly the reference's manual
multi-node recipe (reference README.md:104-106).

Usage:
    python scripts/split_database.py <database.txt> <count> <output_dir>
        [--seed N] [--no-shuffle]

Output: <output_dir>/partition.00, partition.01, ...
"""

from __future__ import annotations

import argparse
import math
import os
import random
import sys


def split_database(database: str, count: int, output_dir: str,
                   seed=None, shuffle: bool = True) -> list:
    with open(database) as f:
        genomes = [ln.strip() for ln in f if ln.strip()]
    total = len(genomes)
    print(f"Total count of genomes in the given database  {total}")
    if shuffle:
        random.Random(seed).shuffle(genomes)
    per_file = math.ceil(total / count) if count else total
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for i in range(0, total, per_file):
        p = os.path.join(output_dir, f"partition.{len(paths):02d}")
        with open(p, "w") as f:
            f.write("\n".join(genomes[i:i + per_file]) + "\n")
        paths.append(p)
    print(f"Database is now split into  {len(paths)}  files in the folder "
          f"{output_dir}")
    return paths


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("database")
    ap.add_argument("count", type=int)
    ap.add_argument("output_dir")
    ap.add_argument("--seed", type=int, default=None,
                    help="shuffle seed (default: nondeterministic, like shuf)")
    ap.add_argument("--no-shuffle", action="store_true")
    a = ap.parse_args(argv)
    split_database(a.database, a.count, a.output_dir, a.seed, not a.no_shuffle)
    return 0


if __name__ == "__main__":
    sys.exit(main())
