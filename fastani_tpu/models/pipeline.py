"""End-to-end ANI pipeline driver.

Orchestrates sketch -> map -> aggregate -> write, replicating the reference
driver's semantics (reference: src/cgi/core_genome_identity.cpp:27-167) with
one logical shard: the reference's per-thread round-robin reference split
exists only for CPU parallelism and its TSV/matrix output is split-count
invariant; this driver always produces the single-shard (-t 1) output,
including the .visual file (whose global offsets are shard-dependent in the
reference — we standardize on the -t 1 form).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from fastani_tpu.config import Parameters
from fastani_tpu.index.sketch import ReferenceIndex
from fastani_tpu.io import fasta
from fastani_tpu.models import ani, glue, output
from fastani_tpu.ops import hashing
from fastani_tpu.utils.refmodel import Mapping


@dataclasses.dataclass
class QueryFragments:
    frags: np.ndarray           # (F, frag_len) uint8 (uppercased)
    frag_ids: np.ndarray        # (F,) global fragment ids (querySeqId)
    total_fragments: int
    # visualization metadata: one entry per fragment, plus one per skipped
    # short contig (computeMap.hpp:140-167); offsets are prefix sums of lens
    vis_offsets: np.ndarray     # (n_meta,) int64 global offset per entry


def load_query_fragments(path: str, params: Parameters) -> QueryFragments:
    l = params.frag_len
    k, w = params.kmer_size, params.window_size
    frag_rows: List[np.ndarray] = []
    frag_ids: List[int] = []
    vis_lens: List[int] = []
    seq_counter = 0
    for name, seq in fasta.read_sequences(path):
        L = len(seq)
        if L < w or L < k or L < l:
            vis_lens.append(L)  # short contig: metadata only
            continue
        fragment_count = L // l
        for i in range(fragment_count):
            if i != fragment_count - 1:
                vis_lens.append(l)
            else:
                vis_lens.append(l + (L % l))
            frag_rows.append(hashing.upper_np(seq[i * l : (i + 1) * l]))
            frag_ids.append(seq_counter + i)
        seq_counter += fragment_count
    frags = np.stack(frag_rows) if frag_rows else np.zeros((0, l), np.uint8)
    lens = np.asarray(vis_lens, np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else np.zeros(0, np.int64)
    return QueryFragments(frags, np.asarray(frag_ids, np.int32), seq_counter, offsets)


def map_query(query_frags: QueryFragments, index: ReferenceIndex,
              params: Parameters, backend: str = "numpy",
              frag_batch: Optional[int] = None) -> List[Mapping]:
    """Map all fragments of one query genome against the index."""
    from fastani_tpu.utils import refmodel

    if backend == "numpy":
        import numpy as xp
        generous = True
    else:
        import jax.numpy as xp
        generous = False
    mappings: List[Mapping] = []
    F = len(query_frags.frags)
    bs = frag_batch or params.frag_batch
    for b0 in range(0, F, bs):
        b1 = min(b0 + bs, F)
        batch = glue.map_fragment_batch(xp, query_frags.frags[b0:b1], index,
                                        params, generous=generous)
        mappings.extend(glue.gate_and_format(
            batch, query_frags.frag_ids[b0:b1], params))
        for fb in batch.fallback_frags:
            mappings.extend(refmodel.map_fragment(
                query_frags.frags[b0 + fb], index, params,
                int(query_frags.frag_ids[b0 + fb])))
    return mappings


def run(params: Parameters, backend: str = "numpy",
        log=lambda msg: print(msg, file=sys.stderr)) -> List[ani.CGIResult]:
    """Full run: returns the CGI rows and writes all requested outputs."""
    params.finalize()
    out_path = params.out_file_name
    t0 = time.time()
    if params.load_index:
        index = ReferenceIndex.load(params.load_index, params)
        log(f"INFO, fastani_tpu, reference index restored from "
            f"{params.load_index} in {time.time()-t0:.2f}s: "
            f"{index.num_entries} minimizers")
    else:
        index = ReferenceIndex.build(params)
        log(f"INFO, fastani_tpu, reference sketched in {time.time()-t0:.2f}s: "
            f"{index.num_entries} minimizers, {index.num_unique_hashes} unique "
            f"(window size {params.window_size})")
    if params.save_index:
        index.save(params.save_index)
        log(f"INFO, fastani_tpu, reference index saved to {params.save_index}")

    sane = True
    if params.sanity_check:
        sane = index.sanity_check(params.max_ratio_diff)

    final: List[ani.CGIResult] = []
    genome_of_seq = index.genome_of_seq()
    ref_offsets = np.concatenate([[0], np.cumsum([c.length for c in index.metadata])[:-1]]) \
        if index.metadata else np.zeros(0, np.int64)

    if params.visualize and out_path:
        open(out_path + ".visual", "w").close()  # fresh run

    if sane:
        for qno, qpath in enumerate(params.query_sequences):
            t0 = time.time()
            qf = load_query_fragments(qpath, params)
            mappings = map_query(qf, index, params, backend=backend)
            log(f"INFO, fastani_tpu, mapped query {qno + 1} "
                f"({qf.total_fragments} fragments) in {time.time()-t0:.2f}s")
            rows, visual = ani.compute_cgi(mappings, genome_of_seq,
                                           params.frag_len, qno,
                                           qf.total_fragments)
            final.extend(rows)
            if params.visualize and out_path:
                output.write_visual(visual, params, qno, qf.vis_offsets,
                                    ref_offsets, out_path, append=True)
    else:
        log(f"ERROR :: SPLIT 0's ratio difference {index.ratio_difference} "
            f"exceeds maximum thresholds.")

    genome_lengths: Dict[str, int] = {}
    for e in list(params.query_sequences) + list(params.ref_sequences):
        if e not in genome_lengths:
            genome_lengths[e] = fasta.genome_length_for_ani(e, params.frag_len)

    if out_path:
        output.write_cgi(final, genome_lengths, params, out_path)
        if params.matrix_output:
            output.write_phylip(final, genome_lengths, params, out_path)
    return final
