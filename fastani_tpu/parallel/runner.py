"""Product entry for sharded (multi-device / multi-host) many-to-many runs.

Drives the (r, q) mesh pipeline end to end — shard build, sharded mapping
step, exact host fold, output writers — replacing the reference driver's
OpenMP shard loop + merge (reference: src/cgi/core_genome_identity.cpp:
46-141) and its shell-level multi-node splitting
(scripts/splitDatabase.sh:14-39).

Exactness: the device step returns each reference shard's 2-way survivor
rows in 2-way sort order (parallel/mesh.make_sharded_rows_step); the host
folds identities per (shard, local genome) sequentially in that order, so
TSV/.matrix output is BIT-IDENTICAL to the single-shard run for any mesh
shape and host count — the reference's thread-invariance contract
(tests/fastani_tests.cpp:199-255).  Local->global genome ids follow the
correctRefGenomeIds law: global = local * n_r + r
(computeCoreIdentity.hpp:457-474, :480-487).
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np

from fastani_tpu.config import Parameters
from fastani_tpu.models import ani, jitmap, output, pipeline
from fastani_tpu.parallel import distributed, mesh as pmesh


def run_sharded(params: Parameters, n_r: Optional[int] = None,
                n_q: Optional[int] = None,
                coordinator: Optional[str] = None,
                num_processes: Optional[int] = None,
                process_id: Optional[int] = None,
                log=lambda m: print(m, file=sys.stderr)) -> List[ani.CGIResult]:
    """Full sharded run; every participating process calls this with the
    same arguments.  Process 0 writes the output files and returns the CGI
    rows (other processes return their replicated copy)."""
    import jax
    import jax.numpy as jnp

    from fastani_tpu.ops import stats

    # distributed bring-up MUST precede anything that initializes XLA
    pid = distributed.initialize(coordinator, num_processes, process_id)
    params.finalize()
    plan = distributed.plan(params.ref_sequences, n_r, n_q)
    n_r, n_q = plan.n_r, plan.n_q
    log(f"INFO, fastani_tpu, sharded run on a {n_r}x{n_q} (r, q) mesh, "
        f"process {pid}/{jax.process_count()}")

    t0 = time.time()
    sidx = pmesh.build_sharded_index(params, params.ref_sequences, n_r)
    log(f"INFO, fastani_tpu, {n_r} reference shards sketched in "
        f"{time.time()-t0:.2f}s")

    # query fragments for all query genomes (replicated; queries are the
    # small side, as in the reference)
    qfs = [pipeline.load_query_fragments(q, params)
           for q in params.query_sequences]
    F_max = max((len(q.frags) for q in qfs), default=0)
    F_local = max(-(-F_max // n_q), 1)
    rows_cap = max(128, -(-(n_q * F_local * max(sidx.max_local_genomes, 1))
                          // 128) * 128)

    cfg = jitmap.MapperConfig.from_params(
        params, sidx.freq_threshold,
        unit_factor=max(4, sidx.max_local_genomes + 2))
    cfg = cfg.__class__(**{**cfg.__dict__,
                           "unit_cap": F_local * max(4, sidx.max_local_genomes + 2),
                           "unit_chunk": min(128, max(8, F_local))})
    s_max = params.sketch_cap
    step = pmesh.make_sharded_rows_step(cfg, plan.mesh, s_max,
                                        params.kmer_size, params.frag_len,
                                        sidx.max_local_genomes, rows_cap)
    min_hits = jnp.asarray(stats.min_hits_lut(
        params.kmer_size, params.percentage_identity, s_max))
    gate = jnp.asarray(jitmap.gate_lut_np(
        params.kmer_size, params.percentage_identity, s_max))
    ident2d = jnp.asarray(pmesh.point_identity_lut(s_max, params.kmer_size))
    idx_arrays = distributed.shard_index_arrays(plan, sidx)

    final: List[ani.CGIResult] = []
    t0 = time.time()
    for qno, qf in enumerate(qfs):
        F_total = len(qf.frags)
        padded = np.zeros((n_q * F_local, params.frag_len), np.uint8)
        padded[:F_total] = qf.frags
        stacked = padded.reshape(n_q, F_local, params.frag_len)
        gid_rows, ib_rows, n_rows = step(
            jnp.asarray(stacked), idx_arrays["occ_hash"],
            idx_arrays["occ_sid"], idx_arrays["occ_wpos"],
            idx_arrays["mi_hash"], idx_arrays["mi_sid"],
            idx_arrays["mi_wpos"], idx_arrays["seq_start"],
            idx_arrays["genome_of_seq"], idx_arrays["n_occ"],
            min_hits, gate, ident2d)
        gid_rows, ib_rows, n_rows = distributed.gather_rows(
            gid_rows, ib_rows, n_rows)
        if (n_rows > rows_cap).any():
            raise RuntimeError("sharded rows_cap overflow; raise rows_cap")
        # exact host fold per (shard, local genome), frag-id remapping
        # back to global query seq ids is not needed (counts only)
        for r in range(n_r):
            n = int(n_rows[r])
            g_r = np.asarray(gid_rows[r][:n])
            i_r = np.asarray(ib_rows[r][:n]).view(np.float32)
            n_local = int(sidx.n_genomes[r])
            for gl in range(n_local):
                sel = g_r == gl
                cnt = int(sel.sum())
                if not cnt:
                    continue
                acc = np.float32(0.0)
                for v in i_r[sel]:
                    acc = np.float32(acc + v)
                final.append(ani.CGIResult(
                    qry_genome=qno,
                    ref_genome=gl * n_r + r,
                    count_seq=cnt,
                    total_query_fragments=qf.total_fragments,
                    identity=np.float32(acc / np.float32(cnt))))
    log(f"INFO, fastani_tpu, mapped {len(qfs)} queries on the mesh in "
        f"{time.time()-t0:.2f}s")

    if pid == 0 and params.out_file_name:
        from fastani_tpu.io import fasta

        genome_lengths = {}
        for e in list(params.query_sequences) + list(params.ref_sequences):
            if e not in genome_lengths:
                genome_lengths[e] = fasta.genome_length_for_ani(
                    e, params.frag_len)
        output.write_cgi(final, genome_lengths, params, params.out_file_name)
        if params.matrix_output:
            output.write_phylip(final, genome_lengths, params,
                                params.out_file_name)
    return final
