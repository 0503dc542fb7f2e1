"""Product entry for sharded (multi-device / multi-host) many-to-many runs.

Drives the (r, q) mesh pipeline end to end — distributed shard build,
sharded mapping step, exact host fold, output writers — replacing the
reference driver's OpenMP shard loop + merge (reference:
src/cgi/core_genome_identity.cpp:46-141) and its shell-level multi-node
splitting (scripts/splitDatabase.sh:14-39).

Exactness: the device step returns each reference shard's 2-way survivor
rows in 2-way sort order (parallel/mesh.make_sharded_rows_step); the host
folds identities per (shard, local genome) sequentially in that order, so
TSV/.matrix/.visual output is BIT-IDENTICAL to the single-shard run for
any mesh shape and host count — the reference's thread-invariance contract
(tests/fastani_tests.cpp:199-255).  Local->global genome ids follow the
correctRefGenomeIds law: global = local * n_r + r
(computeCoreIdentity.hpp:457-474, :480-487).

Scaling: each process sketches ONLY the reference shards its addressable
devices own (the reference builds one Sketch per OpenMP split,
winSketch.hpp:109-115); shard padding dims are agreed via a tiny
allgather, and global index arrays assemble from per-device buffers —
nothing is replicated across hosts.  --saveIndex/--loadIndex persist each
shard as ``{prefix}.r{r}of{n_r}.npz``.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import List, Optional

import numpy as np

from fastani_tpu.config import Parameters
from fastani_tpu.models import ani, jitmap, output, pipeline
from fastani_tpu.parallel import distributed, mesh as pmesh


def _exact_group_folds(g_r: np.ndarray, i_r: np.ndarray, n_groups: int):
    """Per-group sequential float32 left-folds of ``i_r`` in row order,
    vectorized over groups.

    Bit-exactness: each group's values are laid out by within-group rank
    (stable sort preserves row order) and iteration j adds every group's
    j-th value; missing slots add +0.0f, an exact identity for the
    non-negative identity sums folded here.  The result is therefore
    IDENTICAL to the scalar ``for v in vals: acc = float32(acc + v)``
    loop per group (the reference's omp-critical merge order,
    core_genome_identity.cpp:112-115) while doing O(max_group) vector ops
    instead of O(rows) Python ops — the round-3 fold was the host
    bottleneck of the path built for 1000-genome scale.

    Returns (sums (n_groups,) float32, counts (n_groups,) int64).
    """
    cnt = np.bincount(g_r, minlength=n_groups).astype(np.int64)
    m = int(cnt.max(initial=0))
    acc = np.zeros(n_groups, np.float32)
    if not m:
        return acc, cnt
    order = np.argsort(g_r, kind="stable")
    sg = g_r[order]
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    rank = np.arange(len(g_r), dtype=np.int64) - starts[sg]
    mat = np.zeros((n_groups, m), np.float32)
    mat[sg, rank] = i_r[order]
    for j in range(m):
        acc = acc + mat[:, j]          # f32 + f32 stays f32; pads are +0.0
    return acc, cnt


def _shard_sanity(sidx, max_ratio_diff: float):
    """Per-shard repeat sanity ratios (winSketch.hpp:298-318; reported per
    split at core_genome_identity.cpp:125-130).  Returns (ok (n_r,) bool,
    ratio_diff (n_r,) float32); only owned rows are meaningful."""
    n_r = sidx.n_r
    ok = np.ones(n_r, bool)
    diffs = np.zeros(n_r, np.float32)
    for r in (sidx.owned_rows if sidx.owned_rows is not None
              else range(n_r)):
        total = float(sidx.n_occ[r])
        uniq = float(sidx.n_uniques[r])
        length = float(sidx.total_lengths[r])
        if total == 0 or uniq == 0:
            ok[r] = False
            diffs[r] = np.float32("nan")
            continue
        hr = np.float32(length) / np.float32(total)
        ur = np.float32(length) / np.float32(uniq)
        diffs[r] = abs(np.float32(hr) - np.float32(ur))
        ok[r] = not (diffs[r] > max_ratio_diff)
    return ok, diffs


def _write_outputs(final: List[ani.CGIResult], params: Parameters) -> None:
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


def run_sharded_fused(params: Parameters, n_r: Optional[int] = None,
                      n_q: Optional[int] = None,
                      coordinator: Optional[str] = None,
                      num_processes: Optional[int] = None,
                      process_id: Optional[int] = None,
                      backend: str = "jax", fuse_k: int = 16,
                      stats: Optional[dict] = None,
                      log=lambda m: print(m, file=sys.stderr)
                      ) -> List[ani.CGIResult]:
    """THROUGHPUT sharded run: the fused zero-fetch device-CGI stream on
    the (r, q) mesh.

    The whole mapping+aggregation runs as few large jitted programs
    (parallel/mesh.make_fused_mesh_stream_step — K batches per dispatch,
    in-scan query finalize, q-axis pmax merge) with ONE readout of the
    per-shard (Gq, G_local) accumulators at the end — no per-query
    dispatch and no per-query host gather, the program shape the
    platform's latency model requires (utils/jitops docstring).  ANI
    values equal the exact path's within float32 summation order
    (BASELINE 0.1-ANI tolerance); byte-parity/--visualize runs use
    run_sharded (the rows step + exact host fold).

    Reference parity: the omp shard loop + critical merge
    (core_genome_identity.cpp:55-121) and splitDatabase.sh multi-node
    scale-out, replaced by jax collectives over the mesh.
    """
    import jax
    import jax.numpy as jnp

    from fastani_tpu.models import device_cgi, pipeline
    from fastani_tpu.ops import stats as mstats
    from fastani_tpu.utils import jitops
    from jax.sharding import PartitionSpec as P

    pid = distributed.initialize(coordinator, num_processes, process_id)
    params.finalize()
    plan = distributed.plan(params.ref_sequences, n_r, n_q)
    n_r, n_q = plan.n_r, plan.n_q
    log(f"INFO, fastani_tpu, fused sharded run on a {n_r}x{n_q} (r, q) "
        f"mesh, process {pid}/{jax.process_count()}")

    t0 = time.time()
    multi = jax.process_count() > 1
    rows_own = plan.my_r_rows if multi else None
    device_build = (backend == "jax" and jax.default_backend() == "tpu")
    # n_r == 1 single-process on the real device: the one shard IS the
    # whole index — build it DEVICE-RESIDENT and wrap its arrays as the
    # (1, M) mesh shards in place (device_put on the same device copies
    # nothing across the link).  The generic path would pull the whole
    # index to host (host_view) and re-upload it — minutes through the
    # ~1 MB/s D2H tunnel at bench scale.
    dev_resident = (n_r == 1 and not multi and device_build
                    and not params.sanity_check and not params.save_index
                    and not params.load_index)
    index = None
    if dev_resident:
        from fastani_tpu.index.sketch import ReferenceIndex

        index = ReferenceIndex.build_device(params)
        shards = {}
        G = max(len(params.ref_sequences), 1)
        wpos_bits = None
        occ_rounds = mi_rounds = None
        freq_thr = index.freq_threshold
        log(f"INFO, fastani_tpu, device-resident 1-shard index enqueued "
            f"in {time.time()-t0:.2f}s")
    else:
        shards = pmesh.build_shards(
            params, params.ref_sequences, n_r, rows=rows_own,
            device=device_build, save_prefix=params.save_index,
            load_prefix=params.load_index)
        dims = pmesh.local_shard_dims(shards, params.ref_sequences, n_r,
                                      params.frag_len)
        if multi:
            dims = distributed.allgather_shard_dims(dims)
        sidx = pmesh.build_sharded_index(
            params, params.ref_sequences, n_r, rows=rows_own,
            shards=shards, dims=dims)
        log(f"INFO, fastani_tpu, {len(sidx.owned_rows)} of {n_r} "
            f"reference shards sketched in {time.time()-t0:.2f}s")

        sane = np.ones(n_r, bool)
        if params.sanity_check:
            sane, diffs = _shard_sanity(sidx, params.max_ratio_diff)
            for r in range(n_r):
                if not sane[r]:
                    log(f"ERROR :: SPLIT {r}'s ratio difference "
                        f"{diffs[r]} exceeds maximum thresholds.")
            for r in np.nonzero(~sane)[0]:
                if sidx.owned_rows is None or r in sidx.owned_rows:
                    sidx.occ_hash[r] = 0xFFFFFFFF
                    sidx.n_occ[r] = 0
        G = sidx.max_local_genomes
        wpos_bits = sidx.wpos_bits
        occ_rounds, mi_rounds = sidx.occ_rounds, sidx.mi_rounds
        freq_thr = sidx.freq_threshold

    stream = pipeline.FragmentStream(list(params.query_sequences), params)
    n_queries = len(stream.queries)
    B_local = max(1, -(-params.frag_batch // n_q))
    B_global = B_local * n_q
    L = params.frag_len
    starts, fins, tail, n_slots, fin_cap = pipeline.cgi_stream_schedule(
        stream, B_global, n_queries)

    uf = max(4, int(1.7 * G) + 8)
    cfg = jitmap.MapperConfig.from_params(params, freq_thr)
    cfg = dataclasses.replace(
        cfg, unit_cap=min(B_local * uf, B_local * params.cand_cap),
        unit_chunk=min(512, max(8, B_local)),
        wpos_bits=wpos_bits, occ_rounds=occ_rounds, mi_rounds=mi_rounds)
    s_max = params.sketch_cap
    place = lambda a, spec: distributed._place(plan, a, spec)
    rep = P()
    min_hits = place(np.asarray(mstats.min_hits_lut(
        params.kmer_size, params.percentage_identity, s_max)), rep)
    gate = place(np.asarray(jitmap.gate_lut_np(
        params.kmer_size, params.percentage_identity, s_max)), rep)
    ident_lut = place(np.asarray(device_cgi.identity_lut_full(
        params.kmer_size, s_max)), rep)

    if dev_resident:
        # harvest the JitMapper's device-side index prep (padding, packed
        # keys, probe LUTs, prev/next links) — all in HBM, zero fetches
        mapper = jitmap.JitMapper(params, index)
        # probe-pass hits_cap auto-tune (pipeline.autotune_hits_cap):
        # every L1 stage scales with this width and the mesh step
        # compiles fresh per shape anyway
        tuned = pipeline.autotune_hits_cap(mapper, stream, params)
        log(f"INFO, fastani_tpu, hits_cap auto-tuned to {tuned}")
        cfg = dataclasses.replace(
            cfg, hits_cap=tuned, wpos_bits=mapper.cfg.wpos_bits,
            occ_rounds=None, mi_rounds=None)
        from jax.sharding import NamedSharding

        r2 = NamedSharding(plan.mesh, P("r", None))
        r1 = NamedSharding(plan.mesh, P("r"))
        dput = jax.device_put
        idx_arrays = {
            "occ_hash": dput(mapper._occ_hash[None], r2),
            "occ_sid": dput(mapper._occ_sid[None], r2),
            "occ_wpos": dput(mapper._occ_wpos[None], r2),
            "mi_hash": dput(mapper._mi_hash[None], r2),
            "mi_sid": dput(mapper._mi_sid[None], r2),
            "mi_wpos": dput(mapper._mi_wpos[None], r2),
            "occ_packed": dput(mapper._occ_packed[None], r2),
            "mi_packed": dput(mapper._mi_packed[None], r2),
            "occ_lut": dput(mapper._occ_lut[None], r2),
            "mi_lut": dput((mapper._mi_lut
                            if mapper._mi_lut is not None
                            else mapper._occ_lut)[None], r2),
            "mi_prev": dput(mapper._mi_prev[None], r2),
            "mi_nxt": dput(mapper._mi_nxt[None], r2),
            "seq_start": dput(mapper._seq_start[None], r2),
            "n_occ": dput(mapper._n_occ.reshape(1), r1),
            "freq_threshold": place(
                np.asarray([freq_thr], np.int32), P("r")),
        }
        bin_start, gid_of_bin = device_cgi.make_bin_tables(
            [c.length for c in index.metadata], index.genome_of_seq(),
            params.frag_len)
        B_cap = max(128, 1 << max(len(gid_of_bin) - 1, 1).bit_length())
        gb = np.full(B_cap, G, np.int32)
        gb[:len(gid_of_bin)] = gid_of_bin
        sb = np.zeros(B_cap, np.int32)
        width = params.frag_len - 20
        lens = np.asarray([c.length for c in index.metadata], np.int64)
        nb = lens // width + 1
        if len(lens):
            sb[:int(nb.sum())] = np.repeat(
                np.arange(len(lens), dtype=np.int32), nb)
        S = len(index.metadata)
        bs_p = np.zeros(max(S + 1, 2), np.int32)
        bs_p[:len(bin_start)] = bin_start
        idx_arrays["bin_start"] = place(bs_p[None], P("r", None))
        idx_arrays["sid_of_bin"] = place(sb[None], P("r", None))
        idx_arrays["gid_of_bin"] = place(gb[None], P("r", None))
        idx_arrays["genome_of_seq"] = place(
            index.genome_of_seq().astype(np.int32)[None], P("r", None))
    else:
        idx_arrays = distributed.shard_index_arrays(plan, sidx)
        idx_arrays.pop("n_genomes", None)
        B_cap = sidx.gid_of_bin.shape[1]
    dev4 = P("r", "q", None, None)
    tab = place(np.full((n_r, n_q, n_slots, B_cap), -1, np.int32), dev4)
    acc_c = place(np.zeros((n_r, n_q, n_queries, G), np.int32), dev4)
    acc_s = place(np.zeros((n_r, n_q, n_queries, G), np.float32), dev4)

    packed_h2d = getattr(stream, "all_pure_acgt", False) and L % 4 == 0
    step = pmesh.make_fused_mesh_stream_step(
        cfg, plan.mesh, fuse_k, fin_cap, n_slots, n_queries, G, L,
        B_local, packed_frags=packed_h2d)
    fin_step = pmesh.make_mesh_finalize_step(plan.mesh, fin_cap, n_slots,
                                             n_queries, G)

    t0 = time.time()
    F = stream.F
    counts_list, fb_list = [], []
    q_spec3 = P(None, "q", None)
    for c0 in range(0, len(starts), fuse_k):
        grp = starts[c0:c0 + fuse_k]
        frags_k = np.zeros((fuse_k, B_global, L), np.uint8)
        qno_k = np.zeros((fuse_k, B_global), np.int32)
        qsid_k = np.zeros((fuse_k, B_global), np.int32)
        rv_k = np.zeros((fuse_k, B_global), bool)
        fin_k = np.full((fuse_k, fin_cap), -1, np.int32)
        for j, b0 in enumerate(grp):
            batch, qno_row, gid_row, n_used = stream.make_batch(b0,
                                                                B_global)
            frags_k[j] = batch
            qno_k[j] = qno_row
            qsid_k[j] = gid_row
            rv_k[j, :n_used] = True
            fl = fins[c0 + j]
            fin_k[j, :len(fl)] = fl
        shape4 = (fuse_k, n_q, B_local)
        from fastani_tpu.ops import hashing as _hash

        frags_send = frags_k.reshape(shape4 + (L,))
        if packed_h2d:
            frags_send = _hash.pack2_np(frags_send)
        tab, acc_c, acc_s, counts_k, fb_k = step(
            place(frags_send, P(None, "q", None, None)),
            place(qno_k.reshape(shape4), q_spec3),
            place(qsid_k.reshape(shape4), q_spec3),
            place(rv_k.reshape(shape4), q_spec3),
            place(fin_k, rep), tab, acc_c, acc_s, idx_arrays, min_hits,
            gate, ident_lut)
        counts_list.append(counts_k)
        fb_list.append(fb_k)
        if grp:
            nb = grp[-1] + B_global
            stream.evict_up_to(stream.qno_of_row(nb) if nb < F
                               else n_queries)
    for t0f in range(0, len(tail), fin_cap):
        buf = np.full(fin_cap, -1, np.int32)
        chunk = tail[t0f:t0f + fin_cap]
        buf[:len(chunk)] = chunk
        tab, acc_c, acc_s = fin_step(place(buf, rep), tab, acc_c, acc_s,
                                     idx_arrays["gid_of_bin"])

    # ---- single readout ---------------------------------------------------
    acc_c_h, acc_s_h = distributed.gather_rows(acc_c, acc_s)
    if index is not None and index.check_build_overflow():
        # degenerate repeat input dropped minimizers in the device build:
        # redo through the exact host-shard build (rare)
        log("INFO, fastani_tpu, device index build overflowed; "
            "rerunning with host-built shards")
        return run_sharded_fused(params, n_r, n_q, coordinator,
                                 num_processes, process_id,
                                 backend="numpy", fuse_k=fuse_k,
                                 stats=stats, log=log)
    if stats is not None and counts_list:
        cm = np.stack([np.asarray(jitops.fetch(c)) for c in counts_list])
        for i, key in enumerate((
                "n_valid", "sk_overflow", "l1_overflow", "l2_overflow",
                "unit_overflow", "max_hits", "max_groups", "max_s",
                "max_span", "n_units", "sum_hits")):
            stats[key] = int(cm[..., i].max()) if cm.size else 0
        stats["batches"] = len(starts)
        stats["fallback_frags"] = 0

    n_ref = len(params.ref_sequences)
    counts = np.zeros((n_queries, n_ref), np.int64)
    sums = np.zeros((n_queries, n_ref), np.float32)
    for r in range(n_r):
        n_local = len(pmesh.shard_files(params.ref_sequences, n_r, r))
        if n_local:
            gcols = np.arange(n_local) * n_r + r    # correctRefGenomeIds
            counts[:, gcols] = acc_c_h[r, 0][:, :n_local]
            sums[:, gcols] = acc_s_h[r, 0][:, :n_local]

    # fallback redo: query genomes with cap-overflowed fragments are
    # recomputed exactly per shard on host and their rows replaced (rare;
    # bench asserts zero)
    if fb_list and jitops.any_of(fb_list):
        bad_qnos = set()
        n_fb = 0
        for g, fb in enumerate(fb_list):
            m = np.asarray(jitops.fetch(fb))     # (n_r, n_q, K, B_local)
            hit = m.any(axis=0)                  # (n_q, K, B_local)
            for qd, kk, row in zip(*np.nonzero(hit)):
                b0 = starts[g * fuse_k + int(kk)]
                grow = b0 + int(qd) * B_local + int(row)
                if grow < F:
                    n_fb += 1
                    bad_qnos.add(stream.qno_of_row(grow))
        if stats is not None:
            stats["fallback_frags"] = n_fb
        if bad_qnos:
            from fastani_tpu.index.sketch import ReferenceIndex
            from fastani_tpu.models import ani as _ani

            for qno in sorted(bad_qnos):
                counts[qno, :] = 0
                sums[qno, :] = 0.0
                qf = stream.get_query(qno)
                for r in range(n_r):
                    ix = shards.get(r)
                    if ix is None:
                        ix = ReferenceIndex.build(
                            params, pmesh.shard_files(
                                params.ref_sequences, n_r, r))
                    mappings = pipeline.map_query(qf, ix, params,
                                                  backend="numpy")
                    rws, _ = _ani.compute_cgi(
                        mappings, ix.genome_of_seq(), params.frag_len,
                        qno, qf.total_fragments)
                    for cg in rws:
                        gidg = cg.ref_genome * n_r + r
                        counts[qno, gidg] = cg.count_seq
                        sums[qno, gidg] = (np.float32(cg.identity)
                                           * np.float32(cg.count_seq))
    log(f"INFO, fastani_tpu, mapped {n_queries} queries "
        f"({F} fragments) on the fused mesh in {time.time()-t0:.2f}s")

    final = ani.results_from_matrices(counts, sums,
                                      stream.total_fragments)
    if pid == 0 and params.out_file_name:
        _write_outputs(final, params)
    return final


def run_sharded(params: Parameters, n_r: Optional[int] = None,
                n_q: Optional[int] = None,
                coordinator: Optional[str] = None,
                num_processes: Optional[int] = None,
                process_id: Optional[int] = None,
                backend: str = "numpy",
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
    multi = jax.process_count() > 1
    rows = plan.my_r_rows if multi else None
    device_build = (backend == "jax" and jax.default_backend() == "tpu")
    shards = pmesh.build_shards(
        params, params.ref_sequences, n_r, rows=rows, device=device_build,
        save_prefix=params.save_index, load_prefix=params.load_index)
    dims = pmesh.local_shard_dims(shards, params.ref_sequences, n_r,
                                  params.frag_len)
    if multi:
        # agree on global padding widths so every process places
        # identically shaped buffers (this process never sees the other
        # hosts' shard contents)
        dims = distributed.allgather_shard_dims(dims)
    sidx = pmesh.build_sharded_index(
        params, params.ref_sequences, n_r, rows=rows, shards=shards,
        dims=dims)
    log(f"INFO, fastani_tpu, {len(sidx.owned_rows)} of {n_r} reference "
        f"shards sketched in {time.time()-t0:.2f}s")

    # per-shard repeat sanity check (reference: per split)
    sane = np.ones(n_r, bool)
    if params.sanity_check:
        sane, diffs = _shard_sanity(sidx, params.max_ratio_diff)
        if multi:
            from jax.experimental import multihost_utils

            owned = np.zeros(n_r, bool)
            owned[list(sidx.owned_rows)] = True
            allsane = multihost_utils.process_allgather(
                np.where(owned, sane, True))
            alldiff = multihost_utils.process_allgather(
                np.where(owned, diffs, 0.0))
            sane = allsane.all(axis=0)
            diffs = alldiff.max(axis=0)
        for r in range(n_r):
            if not sane[r]:
                log(f"ERROR :: SPLIT {r}'s ratio difference {diffs[r]} "
                    f"exceeds maximum thresholds.")
        # offending shards contribute no mappings (the reference skips the
        # split's whole map loop, core_genome_identity.cpp:79-80)
        for r in np.nonzero(~sane)[0]:
            if sidx.owned_rows is None or r in sidx.owned_rows:
                sidx.occ_hash[r] = 0xFFFFFFFF
                sidx.n_occ[r] = 0

    # query fragments stream lazily (replicated across processes; queries
    # are the small side, as in the reference): the counting pass fixes
    # the padded batch geometry, then genomes load per-iteration and evict
    stream = pipeline.FragmentStream(list(params.query_sequences), params)
    n_queries = len(stream.queries)
    F_max = max((stream.meta[i][0] for i in range(n_queries)), default=0)
    F_local = max(-(-F_max // n_q), 1)
    rows_cap = max(128, -(-(n_q * F_local * max(sidx.max_local_genomes, 1))
                          // 128) * 128)

    def make_cfg():
        cfg = jitmap.MapperConfig.from_params(
            params, sidx.freq_threshold,
            unit_factor=max(4, sidx.max_local_genomes + 2))
        return dataclasses.replace(
            cfg,
            unit_cap=min(F_local * max(4, sidx.max_local_genomes + 2),
                         F_local * params.cand_cap),
            unit_chunk=min(128, max(8, F_local)),
            wpos_bits=sidx.wpos_bits,
            occ_rounds=sidx.occ_rounds, mi_rounds=sidx.mi_rounds)

    cfg = make_cfg()
    s_max = params.sketch_cap
    min_hits = jnp.asarray(stats.min_hits_lut(
        params.kmer_size, params.percentage_identity, s_max))
    gate = jnp.asarray(jitmap.gate_lut_np(
        params.kmer_size, params.percentage_identity, s_max))
    ident2d = jnp.asarray(pmesh.point_identity_lut(s_max, params.kmer_size))
    idx_arrays = distributed.shard_index_arrays(plan, sidx)
    idx_arrays.pop("n_genomes", None)

    step = pmesh.make_sharded_rows_step(cfg, plan.mesh, s_max,
                                        params.kmer_size, params.frag_len,
                                        sidx.max_local_genomes, rows_cap)

    final: List[ani.CGIResult] = []
    visual_by_q: List[list] = [[] for _ in range(n_queries)]
    t0 = time.time()
    for qno in range(n_queries):
        qf = stream.get_query(qno)
        F_total = len(qf.frags)
        padded = np.zeros((n_q * F_local, params.frag_len), np.uint8)
        padded[:F_total] = qf.frags
        stream.evict_up_to(qno + 1)
        stacked = jnp.asarray(padded.reshape(n_q, F_local, params.frag_len))
        while True:
            outs = step(stacked, idx_arrays, min_hits, gate, ident2d)
            outs = distributed.gather_rows(*outs)
            (gid_rows, ib_rows, sid_rows, pos_rows, qsid_rows,
             n_rows) = outs
            if not (n_rows > rows_cap).any():
                break
            # graceful overflow: double the row capacity and re-run this
            # query (recompile is rare and bounded)
            rows_cap = int(max(n_rows.max(), 2 * rows_cap))
            rows_cap = -(-rows_cap // 128) * 128
            log(f"INFO, fastani_tpu, survivor rows exceeded capacity; "
                f"retrying query {qno + 1} with rows_cap={rows_cap}")
            step = pmesh.make_sharded_rows_step(
                cfg, plan.mesh, s_max, params.kmer_size, params.frag_len,
                sidx.max_local_genomes, rows_cap)
        # exact host fold per (shard, local genome), in 2-way row order —
        # vectorized over genomes, bit-identical to the scalar loop
        for r in range(n_r):
            n = int(n_rows[r])
            g_r = np.asarray(gid_rows[r][:n])
            i_r = np.asarray(ib_rows[r][:n]).view(np.float32)
            # known from the round-robin law on every process, whether or
            # not this process owns (sketched) shard r
            n_local = len(pmesh.shard_files(params.ref_sequences, n_r, r))
            sums, cnts = _exact_group_folds(g_r, i_r, n_local)
            for gl in np.nonzero(cnts)[0]:
                final.append(ani.CGIResult(
                    qry_genome=qno,
                    ref_genome=int(gl) * n_r + r,
                    count_seq=int(cnts[gl]),
                    total_query_fragments=stream.total_fragments(qno),
                    identity=np.float32(sums[gl] / np.float32(cnts[gl]))))
        if params.visualize:
            # merge shards into the single-device 2-way order: (sid, bin)
            # groups are disjoint across shards, so a host sort by
            # (global sid, pos bin) reproduces compute_cgi_arrays' order
            cols = []
            for r in range(n_r):
                n = int(n_rows[r])
                if not n:
                    continue
                sid_l = np.asarray(sid_rows[r][:n])
                gsid = sidx.global_sid[r][np.clip(sid_l, 0,
                                                  sidx.global_sid.shape[1] - 1)]
                cols.append(np.stack([
                    gsid,
                    np.asarray(pos_rows[r][:n]),
                    np.asarray(qsid_rows[r][:n]),
                    np.asarray(ib_rows[r][:n]),
                    np.asarray(gid_rows[r][:n]) * n_r + r]))
            if cols:
                allc = np.concatenate(cols, axis=1)
                b = allc[1] // (params.frag_len - 20)
                order = np.lexsort((b, allc[0]))
                visual_by_q[qno] = [ani.VisualRow(
                    genome_id=int(allc[4, i]), ref_seq_id=int(allc[0, i]),
                    query_seq_id=int(allc[2, i]), ref_start=int(allc[1, i]),
                    query_start=0,
                    identity=allc[3, i:i + 1].view(np.float32)[0])
                    for i in order]
    log(f"INFO, fastani_tpu, mapped {n_queries} queries on the mesh in "
        f"{time.time()-t0:.2f}s")

    if pid == 0 and params.out_file_name:
        from fastani_tpu.io import fasta

        genome_lengths = {}
        for e in list(params.query_sequences) + list(params.ref_sequences):
            if e not in genome_lengths:
                genome_lengths[e] = fasta.genome_length_for_ani(
                    e, params.frag_len)
        out_path = params.out_file_name
        if params.visualize:
            # global per-contig offsets over ALL reference contigs, exactly
            # like the single-device path (pipeline.run)
            ref_lens = [len(seq) for rf in params.ref_sequences
                        for _, seq in fasta.read_sequences(rf)]
            ref_offsets = np.concatenate(
                [[0], np.cumsum(ref_lens)[:-1]]) if ref_lens \
                else np.zeros(0, np.int64)
            open(out_path + ".visual", "w").close()
            for qno in range(n_queries):
                output.write_visual(visual_by_q[qno], params, qno,
                                    stream.vis_offsets(qno), ref_offsets,
                                    out_path, append=True)
        output.write_cgi(final, genome_lengths, params, out_path)
        if params.matrix_output:
            output.write_phylip(final, genome_lengths, params, out_path)
    return final
