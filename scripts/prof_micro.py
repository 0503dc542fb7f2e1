"""Micro-profile of map_step substages on the live device.

Times each substage as its own jitted program (chained dispatches, one
sync) at the bench quick-workload shapes, so the per-batch budget in
PERF.md can be attributed to probes / gathers / sorts / compaction / walk
rather than inferred.  Run solo: concurrent device users skew everything.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()


def t_chain(fn, *a, reps=8):
    import jax

    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    outs = [fn(*a) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.time() - t0) / reps, out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=8)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--workdir", default=None)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastani_tpu.utils import jitops
    jax.devices()
    jitops.engage_sync()     # sync mode = honest per-call timings

    from bench import build_workload
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, l2walk, mapping, pipeline
    from fastani_tpu.ops import pallas_compact, pallas_sort
    from fastani_tpu.ops import pallas_winnow as pw
    from fastani_tpu.ops.xputils import lut_searchsorted

    genomes, size, B = a.genomes, a.size, 512
    wd = a.workdir or tempfile.mkdtemp(prefix="fastani_microprof_")
    paths = build_workload(wd, genomes, size)
    from bench import scaled_caps
    params = Parameters(frag_batch=B).finalize()
    scaled_caps(genomes, params)
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build_device(params)
    mapper = jitmap.JitMapper(params, index,
                              unit_factor=max(genomes + 2,
                                              int(1.7 * genomes) + 8),
                              unit_chunk=512)
    cfg = mapper.cfg
    k, w, l = cfg.kmer_size, cfg.window_size, cfg.frag_len
    print(f"device {jax.devices()[0]}  caps: scap={cfg.sketch_cap} "
          f"hits={cfg.hits_cap} cand={cfg.cand_cap} l2={cfg.l2_entry_cap} "
          f"ucap={cfg.unit_cap} uchunk={cfg.unit_chunk} "
          f"occ_rounds={cfg.occ_rounds}", flush=True)

    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    fr = np.zeros((B, l), np.uint8)
    take = min(B, len(queries[0].frags))
    fr[:take] = queries[0].frags[:take]
    if take < B:                      # fill with the next query's rows
        extra = queries[1].frags[: B - take]
        fr[take:take + len(extra)] = extra
    fd = jnp.asarray(fr)

    def row(name, dt, extra=""):
        print(f"{name:32s}: {dt*1e3:8.2f} ms  {extra}", flush=True)

    # async-dispatch canary: ~0.1 ms/dispatch when healthy; ~25 ms when a
    # constant-SMEM Mosaic call has knocked the client out of async mode
    cf = jax.jit(lambda a, b: a @ b)
    cx = jnp.ones((512, 512), jnp.bfloat16)

    def canary(tag):
        jax.block_until_ready(cf(cx, cx))
        t0 = time.time()
        outs = [cf(cx, cx) for _ in range(16)]
        for o in outs:
            jax.block_until_ready(o)
        print(f"  [canary after {tag}: "
              f"{(time.time()-t0)/16*1e3:.2f} ms/dispatch]", flush=True)

    canary("mapper init")

    # ---- sketch stage ------------------------------------------------------
    use, interp = pw.pallas_mode()

    @jax.jit
    def winnow_only(f):
        lens = jnp.full((B,), l, jnp.int32)
        return mapping.winnow_batched(jnp, f, k, w, lens)

    dt, (emit, h, _) = t_chain(winnow_only, fd)
    row("winnow kernel (frag rows)", dt)

    @jax.jit
    def sketch_full(f):
        return mapping.sketch_fragments(jnp, f, k, w, cfg.sketch_cap)

    dt, (qh, s, _) = t_chain(sketch_full, fd)
    row("sketch_fragments (full)", dt)
    canary("sketch")

    # ---- L1 substages ------------------------------------------------------
    @jax.jit
    def probes(qh, table, lut):
        lo = lut_searchsorted(jnp, table, lut, qh, cfg.occ_rounds, "left")
        hi = lut_searchsorted(jnp, table, lut, qh, cfg.occ_rounds, "right")
        return lo, hi

    dt, (lo, hi) = t_chain(probes, qh, mapper._occ_hash, mapper._occ_lut)
    row("L1 probes (2x lut descent)", dt)

    @jax.jit
    def expand(lo, hi, s):
        jj = jnp.arange(cfg.sketch_cap, dtype=jnp.int32)
        qvalid = jj < s[:, None]
        cnt = jnp.maximum(jnp.where(qvalid, hi - lo, 0), 0)
        cnt = jnp.where(cnt < cfg.freq_threshold, cnt, 0)
        cum = jnp.cumsum(cnt, axis=-1).astype(jnp.int32)
        hidx = jnp.arange(cfg.hits_cap, dtype=jnp.int32)
        cum_prev = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=-1)
        d = lo - cum_prev
        d_prev = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), d[:, :-1]], axis=-1)
        inc = d - d_prev
        pos = jnp.minimum(cum_prev, cfg.hits_cap - 1)
        arr = jnp.zeros((B, cfg.hits_cap), jnp.int32).at[
            jnp.arange(B, dtype=jnp.int32)[:, None], pos].add(inc)
        src = hidx[None, :] + jnp.cumsum(arr, axis=-1)
        hvalid = hidx[None, :] < jnp.minimum(cum[:, -1], cfg.hits_cap)[:, None]
        return jnp.clip(src, 0, len(index.occ_hash) - 1), hvalid

    dt, (src, hvalid) = t_chain(expand, lo, hi, s)
    row("L1 ragged expand", dt)

    @jax.jit
    def hit_gather(src, hvalid, packed_tab):
        return jnp.where(hvalid, packed_tab[src], jnp.uint32(0xFFFFFFFF))

    dt, keys = t_chain(hit_gather, src, hvalid, mapper._occ_packed)
    row("L1 hit gather (packed)", dt, f"({B}x{cfg.hits_cap})")

    @jax.jit
    def hit_sort(keys):
        return pallas_sort.sort_rows_u32(keys)

    dt, skeys = t_chain(hit_sort, keys)
    row("L1 hit sort (pallas)", dt)

    @jax.jit
    def full_l1(qh, s, occ_hash, occ_sid, occ_wpos, n_occ, occ_packed,
                occ_lut):
        return mapping.l1_candidates(
            jnp, qh, s, occ_hash, occ_sid, occ_wpos,
            mapper._min_hits, cfg.freq_threshold, l, cfg.hits_cap,
            cfg.cand_cap, n_occ=n_occ, wpos_bits=cfg.wpos_bits,
            occ_packed=occ_packed, occ_lut=occ_lut,
            occ_rounds=cfg.occ_rounds, m_values=cfg.m_values)

    dt, l1 = t_chain(full_l1, qh, s, mapper._occ_hash, mapper._occ_sid,
                     mapper._occ_wpos, mapper._n_occ, mapper._occ_packed,
                     mapper._occ_lut)
    row("L1 full", dt)
    canary("L1")

    # ---- unit compaction + window location --------------------------------
    @jax.jit
    def unit_pack(l1res):
        u_frag = jnp.repeat(jnp.arange(B, dtype=jnp.int32), cfg.cand_cap)
        u_sid = l1res.sid.reshape(-1)
        u_valid = l1res.valid.reshape(-1)
        N = B * cfg.cand_cap
        outs = pallas_compact.compact_rows(
            u_valid.reshape(1, -1),
            [(u_sid.reshape(1, -1), 0), (l1res.start.reshape(1, -1), 0),
             (l1res.end.reshape(1, -1), 0), (u_frag.reshape(1, -1), 0)])
        return [a[0, : cfg.unit_cap] for a in outs]

    dt, units = t_chain(unit_pack, l1)
    row("unit butterfly compact", dt, f"(width {B*cfg.cand_cap})")

    u_sid, u_start, u_end, u_frag = units
    n_valid = int(np.asarray(jax.jit(lambda v: v.sum())(l1.valid)))
    u_valid = jnp.arange(cfg.unit_cap, dtype=jnp.int32) < n_valid

    @jax.jit
    def wloc(u_sid, u_start, u_end, u_valid, mi_packed, mi_lut, n_occ):
        bits = cfg.wpos_bits
        sid_m = jnp.where(u_valid, u_sid, 0).astype(jnp.uint32)
        key = lambda pos: (sid_m << bits) | pos.astype(jnp.uint32)
        q2 = jnp.concatenate([key(u_start), key(u_end + l)])
        r2 = lut_searchsorted(jnp, mi_packed, mi_lut, q2,
                              cfg.mi_rounds, "left")
        r2 = jnp.minimum(r2, n_occ.reshape(-1)[0])
        return r2[: u_sid.shape[0]], r2[u_sid.shape[0]:]

    dt, (b0, eL) = t_chain(wloc, u_sid, u_start, u_end, u_valid,
                           mapper._mi_packed, mapper._mi_lut, mapper._n_occ)
    row("window locate (lut)", dt)

    # ---- L2: one chunk events + walk --------------------------------------
    U = cfg.unit_chunk
    sl = lambda a: a[:U]

    @jax.jit
    def ev_only(qh, s, u_frag, u_sid, u_start, u_end, u_valid, b0, eL,
                mi_hash, mi_sid, mi_wpos, mi_prev, mi_nxt):
        return l2walk.build_events(
            qh, s, sl(u_frag), sl(u_sid), sl(u_start), sl(u_end),
            sl(u_valid), mi_hash, mi_sid, mi_wpos,
            l, k, w, cfg.l2_entry_cap, begin_end=(sl(b0), sl(eL)),
            prev_g=mi_prev, nxt_g=mi_nxt)

    dt, (ev, aux) = t_chain(ev_only, qh, s, u_frag, u_sid, u_start, u_end,
                            u_valid, b0, eL, mapper._mi_hash,
                            mapper._mi_sid, mapper._mi_wpos,
                            mapper._mi_prev, mapper._mi_nxt)
    row(f"L2 build_events ({U} units)", dt)

    @jax.jit
    def walk_only(ev, s_u, n_ev):
        return l2walk.walk_pallas(ev, s_u, n_ev, cfg.sketch_cap)

    s_u, overflow, n_ev = aux
    dt, _ = t_chain(walk_only, ev, s_u, n_ev)
    row(f"L2 pallas walk ({U} units)", dt)
    canary("L2 walk")

    n_chunks = max(1, n_valid // U)
    print(f"(~{n_chunks} live chunks/batch at this workload)", flush=True)

    # ---- full step reference ----------------------------------------------
    step = lambda f: mapper._fn(
        f, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
        mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
        mapper._seq_start, mapper._min_hits, mapper._gate,
        mapper._n_occ, mapper._occ_packed, mapper._mi_packed,
        mapper._mi_prev, mapper._mi_nxt, mapper._occ_lut,
        mapper._mi_lut, None, None)
    dt, out = t_chain(step, fd)
    row("FULL map_step", dt, f"(valid={int(np.asarray(out['counts'])[0])})")


if __name__ == "__main__":
    main()
