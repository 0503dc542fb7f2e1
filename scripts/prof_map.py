"""Per-stage micro-profile of the jitted map step on the live device.

Reconstructs the map_step pipeline stage by stage with REAL intermediate
values from the bench workload, timing each jitted stage in chained
dispatch mode (sync once per rep block) so the tunnel's round-trip floor
does not pollute sub-10ms stages.

Run:  python scripts/prof_map.py [--genomes 8 --size 1000000]
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


def t_chain(fn, *a, reps=6):
    import jax

    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    outs = [fn(*a) for _ in range(reps)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=8)
    ap.add_argument("--size", type=int, default=1_000_000)
    ap.add_argument("--frag-batch", type=int, default=512)
    ap.add_argument("--unit-chunk", type=int, default=256)
    ap.add_argument("--workdir", default="",
                    help="reuse an existing workload directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_workload, scaled_caps
    from fastani_tpu.config import Parameters
    from fastani_tpu.index.sketch import ReferenceIndex
    from fastani_tpu.models import jitmap, l2walk, mapping, pipeline
    from fastani_tpu.ops import pallas_compact, pallas_sort
    from fastani_tpu.ops.xputils import lut_searchsorted

    workdir = args.workdir or tempfile.mkdtemp(prefix="fastani_prof_")
    paths = build_workload(workdir, args.genomes, args.size)
    params = Parameters(frag_batch=args.frag_batch).finalize()
    scaled_caps(len(paths), params)
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)
    index = ReferenceIndex.build_device(params)
    mapper = jitmap.JitMapper(params, index, unit_factor=len(paths) + 2,
                              unit_chunk=args.unit_chunk)
    cfg = mapper.cfg
    print(f"device={jax.devices()[0]}  entries={index.num_entries}  "
          f"caps: scap={cfg.sketch_cap} hits={cfg.hits_cap} "
          f"cand={cfg.cand_cap} ncap={cfg.l2_entry_cap} "
          f"U_cap={cfg.unit_cap} chunk={cfg.unit_chunk} "
          f"occ_rounds={cfg.occ_rounds} mi_rounds={cfg.mi_rounds}", flush=True)

    queries = [pipeline.load_query_fragments(p, params) for p in paths]
    frags = queries[0].frags[: params.frag_batch]
    if len(frags) < params.frag_batch:
        frags = np.concatenate([frags, np.zeros(
            (params.frag_batch - len(frags), params.frag_len), np.uint8)])
    fd = jnp.asarray(frags)
    F = fd.shape[0]
    k, w, l = cfg.kmer_size, cfg.window_size, cfg.frag_len

    R = {}

    # -- 1. sketch ----------------------------------------------------------
    sk = jax.jit(functools.partial(mapping.sketch_fragments, jnp,
                                   k=k, w=w, scap=cfg.sketch_cap))
    R["sketch total"], (qh, s, _) = t_chain(sk, fd)

    # sketch sub-pieces
    lens = jnp.full((F,), cfg.frag_len, jnp.int32)
    win = jax.jit(lambda fd: mapping.winnow_batched(jnp, fd, k, w, lens))
    R["  winnow kernel"], (emit, h, _) = t_chain(win, fd)

    # -- 2. L1 probes (index arrays as ARGS: a closure would embed the
    # 24M-entry tables and blow the remote-compile request limit) -------
    probe = jax.jit(lambda qh, oh, ol: (
        lut_searchsorted(jnp, oh, ol, qh, cfg.occ_rounds, "left"),
        lut_searchsorted(jnp, oh, ol, qh, cfg.occ_rounds, "right")))
    R["L1 probe lo/hi"], (lo, hi) = t_chain(
        probe, qh, mapper._occ_hash, mapper._occ_lut)

    # -- 3. L1 full ---------------------------------------------------------
    l1fn = jax.jit(lambda qh, s, oh, osid, owp, mh, no, opk, ol:
                   mapping.l1_candidates(
        jnp, qh, s, oh, osid, owp, mh, cfg.freq_threshold, l,
        cfg.hits_cap, cfg.cand_cap, n_occ=no, wpos_bits=cfg.wpos_bits,
        occ_packed=opk, occ_lut=ol, occ_rounds=cfg.occ_rounds))
    R["L1 total"], l1 = t_chain(
        l1fn, qh, s, mapper._occ_hash, mapper._occ_sid,
        mapper._occ_wpos, mapper._min_hits, mapper._n_occ,
        mapper._occ_packed, mapper._occ_lut)

    # L1 sub-pieces: expansion+gather / sort / chain-merge+leaders
    jj = jnp.arange(cfg.sketch_cap, dtype=jnp.int32)

    def expand_gather(qh, s, lo, hi, occ_packed, occ_hash):
        qvalid = jj < s[:, None]
        cnt = jnp.maximum(jnp.where(qvalid, hi - lo, 0), 0)
        cum = jnp.cumsum(cnt, axis=-1).astype(jnp.int32)
        hidx = jnp.arange(cfg.hits_cap, dtype=jnp.int32)
        cum_prev = jnp.concatenate([jnp.zeros((F, 1), jnp.int32),
                                    cum[:, :-1]], axis=-1)
        d = lo - cum_prev
        d_prev = jnp.concatenate([jnp.zeros((F, 1), jnp.int32),
                                  d[:, :-1]], axis=-1)
        inc = d - d_prev
        pos = jnp.minimum(cum_prev, cfg.hits_cap - 1)
        arr = jnp.zeros((F, cfg.hits_cap), jnp.int32).at[
            jnp.arange(F, dtype=jnp.int32)[:, None], pos].add(inc)
        src = hidx[None, :] + jnp.cumsum(arr, axis=-1)
        hvalid = hidx[None, :] < jnp.minimum(cum[:, -1], cfg.hits_cap)[:, None]
        src = jnp.clip(src, 0, occ_hash.shape[0] - 1)
        key = jnp.where(hvalid, occ_packed[src],
                        jnp.uint32(0xFFFFFFFF))
        return key

    eg = jax.jit(expand_gather)
    R["L1 expand+gather"], key = t_chain(eg, qh, s, lo, hi,
                                         mapper._occ_packed,
                                         mapper._occ_hash)

    srt = jax.jit(lambda key: pallas_sort.sort_rows_u32(key)
                  if pallas_sort.use_pallas_sort(True, cfg.hits_cap)
                  else jnp.sort(key, axis=-1))
    R["L1 hit sort"], _ = t_chain(srt, key)

    # -- 4. unit compaction (map_step grid -> U_cap) -------------------------
    N_grid = F * cfg.cand_cap

    def unit_compact(l1):
        u_frag = jnp.repeat(jnp.arange(F, dtype=jnp.int32), cfg.cand_cap)
        u_sid = l1.sid.reshape(-1)
        u_valid = l1.valid.reshape(-1)
        out = pallas_compact.compact_rows(
            u_valid.reshape(1, -1),
            [(u_sid.reshape(1, -1), 0), (l1.start.reshape(1, -1), 0),
             (l1.end.reshape(1, -1), 0), (u_frag.reshape(1, -1), 0)])
        return [a[0, : cfg.unit_cap] for a in out]

    if pallas_compact.use_pallas_compact(True, N_grid):
        uc = jax.jit(unit_compact)
        R["unit compact"], (u_sid, u_start, u_end, u_frag) = t_chain(uc, l1)
    else:
        print("unit compact: pallas off at this width", flush=True)
        u_frag = jnp.repeat(jnp.arange(F, dtype=jnp.int32), cfg.cand_cap)[
            : cfg.unit_cap]
        u_sid = l1.sid.reshape(-1)[: cfg.unit_cap]
        u_start = l1.start.reshape(-1)[: cfg.unit_cap]
        u_end = l1.end.reshape(-1)[: cfg.unit_cap]
    n_valid_units = int(l1.valid.sum())
    u_valid = jnp.arange(cfg.unit_cap, dtype=jnp.int32) < n_valid_units

    # -- 5. window location (mi probes) --------------------------------------
    bits = cfg.wpos_bits

    def wloc(u_sid, u_start, u_end, u_valid, mi_packed, mi_lut, n_occ):
        sid_m = jnp.where(u_valid, u_sid, 0).astype(jnp.uint32)
        keyf = lambda p: (sid_m << bits) | p.astype(jnp.uint32)
        q2 = jnp.concatenate([keyf(u_start), keyf(u_end + l)])
        r2 = lut_searchsorted(jnp, mi_packed, mi_lut, q2,
                              cfg.mi_rounds, "left")
        r2 = jnp.minimum(r2, n_occ.reshape(-1)[0])
        return r2[: u_sid.shape[0]], r2[u_sid.shape[0]:]

    wl = jax.jit(wloc)
    R["L2 window locate"], (u_b0, u_eL) = t_chain(
        wl, u_sid, u_start, u_end, u_valid, mapper._mi_packed,
        mapper._mi_lut, mapper._n_occ)

    # -- 6. L2 build_events + walk for one chunk -----------------------------
    UC = cfg.unit_chunk
    sl = lambda a: a[:UC]

    def events_one(u_sid, u_start, u_end, u_valid, u_b0, u_eL, u_frag,
                   mih, mis, miw, mpv, mnx):
        return l2walk.build_events(
            qh, s, sl(u_frag), sl(u_sid), sl(u_start), sl(u_end),
            sl(u_valid), mih, mis, miw,
            l, k, w, cfg.l2_entry_cap,
            begin_end=(sl(u_b0), sl(u_eL)),
            prev_g=mpv, nxt_g=mnx)

    evf = jax.jit(events_one)
    R["L2 events/chunk"], (ev, aux) = t_chain(
        evf, u_sid, u_start, u_end, u_valid, u_b0, u_eL, u_frag,
        mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
        mapper._mi_prev, mapper._mi_nxt)

    wk = jax.jit(lambda ev, s_u, n_ev: l2walk.walk_pallas(
        ev, s_u, n_ev, cfg.sketch_cap))
    R["L2 walk/chunk"], _ = t_chain(wk, ev, aux[0], aux[2])
    n_chunks_live = -(-n_valid_units // UC)
    R["L2 events+walk x chunks"] = (R["L2 events/chunk"]
                                    + R["L2 walk/chunk"]) * n_chunks_live

    # -- 7. full step -------------------------------------------------------
    step = lambda f: mapper._fn(
        f, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
        mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
        mapper._seq_start, mapper._min_hits, mapper._gate,
        mapper._n_occ, mapper._occ_packed, mapper._mi_packed,
        mapper._mi_prev, mapper._mi_nxt, mapper._occ_lut,
        mapper._mi_lut, None, None)
    R["FULL map step"], out = t_chain(step, fd)

    print(f"valid_units={n_valid_units} live_chunks={n_chunks_live}")
    for name, dt in R.items():
        print(f"  {name:28s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
