"""Jitted TPU mapping step.

Wraps the backend-generic kernels (models/mapping.py) into one jit-compiled
function over fixed-capacity buffers: fragment batch in, dense gated mapping
records out.  The identity/CI gate runs on device via a precomputed
min-shared-count LUT (the smallest c with upperBound(c,s) >= cutoff), so the
host only formats results.

Design notes (TPU):
* all shapes static: (F, frag_len) fragments, (F, cand_cap) candidate grid,
  unit list compacted on device to U_cap and processed in lax.map chunks to
  bound VMEM/HBM working set;
* everything is integer math (uint32 hashing, int32 positions); no floats
  on the device path at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastani_tpu.models import mapping
from fastani_tpu.ops import stats


@functools.lru_cache(maxsize=None)
def gate_lut_np(k: int, perc_identity: float, s_max: int) -> np.ndarray:
    """min_c[s] = smallest shared count whose CI upper bound passes the
    identity cutoff (computeMap.hpp:384); sentinel s_max+1 for s=0."""
    out = np.full(s_max + 1, s_max + 1, dtype=np.int32)
    for s in range(1, s_max + 1):
        _, upper = stats.identity_lut(s, k)
        ok = np.nonzero(upper >= np.float32(perc_identity))[0]
        out[s] = int(ok[0]) if len(ok) else s + 1
    return out


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    kmer_size: int
    window_size: int
    frag_len: int
    sketch_cap: int
    hits_cap: int
    cand_cap: int
    l2_entry_cap: int
    unit_cap: int        # max L2 work units per fragment batch
    unit_chunk: int      # units processed per lax.map step
    freq_threshold: int

    @classmethod
    def from_params(cls, params, freq_threshold: int, unit_factor: int = 4,
                    unit_chunk: int = 16) -> "MapperConfig":
        return cls(
            kmer_size=params.kmer_size,
            window_size=params.window_size,
            frag_len=params.frag_len,
            sketch_cap=params.sketch_cap,
            hits_cap=params.hits_cap,
            cand_cap=params.cand_cap,
            l2_entry_cap=params.l2_entry_cap,
            unit_cap=params.frag_batch * unit_factor,
            unit_chunk=unit_chunk,
            freq_threshold=freq_threshold,
        )


def map_step(cfg: MapperConfig, frags, occ_hash, occ_sid, occ_wpos,
             mi_hash, mi_sid, mi_wpos, seq_start, min_hits_lut, gate_lut):
    """One fragment batch against one index shard.  Pure function of arrays.

    Returns dict of (U_cap,) arrays: frag, sid, shared, sketch, mean_pos,
    valid (gated), plus overflow diagnostics.
    """
    xp = jnp
    F = frags.shape[0]
    k, w, l = cfg.kmer_size, cfg.window_size, cfg.frag_len

    qh, s, sk_over = mapping.sketch_fragments(xp, frags, k, w, cfg.sketch_cap)
    l1 = mapping.l1_candidates(xp, qh, s, occ_hash, occ_sid, occ_wpos,
                               min_hits_lut, cfg.freq_threshold, l,
                               cfg.hits_cap, cfg.cand_cap)

    # flatten + compact the candidate grid to U_cap units on device
    u_frag = jnp.repeat(jnp.arange(F, dtype=jnp.int32), cfg.cand_cap)
    u_sid = l1.sid.reshape(-1)
    u_start = l1.start.reshape(-1)
    u_end = l1.end.reshape(-1)
    u_valid = l1.valid.reshape(-1)
    order = jnp.argsort(jnp.where(u_valid, 0, 1).astype(jnp.int32), stable=True)
    take = order[: cfg.unit_cap]
    u_frag = u_frag[take]
    u_sid = u_sid[take]
    u_start = u_start[take]
    u_end = u_end[take]
    u_valid = u_valid[take]
    unit_overflow = u_valid.sum() < l1.valid.sum()  # units dropped

    # L2 in lax.map chunks
    n_chunks = -(-cfg.unit_cap // cfg.unit_chunk)
    pad = n_chunks * cfg.unit_chunk - cfg.unit_cap

    def pad_to(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    cu_frag = pad_to(u_frag).reshape(n_chunks, cfg.unit_chunk)
    cu_sid = pad_to(u_sid).reshape(n_chunks, cfg.unit_chunk)
    cu_start = pad_to(u_start).reshape(n_chunks, cfg.unit_chunk)
    cu_end = pad_to(u_end).reshape(n_chunks, cfg.unit_chunk)
    cu_valid = pad_to(u_valid.astype(jnp.int32)).reshape(n_chunks, cfg.unit_chunk) > 0

    def chunk_fn(args):
        cf, csid, cst, cen, cva = args
        r = mapping.l2_map_units(jnp, qh, s, cf, csid, cst, cen, cva,
                                 mi_hash, mi_sid, mi_wpos, seq_start,
                                 l, k, w, cfg.l2_entry_cap)
        return r.shared, r.mean_pos, r.valid, r.overflow

    shared, mean_pos, l2_valid, l2_over = jax.lax.map(
        chunk_fn, (cu_frag, cu_sid, cu_start, cu_end, cu_valid))
    shared = shared.reshape(-1)[: cfg.unit_cap]
    mean_pos = mean_pos.reshape(-1)[: cfg.unit_cap]
    l2_valid = l2_valid.reshape(-1)[: cfg.unit_cap]
    l2_over = l2_over.reshape(-1)[: cfg.unit_cap]

    # identity gate on device: shared >= gate_lut[s]
    s_u = s[u_frag]
    gated = l2_valid & (shared >= gate_lut[jnp.clip(s_u, 0, gate_lut.shape[0] - 1)])

    return dict(
        frag=u_frag, sid=u_sid, shared=shared, sketch=s_u, mean_pos=mean_pos,
        valid=gated & ~l2_over,
        frag_sketch_overflow=sk_over,          # (F,)
        l1_overflow=l1.overflow,               # (F,)
        l2_overflow=l2_over, l2_unit_valid=l2_valid,
        unit_frag_overflow=unit_overflow,
    )


class JitMapper:
    """Compiled mapping step bound to one index shard resident on device."""

    def __init__(self, params, index, unit_factor: int = 4, unit_chunk: int = 16):
        self.params = params
        self.index = index
        self.cfg = MapperConfig.from_params(params, index.freq_threshold,
                                            unit_factor, unit_chunk)
        k = params.kmer_size
        s_max = max(params.sketch_cap, 1)
        self._min_hits = jnp.asarray(stats.min_hits_lut(k, params.percentage_identity, s_max))
        self._gate = jnp.asarray(gate_lut_np(k, params.percentage_identity, s_max))
        self._occ_hash = jnp.asarray(index.occ_hash)
        self._occ_sid = jnp.asarray(index.occ_seqid)
        self._occ_wpos = jnp.asarray(index.occ_wpos)
        self._mi_hash = jnp.asarray(index.mi_hash)
        self._mi_sid = jnp.asarray(index.mi_seqid)
        self._mi_wpos = jnp.asarray(index.mi_wpos)
        self._seq_start = jnp.asarray(index.seq_start)
        self._fn = jax.jit(functools.partial(map_step, self.cfg))

    def __call__(self, frags_u8: np.ndarray) -> Dict[str, np.ndarray]:
        F = frags_u8.shape[0]
        B = self.params.frag_batch
        if F < B:  # pad batch to the static size
            padded = np.zeros((B, frags_u8.shape[1]), np.uint8)
            padded[:F] = frags_u8
            frags_u8 = padded
        out = self._fn(jnp.asarray(frags_u8), self._occ_hash, self._occ_sid,
                       self._occ_wpos, self._mi_hash, self._mi_sid,
                       self._mi_wpos, self._seq_start, self._min_hits,
                       self._gate)
        host = {k2: np.asarray(v) for k2, v in out.items()}
        if F < B:  # strip padding rows
            keep = host["frag"] < F
            for k2 in ("frag", "sid", "shared", "sketch", "mean_pos", "valid",
                       "l2_overflow", "l2_unit_valid"):
                host[k2] = host[k2][keep]
            host["frag_sketch_overflow"] = host["frag_sketch_overflow"][:F]
            host["l1_overflow"] = host["l1_overflow"][:F]
        return host
