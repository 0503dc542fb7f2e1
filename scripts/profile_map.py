"""Break down where mapping wall time goes on the session TPU.

Times, for one 512-fragment batch:
  1. H2D upload of the batch,
  2. device compute (jitted map_step_packed, output left on device),
  3. D2H fetch of the packed result prefix,
and one batched winnow dispatch for the hashing metric.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastani_tpu.utils import platform as _platform

_platform.setup_cache()

import jax
import jax.numpy as jnp

from fastani_tpu.config import Parameters
from fastani_tpu.index.sketch import ReferenceIndex
from fastani_tpu.models import jitmap, pipeline
from tests import synth


def main():
    import tempfile

    rng = np.random.default_rng(123)
    workdir = tempfile.mkdtemp(prefix="fastani_prof_")
    base = synth.random_genome(rng, 1_000_000)
    paths = []
    for i in range(8):
        g = synth.mutate_genome(rng, base, 0.01 + 0.04 * (i / 7), indel_rate=0.0002)
        p = os.path.join(workdir, f"g{i}.fa")
        synth.write_fasta(p, [(f"g{i}", g)])
        paths.append(p)

    params = Parameters(frag_batch=512).finalize()
    params.ref_sequences = list(paths)
    params.query_sequences = list(paths)

    t0 = time.time()
    index = ReferenceIndex.build_device(params)
    print(f"index: {time.time()-t0:.2f}s, {index.num_entries} entries")

    mapper = jitmap.JitMapper(params, index, unit_factor=10, unit_chunk=128)
    qf = pipeline.load_query_fragments(paths[0], params)
    frags = np.zeros((params.frag_batch, params.frag_len), np.uint8)
    n = min(len(qf.frags), params.frag_batch)
    frags[:n] = qf.frags[:params.frag_batch]

    # warm compile
    t0 = time.time()
    mapper(frags)
    print(f"warm: {time.time()-t0:.2f}s")

    # 1. upload
    for _ in range(3):
        t0 = time.time()
        d = jax.block_until_ready(jnp.asarray(frags))
        t_up = time.time() - t0
    print(f"H2D 512x3000 upload: {t_up*1e3:.1f} ms")

    # 2. device compute only
    packed = (mapper.cfg.wpos_bits is not None)
    args = (d, mapper._occ_hash, mapper._occ_sid, mapper._occ_wpos,
            mapper._mi_hash, mapper._mi_sid, mapper._mi_wpos,
            mapper._seq_start, mapper._min_hits, mapper._gate, mapper._n_occ,
            mapper._occ_packed if packed else None,
            mapper._mi_packed if packed else None)
    for _ in range(3):
        t0 = time.time()
        out = mapper._fn(*args)
        jax.block_until_ready(out["counts"])
        t_dev = time.time() - t0
    print(f"device compute (counts ready): {t_dev*1e3:.1f} ms")

    # 3. fetch packed prefix
    nvalid = int(np.asarray(out["counts"])[0])
    t0 = time.time()
    _ = np.asarray(out["packed"][:, :nvalid])
    t_fetch = time.time() - t0
    print(f"D2H fetch of ({nvalid}) rows: {t_fetch*1e3:.1f} ms")

    # full call
    for _ in range(2):
        t0 = time.time()
        mapper(frags)
        t_full = time.time() - t0
    print(f"full __call__: {t_full*1e3:.1f} ms")

    # per-phase device timings via separate jits: sketch, L1, L2
    from fastani_tpu.models import mapping
    cfg = mapper.cfg

    @jax.jit
    def sketch_only(frags):
        qh, s, over = mapping.sketch_fragments(jnp, frags, cfg.kmer_size,
                                               cfg.window_size, cfg.sketch_cap)
        return qh, s

    qh, s = jax.block_until_ready(sketch_only(d))
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(sketch_only(d))
        t_sk = time.time() - t0
    print(f"sketch_fragments: {t_sk*1e3:.1f} ms")

    @jax.jit
    def l1_only(qh, s):
        r = mapping.l1_candidates(jnp, qh, s, mapper._occ_hash, mapper._occ_sid,
                                  mapper._occ_wpos, mapper._min_hits,
                                  cfg.freq_threshold, cfg.frag_len,
                                  cfg.hits_cap, cfg.cand_cap, n_occ=mapper._n_occ,
                                  wpos_bits=cfg.wpos_bits,
                                  occ_packed=mapper._occ_packed)
        return r.sid, r.valid

    jax.block_until_ready(l1_only(qh, s))
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(l1_only(qh, s))
        t_l1 = time.time() - t0
    print(f"l1_candidates: {t_l1*1e3:.1f} ms")
    print(f"-> L2 +compaction remainder: {(t_dev - t_sk - t_l1)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
