"""Run configuration for the TPU ANI engine.

Mirrors the reference parameter record and its CLI defaults
(reference: src/map/include/map_parameters.hpp:22-41 and
src/map/include/parseCmdArgs.hpp:117-130) so runs are directly comparable,
while adding TPU-specific knobs (device mesh shape, kernel capacity caps).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class Parameters:
    """Sketching and mapping parameters.

    Defaults match the reference CLI (parseCmdArgs.hpp:117-130): k=16,
    fragment length 3000, minFraction 0.2, identity cutoff 80, p-value 1e-3,
    assumed reference size 5e6 (fixed; never updated from the actual input,
    matching the reference).
    """

    kmer_size: int = 16
    # Derived from the p-value model at startup unless given explicitly
    # (parseCmdArgs.hpp:225-228); 24 for the defaults.
    window_size: Optional[int] = None
    frag_len: int = 3000                 # reference: minReadLength
    min_fraction: float = 0.2
    alphabet_size: int = 4
    reference_size: int = 5_000_000
    percentage_identity: float = 80.0
    p_value: float = 1e-3
    ref_sequences: List[str] = dataclasses.field(default_factory=list)
    query_sequences: List[str] = dataclasses.field(default_factory=list)
    out_file_name: str = ""
    report_all: bool = True
    visualize: bool = False
    matrix_output: bool = False
    max_ratio_diff: float = 100.0
    sanity_check: bool = False
    # Number of reference shards. The reference binary uses one OpenMP thread
    # per round-robin shard of the reference list (computeCoreIdentity.hpp:457-474).
    # On TPU this is the data-parallel axis of the device mesh instead; `threads`
    # is retained for CLI compatibility and controls nothing numerically (ANI
    # TSV/matrix output is shard-count invariant by construction).
    threads: int = 1

    # ---- index persistence (no reference equivalent: the reference
    # recomputes the sketch every run; see winSketch.hpp:109-115) ----
    save_index: str = ""                 # write the built index here (.npz)
    load_index: str = ""                 # skip the build, restore from here

    # ---- tracing/profiling (reference: ENABLE_TIME_PROFILE_L1_L2 compile
    # switch + coarse skch::Time phase timers, map_parameters.hpp:12-14,
    # core_genome_identity.cpp:62-105).  When set, a jax.profiler trace of
    # the mapping phase is written here (view with tensorboard/xprof), and
    # per-phase timings are always logged. ----
    profile_dir: str = ""

    # ---- TPU engine capacities (padding caps for ragged data; overflow falls
    # back to the exact host model, never silently truncates).  sketch_cap
    # and l2_entry_cap default to None = auto-sized from (frag_len, window)
    # in finalize(): minimizer density is ~2/(w+1), so data-driven caps cut
    # the L2 rank-table FLOPs ~4x vs the old fixed 512/768. ----
    frag_batch: int = 2048               # fragments mapped per device batch
    sketch_cap: Optional[int] = None     # max unique minimizers per fragment
    hits_cap: int = 4096                 # max L1 seed hits per fragment
    cand_cap: int = 64                   # max L1 candidate regions per fragment
    l2_entry_cap: Optional[int] = None   # max ref index entries per L2 work unit

    def resolved_window_size(self) -> int:
        if self.window_size is not None:
            return self.window_size
        from fastani_tpu.ops import stats

        return stats.recommended_window_size(
            self.p_value,
            self.kmer_size,
            self.alphabet_size,
            self.percentage_identity,
            self.frag_len,
            self.reference_size,
        )

    def finalize(self) -> "Parameters":
        """Fill in derived fields; returns self for chaining."""
        if self.window_size is None:
            self.window_size = self.resolved_window_size()
        w = self.window_size

        def _round128(x: int) -> int:
            return max(128, -(-x // 128) * 128)

        if self.sketch_cap is None:
            # expected unique minimizers per fragment ~ 2L/(w+1); 1.6x margin
            self.sketch_cap = _round128(int(3.2 * self.frag_len / (w + 1)))
        if self.l2_entry_cap is None:
            # ref entries per L2 unit span (a clean mapping spans ~2 fragment
            # lengths => ~480 entries at density 2/(w+1) for the defaults).
            # Overflowing units recompute with the SCALAR host model, which
            # costs ~1000x a device unit — so the cap carries real headroom;
            # 4.3x density (=512) was measured to stall whole runs on
            # overflow stampedes.
            self.l2_entry_cap = _round128(int(6.4 * self.frag_len / (w + 1)))
        return self


def scale_caps(n_genomes: int, params: "Parameters") -> None:
    """Grow the L1 capacity caps with the reference-genome count: in
    many-to-many runs every fragment legitimately hits ~every related
    genome, so hits scale with s_avg * G and candidate regions with G.
    Both caps stay powers of two (the Pallas sort/compaction width
    contract); defaults already cover small G.  Measured basis (bench
    diagnostics, round 4): ~153 L1 hits and ~1.7 candidate groups per
    genome at a 97-99% identity ladder; max unique minimizers/fragment
    276.  An undershoot falls back to the exact host path per fragment —
    correct but minutes-slow at scale, so the caps carry real headroom."""
    if n_genomes > 64:
        params.cand_cap = 256
    elif n_genomes > 24:
        params.cand_cap = 128
    want = max(int(240 * n_genomes), 1024)
    # multiple of 1024, NOT pow2: the hit gather/expand run at this
    # width and only the sort network pads to pow2 internally
    params.hits_cap = min(-(-want // 1024) * 1024, 32768)
    if n_genomes > 24:
        params.l2_entry_cap = 1016
    params.sketch_cap = 320
