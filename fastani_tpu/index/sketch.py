"""Reference minimizer index.

TPU-native replacement for skch::Sketch (reference:
src/map/include/winSketch.hpp:44-341).  The reference keeps an
unordered_map hash -> [(seqId,wpos)...]; pointer-chasing hash tables don't
map to TPUs, so the index is a pair of sorted dense arrays:

* build order   (mi_*):  entries sorted by (seqId, wpos) — the order the
  winnowing emits them; used by the L2 stage's positional windows
  (winSketch.hpp:259-270 searchIndex becomes searchsorted).
* lookup order  (occ_*): the same entries sorted by (hash, seqId, wpos);
  L1 hash probes become two searchsorted calls giving each hash's
  occurrence range (replacing minimizerPosLookupIndex, winSketch.hpp:83-84).

Frequency bookkeeping (histogram, threshold, sanity ratios) follows
winSketch.hpp:199-248 and :298-318.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from fastani_tpu.config import Parameters
from fastani_tpu.io import fasta
from fastani_tpu.ops import minimizer


@dataclasses.dataclass
class ContigInfo:
    name: str
    length: int


@dataclasses.dataclass
class ReferenceIndex:
    params: Parameters
    metadata: List[ContigInfo]
    # file boundaries: sequences_by_file[f] = one-past-last seqId of file f
    # (winSketch.hpp:68-75)
    sequences_by_file: np.ndarray        # (num_files,) int32
    # build-order arrays (sorted by (seqId, wpos))
    mi_hash: np.ndarray                  # (M,) uint32
    mi_seqid: np.ndarray                 # (M,) int32
    mi_wpos: np.ndarray                  # (M,) int32
    # lookup-order arrays (sorted by (hash, seqId, wpos))
    occ_hash: np.ndarray                 # (M,) uint32
    occ_seqid: np.ndarray                # (M,) int32
    occ_wpos: np.ndarray                 # (M,) int32
    # per-seqId entry span in build order: seq_start[s] .. seq_start[s+1]
    seq_start: np.ndarray                # (num_seqs+1,) int64
    freq_threshold: int
    # sanity-check ratios (winSketch.hpp:298-318); None until computed
    hash_ratio: float = 0.0
    uniq_hash_ratio: float = 0.0
    ratio_difference: float = 0.0

    # set by the device build (index arrays live in HBM, padded to pow-2
    # with UMAX/2^30 sentinels; _n_valid is the true entry count).
    # _counts2_dev keeps (entries, uniques) ON DEVICE: the device build
    # performs NO device->host fetch (any fetch permanently degrades the
    # tunneled client's dispatch latency — utils/jitops docstring); host
    # consumers (logging, sanity check, save) pay the fetch lazily.
    _n_valid: Optional[int] = None
    _n_unique_dev: Optional[int] = None
    _host_clone: Optional["ReferenceIndex"] = None
    _counts2_dev: Optional[object] = None     # device (2,) int64
    _seq_parts: Optional[tuple] = None        # (cnt_rows_dev, sid_rows, P)
    _overflow_dev: Optional[object] = None    # device (1, 1) bool (TPU build)

    def check_build_overflow(self) -> bool:
        """Deferred per-row-cap overflow flag of the device build (fetches
        — call only at fetch-safe points, e.g. end of run).  True means
        degenerate repeat input: rebuild exactly on host and re-map."""
        if self._overflow_dev is None:
            return False
        from fastani_tpu.utils import jitops

        flag = bool(jitops.fetch(self._overflow_dev)[0, 0])
        self._overflow_dev = None
        return flag

    def _materialize_counts(self) -> None:
        if self._n_valid is None and self._counts2_dev is not None:
            from fastani_tpu.utils import jitops

            res = jitops.fetch(self._counts2_dev)
            self._n_valid = int(res[0])
            self._n_unique_dev = int(res[1])

    @property
    def num_entries(self) -> int:
        self._materialize_counts()
        if self._n_valid is not None:
            return self._n_valid
        return len(self.mi_hash)

    @property
    def num_unique_hashes(self) -> int:
        self._materialize_counts()
        if self._n_unique_dev is not None:
            return self._n_unique_dev
        if len(self.occ_hash) == 0:
            return 0
        return int((np.diff(self.occ_hash) != 0).sum()) + 1

    def n_occ_cell(self):
        """True entry count as a (1, 1) int32 DEVICE cell, produced
        without any device->host fetch (jit-sliced from the deferred
        counts when device-built)."""
        from fastani_tpu.utils import jitops

        if self._counts2_dev is not None and self._n_valid is None:
            return jitops.cell_from(self._counts2_dev, 0)
        return jitops.cell(self.num_entries)

    def host_seq_start(self) -> np.ndarray:
        """Materialize per-contig entry spans on host (lazy for the
        device build: requires fetching the per-piece row counts)."""
        if self.seq_start is None:
            from fastani_tpu.utils import jitops

            cnt_rows_dev, sid_rows, P = self._seq_parts
            cnt_host = jitops.fetch(cnt_rows_dev)[:P]
            counts = np.zeros(len(self.metadata), np.int64)
            np.add.at(counts, sid_rows[:P], cnt_host.astype(np.int64))
            ss = np.zeros(len(self.metadata) + 1, np.int64)
            ss[1:] = np.cumsum(counts)
            self.seq_start = ss
        return self.seq_start

    def is_device_resident(self) -> bool:
        return not isinstance(self.mi_hash, np.ndarray)

    def host_view(self) -> "ReferenceIndex":
        """Numpy copy of a device-resident index, pads stripped (for the
        exact host fallback path and save()); cached — the transfer is
        expensive on tunneled TPUs."""
        if not self.is_device_resident():
            return self
        if self._host_clone is None:
            from fastani_tpu.utils import jitops

            n = self.num_entries
            # fetch only a pow2-bucketed valid prefix (jitted slice):
            # the padded tails double the transfer on the slow link
            nb = min(len(self.mi_hash), 1 << max(n - 1, 1).bit_length())
            tr = lambda a: jitops.take_rows(a, nb)[:n]
            self._host_clone = dataclasses.replace(
                self,
                seq_start=self.host_seq_start(),
                mi_hash=tr(self.mi_hash),
                mi_seqid=tr(self.mi_seqid),
                mi_wpos=tr(self.mi_wpos),
                occ_hash=tr(self.occ_hash),
                occ_seqid=tr(self.occ_seqid),
                occ_wpos=tr(self.occ_wpos),
                _n_valid=None, _n_unique_dev=self._n_unique_dev)
        return self._host_clone

    # -- construction -------------------------------------------------------

    @classmethod
    def build(cls, params: Parameters, ref_files: Optional[Sequence[str]] = None) -> "ReferenceIndex":
        files = list(ref_files if ref_files is not None else params.ref_sequences)
        k = params.kmer_size
        w = params.window_size
        metadata: List[ContigInfo] = []
        seq_by_file: List[int] = []
        hashes: List[np.ndarray] = []
        seqids: List[np.ndarray] = []
        wposs: List[np.ndarray] = []
        seq_counter = 0
        for path in files:
            for name, seq in fasta.read_sequences(path):
                metadata.append(ContigInfo(name, len(seq)))
                if not (len(seq) < w or len(seq) < k):
                    h, wp = minimizer.winnow_sequence_np(seq, k, w)
                    if len(h):
                        hashes.append(h)
                        seqids.append(np.full(len(h), seq_counter, np.int32))
                        wposs.append(wp)
                seq_counter += 1
            seq_by_file.append(seq_counter)
        if hashes:
            mi_hash = np.concatenate(hashes)
            mi_seqid = np.concatenate(seqids)
            mi_wpos = np.concatenate(wposs)
        else:
            mi_hash = np.zeros(0, np.uint32)
            mi_seqid = np.zeros(0, np.int32)
            mi_wpos = np.zeros(0, np.int32)
        return cls._finish(params, metadata, np.asarray(seq_by_file, np.int32),
                           mi_hash, mi_seqid, mi_wpos)

    @classmethod
    def build_device(cls, params: Parameters,
                     ref_files: Optional[Sequence[str]] = None) -> "ReferenceIndex":
        """Device-resident build: winnow + compact + sort on the accelerator,
        arrays stay in HBM (see index/device_build.py)."""
        from fastani_tpu.index import device_build

        return device_build.build_device(cls, params, ref_files)

    @classmethod
    def _finish(cls, params, metadata, seq_by_file, mi_hash, mi_seqid, mi_wpos):
        # lookup order: stable sort by hash keeps (seqId,wpos) order within
        # each hash — exactly the per-hash vector order of the reference's
        # index() (winSketch.hpp:181-193).
        order = np.argsort(mi_hash, kind="stable")
        occ_hash = mi_hash[order]
        occ_seqid = mi_seqid[order]
        occ_wpos = mi_wpos[order]

        num_seqs = len(metadata)
        seq_start = np.searchsorted(mi_seqid, np.arange(num_seqs + 1)).astype(np.int64)

        freq_threshold = cls._compute_freq_threshold(occ_hash)

        return cls(params=params, metadata=metadata, sequences_by_file=seq_by_file,
                   mi_hash=mi_hash, mi_seqid=mi_seqid, mi_wpos=mi_wpos,
                   occ_hash=occ_hash, occ_seqid=occ_seqid, occ_wpos=occ_wpos,
                   seq_start=seq_start, freq_threshold=freq_threshold)

    @staticmethod
    def _compute_freq_threshold(occ_hash: np.ndarray) -> int:
        """Frequency threshold from the histogram (winSketch.hpp:199-248).

        percentageThreshold is fixed at 0 in the reference (winSketch.hpp:52),
        which makes minimizerToIgnore 0 and leaves the threshold at INT_MAX
        (i.e. no hash is ignored); the computation is kept for parity and for
        future tuning.
        """
        int_max = np.iinfo(np.int32).max
        if len(occ_hash) == 0:
            return int_max
        percentage_threshold = 0.0
        _, counts = np.unique(occ_hash, return_counts=True)
        freqs, freq_of_freq = np.unique(counts, return_counts=True)
        total_unique = len(counts)
        to_ignore = int(total_unique * percentage_threshold / 100)
        threshold = int_max
        s = 0
        for f, ff in zip(freqs[::-1], freq_of_freq[::-1]):
            s += int(ff)
            if s < to_ignore:
                threshold = int(f)
            elif s == to_ignore:
                threshold = int(f)
                break
            else:
                break
        return threshold

    # -- persistence ---------------------------------------------------------
    #
    # The reference recomputes the sketch every run (no checkpointing
    # anywhere in winSketch.hpp); for 90K-genome databases that dominates
    # wall-clock.  We persist the finished index as a single .npz so
    # sketch-once / map-many workflows skip the build entirely.

    _SAVE_VERSION = 1

    def save(self, path: str) -> None:
        """Persist the index (arrays + metadata) to ``path`` (.npz)."""
        if self.is_device_resident():
            return self.host_view().save(path)
        names = np.array([c.name for c in self.metadata])
        lengths = np.array([c.length for c in self.metadata], np.int64)
        np.savez_compressed(
            path,
            version=np.int64(self._SAVE_VERSION),
            kmer_size=np.int64(self.params.kmer_size),
            window_size=np.int64(self.params.window_size),
            frag_len=np.int64(self.params.frag_len),
            contig_names=names, contig_lengths=lengths,
            sequences_by_file=self.sequences_by_file,
            ref_files=np.array(list(self.params.ref_sequences)),
            mi_hash=self.mi_hash, mi_seqid=self.mi_seqid, mi_wpos=self.mi_wpos,
            seq_start=self.host_seq_start(),
            freq_threshold=np.int64(self.freq_threshold),
        )

    @classmethod
    def load(cls, path: str, params: Parameters) -> "ReferenceIndex":
        """Restore a persisted index; validates sketch-defining parameters."""
        with np.load(path, allow_pickle=False) as z:
            if int(z["version"]) != cls._SAVE_VERSION:
                raise ValueError(f"unsupported index version {int(z['version'])}")
            for field, key in (("kmer_size", "kmer_size"),
                               ("window_size", "window_size"),
                               ("frag_len", "frag_len")):
                have, want = int(z[key]), int(getattr(params, field))
                if have != want:
                    raise ValueError(
                        f"index was built with {field}={have}, run requests {want}")
            metadata = [ContigInfo(str(n), int(l))
                        for n, l in zip(z["contig_names"], z["contig_lengths"])]
            params.ref_sequences = [str(p) for p in z["ref_files"]]
            mi_hash = z["mi_hash"]
            order = np.argsort(mi_hash, kind="stable")
            return cls(params=params, metadata=metadata,
                       sequences_by_file=z["sequences_by_file"],
                       mi_hash=mi_hash, mi_seqid=z["mi_seqid"], mi_wpos=z["mi_wpos"],
                       occ_hash=mi_hash[order], occ_seqid=z["mi_seqid"][order],
                       occ_wpos=z["mi_wpos"][order],
                       seq_start=z["seq_start"],
                       freq_threshold=int(z["freq_threshold"]))

    # -- queries ------------------------------------------------------------

    def genome_of_seq(self) -> np.ndarray:
        """seqId -> genome (file) id via upper_bound on file boundaries
        (computeCoreIdentity.hpp:31-42)."""
        num_seqs = len(self.metadata)
        return np.searchsorted(self.sequences_by_file, np.arange(num_seqs), side="right").astype(np.int32)

    def sanity_check(self, max_ratio_diff: float) -> bool:
        """Repeat sanity check (winSketch.hpp:298-318).

        hashRatio = totalLength / total occurrence count;
        uniqHashRatio = totalLength / unique hash count.  Flags a shard when
        |hashRatio - uniqHashRatio| > maxRatioDiff.  Always true when the
        check is disabled (handled by the caller, matching param.sanityCheck).
        """
        total_size = float(self.num_entries)
        total_length = float(sum(c.length for c in self.metadata))
        uniq = float(self.num_unique_hashes)
        if total_size == 0 or uniq == 0:
            # degenerate empty index: reference would divide by zero (inf);
            # treat as failing the check
            self.hash_ratio = float("inf")
            self.uniq_hash_ratio = float("inf")
            self.ratio_difference = float("nan")
            return False
        self.hash_ratio = np.float32(total_length) / np.float32(total_size)
        self.uniq_hash_ratio = np.float32(total_length) / np.float32(uniq)
        self.ratio_difference = abs(np.float32(self.hash_ratio) - np.float32(self.uniq_hash_ratio))
        return not (self.ratio_difference > max_ratio_diff)
