"""Multi-host orchestration over jax.distributed.

The reference scales past one node by hand: a shell script shuffles and
splits the reference list into N partition files and the user launches N
independent fastANI processes and concatenates their outputs
(reference: scripts/splitDatabase.sh:14-39, README.md:104-106).

This module is the TPU-native replacement: one SPMD program over a global
(r, q) device mesh spanning every host in the slice.

  * every process calls :func:`initialize` (a thin jax.distributed wrapper),
    then :func:`multihost_mesh` to build ONE global mesh over
    ``jax.devices()`` (all hosts);
  * the reference list is round-robin sharded over the global "r" axis
    (splitReferenceGenomes law — j % n_r == r), so each host only SKETCHES
    the shards its addressable devices own (index build is fully
    distributed, not replicated);
  * query fragment batches are replicated to every process (queries are the
    small side; the reference replicates them too) and mapped data-parallel
    along "q";
  * the per-pair (sum identity, count) tallies merge with psum/all_gather
    INSIDE the jitted step (parallel/mesh.py) — collectives ride ICI/DCN,
    replacing the reference's `omp critical` + shell-level `cat`;
  * process 0 fetches the replicated tallies and writes the single output
    file; there is nothing to concatenate.

Determinism: the round-robin shard law and the tie-breaking sort keys are
identical to the single-host mesh path, so output is invariant to the
number of hosts (the mt/st invariance property of the reference test
suite, fastani_tests.cpp:199-255).

Single-process use (tests, dry runs) works without a coordinator:
``initialize()`` is a no-op when jax.distributed is already initialized or
when num_processes == 1.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "initialize",
    "multihost_mesh",
    "local_ref_shards",
    "gather_tallies",
    "MultiHostPlan",
    "plan",
]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> int:
    """Bring up jax.distributed; returns this process's id.

    No-op (returns 0) for single-process runs: pass nothing, or
    num_processes in (None, 0, 1).  On TPU pods the three arguments are
    auto-detected from the environment, so bare ``initialize()`` also works
    under a multi-host launcher.
    """
    import jax

    if num_processes in (None, 0, 1) and coordinator_address is None:
        return getattr(jax, "process_index", lambda: 0)()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def multihost_mesh(n_r: Optional[int] = None, n_q: Optional[int] = None):
    """Global (r, q) mesh over ALL devices in the slice (every host).

    Defaults: n_r = number of processes (one reference shard group per
    host — index build locality), n_q = devices per process.  Any factoring
    with n_r * n_q == total device count is valid.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n = devs.size
    if n_r is None:
        n_r = max(jax.process_count(), 1)
    if n_q is None:
        n_q = n // n_r
    assert 0 < n_r * n_q <= n, f"mesh {n_r}x{n_q} needs > {n} devices"
    # order devices so the r axis groups each process's devices together:
    # index sharding stays host-local, q collectives ride intra-host ICI;
    # a sub-mesh (n_r * n_q < n) uses the first devices in that order
    order = np.argsort([(d.process_index, d.id) for d in devs.tolist()],
                       axis=0)[:, 0] if n > 1 else np.arange(n)
    return Mesh(devs[order][: n_r * n_q].reshape(n_r, n_q), ("r", "q"))


def local_ref_shards(ref_files: Sequence[str], n_r: int,
                     my_rows: Sequence[int]) -> List[List[str]]:
    """Reference files for the r-rows this process owns.

    Row r's shard is files[j] with j % n_r == r — the exact
    splitReferenceGenomes law (computeCoreIdentity.hpp:457-474), applied to
    the GLOBAL list so results are host-count invariant.
    """
    return [[f for j, f in enumerate(ref_files) if j % n_r == r]
            for r in my_rows]


@dataclasses.dataclass
class MultiHostPlan:
    """Everything a process needs to run its part of a multi-host job."""
    mesh: object                  # global Mesh
    n_r: int
    n_q: int
    my_r_rows: List[int]          # r-axis rows with >=1 addressable device
    ref_shards: List[List[str]]   # files per owned row


def plan(ref_files: Sequence[str], n_r: Optional[int] = None,
         n_q: Optional[int] = None) -> MultiHostPlan:
    """Build the global mesh and this process's reference-shard plan."""
    import jax

    mesh = multihost_mesh(n_r, n_q)
    n_r, n_q = mesh.devices.shape
    local = {d.id for d in jax.local_devices()}
    my_rows = [r for r in range(n_r)
               if any(d.id in local for d in mesh.devices[r].flat)]
    return MultiHostPlan(
        mesh=mesh, n_r=n_r, n_q=n_q, my_r_rows=my_rows,
        ref_shards=local_ref_shards(ref_files, n_r, my_rows))


def allgather_shard_dims(local_dims: dict) -> dict:
    """Merge per-process shard padding dims (parallel.mesh.local_shard_dims)
    into the global maxima every process must pad to.  Single-process:
    identity."""
    import jax

    if jax.process_count() <= 1:
        return local_dims
    import numpy as np
    from jax.experimental import multihost_utils

    keys = ("M", "S", "G", "max_contig_len", "n_seqs_total", "B")
    vec = np.asarray([int(local_dims[k]) for k in keys], np.int64)
    allv = multihost_utils.process_allgather(vec)       # (n_proc, k)
    out = {k: int(allv[:, i].max()) for i, k in enumerate(keys)}
    # n_seqs_total is a SUM across processes (disjoint shard ownership)
    out["n_seqs_total"] = int(allv[:, keys.index("n_seqs_total")].sum())
    cpf = np.asarray(local_dims["contigs_per_file"], np.int64)
    out["contigs_per_file"] = np.asarray(
        multihost_utils.process_allgather(cpf)).max(axis=0)
    return out


def _place(plan: MultiHostPlan, arr, spec) -> "jax.Array":
    """Place a host (n_r, ...) array onto the mesh with `spec`; in
    multi-process runs only the rows owned by this process's devices are
    read (unowned rows hold fill values)."""
    import jax
    from jax.sharding import NamedSharding

    sh = NamedSharding(plan.mesh, spec)
    if jax.process_count() <= 1:
        return jax.device_put(arr, sh)
    idx_map = sh.addressable_devices_indices_map(arr.shape)
    bufs = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(arr.shape, sh, bufs)


def shard_index_arrays(plan: MultiHostPlan, sharded_index) -> dict:
    """Place a ShardedIndex's stacked arrays onto the mesh as global arrays.

    Each (n_r, M) array becomes a jax.Array sharded P("r", None): device
    row r holds shard r only.  Multi-process: each process materializes
    only the rows it owns (mesh.build_sharded_index over plan.my_r_rows,
    padded to the allgathered global dims); global arrays assemble from
    single-device buffers without replicating the build.
    """
    from jax.sharding import PartitionSpec as P

    out = {}
    row2 = P("r", None)
    row1 = P("r")
    for name in ("occ_hash", "occ_sid", "occ_wpos", "mi_hash", "mi_sid",
                 "mi_wpos", "seq_start", "genome_of_seq", "occ_packed",
                 "mi_packed", "occ_lut", "mi_lut", "mi_prev", "mi_nxt",
                 "bin_start", "sid_of_bin", "gid_of_bin"):
        a = getattr(sharded_index, name)
        if a is not None:
            out[name] = _place(plan, a, row2)
    for name in ("n_occ", "n_genomes"):
        out[name] = _place(plan, getattr(sharded_index, name), row1)
    ft = sharded_index.freq_thresholds
    if ft is None:
        import numpy as np

        ft = np.full(sharded_index.n_r, sharded_index.freq_threshold,
                     np.int32)
    out["freq_threshold"] = _place(plan, ft, row1)
    return out


def gather_rows(*arrays) -> tuple:
    """Fetch the (n_r, ...) survivor-row arrays + (n_r,) counts to every
    host (the rows step's exact-fold inputs)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled=True: the inputs are GLOBAL arrays sharded over the mesh's
        # r axis; tiled gathering reassembles the full (n_r, ...) array
        return tuple(multihost_utils.process_allgather(a, tiled=True)
                     for a in arrays)
    return tuple(np.asarray(a) for a in arrays)


def gather_tallies(sum_ident, count) -> tuple:
    """Fetch (n_r, G) tally arrays to every host (process_allgather when
    multi-process; plain device_get single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return (multihost_utils.process_allgather(sum_ident, tiled=True),
                multihost_utils.process_allgather(count, tiled=True))
    return np.asarray(sum_ident), np.asarray(count)
