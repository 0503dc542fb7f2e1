"""Jitted wrappers for small device-array manipulations on hot paths.

Under the tunneled TPU plugin this session runs on, op-by-op (eager)
dispatches are hazardous in two distinct ways, both measured in round 3:

* fetching a buffer produced by an EAGER op (``bool(x.any())``,
  ``np.asarray(arr[:, :n])`` of an eager slice, ...) can block
  indefinitely and wedge the device->host path machine-wide — the
  "wedged link" episodes of PERF.md;
* a Mosaic (Pallas) kernel whose SMEM operands were constant-folded by
  XLA knocks the PJRT client out of async dispatch PERMANENTLY: every
  subsequent dispatch of ANY program pays the ~25 ms tunnel round trip
  (0.1 ms -> 25 ms measured on an unrelated matmul).  That one is
  guarded at the source (ops/pallas_winnow.winnow_rows);
* (round 4, bisected with a dispatch-latency canary + known-cost
  probes) the client has TWO modes.  ASYNC mode (process start):
  dispatch returns in ~0.1 ms but queued EXECUTION is pathological
  (~200x slower than sync for identical work; H2D ~0.7 MB/s) and
  block_until_ready is a NO-OP, so async-mode timings lie.  The FIRST
  device->host transfer of ANY buffer — np.asarray, copy_to_host_async,
  is_ready, even the hidden host read when a jit traces over a
  closed-over device array — switches the process to SYNC mode
  permanently: ~26 ms per dispatch and per transfer, but execution at
  full device speed and H2D at ~39 MB/s.  SYNC MODE IS THE FAST MODE:
  ``engage_sync()`` enters it deliberately at startup, and the engine
  amortizes the per-call cost with FEW, LARGE programs (fused K-batch
  scan steps, 35 Mbp index flushes) and with deferred/lazy host values
  so small fetches happen once per run, not per batch.  Scalars still
  travel as (1, 1) "cells" (``cell()``/``uncell()``) and nothing closes
  over device arrays (remote_compile rejects the embedded literals —
  HTTP 413 — and tracing them forces a fetch).

Production paths therefore never run bare jnp ops on device arrays:
every manipulation goes through one of the jit-compiled callables below
(jit outputs fetch reliably and keep the dispatch queue async).  The
helpers are trace-cached by shape/dtype through jax.jit's own cache, so
steady-state cost is one cache lookup per call.
"""

from __future__ import annotations

import functools

import numpy as np


def cell(v, dtype=np.int32):
    """Host value -> (1, 1) device array: the safe way to pass a scalar
    into a jitted program on this platform (rank-0 inputs de-async the
    client — module docstring).  Unpack inside the jit with x[0, 0]."""
    import jax.numpy as jnp

    return jnp.asarray(np.full((1, 1), v, dtype))


@functools.lru_cache(maxsize=None)
def _cell_from(i: int):
    import jax

    return jax.jit(lambda a: a[i].astype("int32").reshape(1, 1))


def cell_from(arr, i: int):
    """Device (1, 1) int32 cell holding arr[i], produced jitted (no
    device->host fetch, no eager slice)."""
    return _cell_from(int(i))(arr)


def uncell(x):
    """Inside-jit inverse of cell(): accepts a python int, a rank-0
    tracer, or a (1, 1) cell and yields a scalar usable in arithmetic."""
    if isinstance(x, int) or getattr(x, "ndim", 0) == 0:
        return x
    return x.reshape(-1)[0]


_SYNC_ENGAGED = [False]


def engage_sync() -> None:
    """Deliberately switch the tunneled client into its synchronous
    dispatch mode with one tiny fetch.

    Counter-intuitive but measured (round 4): the axon client's ASYNC
    mode is globally pathological — queued program execution runs ~200x
    slower than sync execution (306 s vs 1.7 s for an identical fused
    map pass) and host->device transfers crawl at ~0.7 MB/s vs ~39 MB/s
    in sync mode.  Sync mode costs ~26 ms per dispatch and per transfer,
    which the engine amortizes with FEW, LARGE programs (fused K-batch
    scan steps, 35 Mbp index flushes) and mega-batch uploads.  Call this
    once at process start before any real device work."""
    if _SYNC_ENGAGED[0]:
        return
    _SYNC_ENGAGED[0] = True
    try:
        fetch(_identity()(cell(0)))
    except Exception:
        pass


@functools.cache
def _identity():
    import jax

    return jax.jit(lambda x: x)


def fetch(x) -> np.ndarray:
    """Device -> host through a jitted identity: safe for any buffer,
    including results of eager ops or non-contiguous views."""
    return np.asarray(_identity()(x))


@functools.cache
def _concat():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda xs: jnp.concatenate(xs))


def concat(arrays):
    """Jitted concatenate along axis 0 (tuple pytree arg: one compiled
    program per distinct shape combination)."""
    return _concat()(tuple(arrays))


@functools.cache
def _concat2():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda a, b: jnp.concatenate([a, b]))


def concat_binomial(arrays):
    """Order-preserving concatenate with a BOUNDED set of compiled
    programs: adjacent equal-length pieces merge pairwise (binomial-heap
    style), so the hot merges compile one (n, n) program per size class
    instead of one program per distinct piece-list shape tuple (which
    grew the jit cache per workload — advisor round 3).  Piece producers
    emit pow-2-bucketed row counts, so the stack stays ~log-deep."""
    stack = []
    for a in arrays:
        stack.append(a)
        while len(stack) >= 2 and stack[-2].shape[0] == stack[-1].shape[0]:
            b = stack.pop()
            stack.append(_concat2()(stack.pop(), b))
    if not stack:
        raise ValueError("concat_binomial of empty list")
    if len(stack) == 1:
        return stack[0]
    return _concat()(tuple(stack))


@functools.lru_cache(maxsize=None)
def _pad_tail(n: int, fill: int, dtype: str):
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)

    def f(a):
        m = a.shape[0]
        if n <= m:
            return a
        return jnp.concatenate(
            [a, jnp.full((n - m,) + a.shape[1:], dt.type(fill), dt)])

    return jax.jit(f)


def pad_tail(a, n: int, fill):
    """Pad axis 0 of `a` up to length n with `fill` (no-op if already
    long enough), as ONE jitted program."""
    return _pad_tail(int(n), int(fill), str(a.dtype))(a)


@functools.cache
def _any_of():
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda xs: jnp.stack([x.any() for x in xs]).any().reshape(1, 1))


def any_of(flags) -> bool:
    """bool(any of device bool arrays) without eager ops.

    Inputs MUST be rank >= 1 (producers return (1, 1) cells, not bare
    scalars): a rank-0 device buffer crossing the jit boundary de-asyncs
    the client permanently (module docstring)."""
    if not flags:
        return False
    for x in flags:
        assert getattr(x, "ndim", 1) >= 1, \
            "rank-0 device buffer passed to any_of (de-async hazard)"
    return bool(fetch(_any_of()(tuple(flags))))


@functools.lru_cache(maxsize=None)
def _slice_rows(n: int):
    import jax

    return jax.jit(lambda a: a[:n])


def take_rows(a, n: int) -> np.ndarray:
    """Fetch a[:n] via a jitted static slice (bucket n to bound program
    count)."""
    return np.asarray(_slice_rows(int(n))(a))


@functools.lru_cache(maxsize=None)
def _slice_cols(n: int):
    import jax

    return jax.jit(lambda a: a[..., :n])


def take_cols(a, n: int) -> np.ndarray:
    """Fetch a[..., :n] via a jitted static slice (n is bucketed by the
    caller to bound program count)."""
    return np.asarray(_slice_cols(int(n))(a))
