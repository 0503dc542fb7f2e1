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
  guarded at the source (ops/pallas_winnow.winnow_rows).

Production paths therefore never run bare jnp ops on device arrays:
every manipulation goes through one of the jit-compiled callables below
(jit outputs fetch reliably and keep the dispatch queue async).  The
helpers are trace-cached by shape/dtype through jax.jit's own cache, so
steady-state cost is one cache lookup per call.
"""

from __future__ import annotations

import functools

import numpy as np


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

    return jax.jit(lambda xs: jnp.stack([x.any() for x in xs]).any())


def any_of(scalars) -> bool:
    """bool(any of device bool scalars/arrays) without eager ops."""
    if not scalars:
        return False
    return bool(fetch(_any_of()(tuple(scalars))))


@functools.lru_cache(maxsize=None)
def _slice_cols(n: int):
    import jax

    return jax.jit(lambda a: a[..., :n])


def take_cols(a, n: int) -> np.ndarray:
    """Fetch a[..., :n] via a jitted static slice (n is bucketed by the
    caller to bound program count)."""
    return np.asarray(_slice_cols(int(n))(a))
