"""Pallas butterfly compaction vs the literal numpy compaction."""

import numpy as np
import pytest

from fastani_tpu.ops import pallas_compact as pc

_UMAX = np.uint32(0xFFFFFFFF)
_PINF = np.int32(2**30)


def _ref_compact(flags, arrs, fills):
    R, n = flags.shape
    outs = [np.full((R, n), f, a.dtype) for a, f in zip(arrs, fills)]
    for r in range(R):
        idx = np.nonzero(flags[r])[0]
        for o, a in zip(outs, arrs):
            o[r, : len(idx)] = a[r, idx]
    return outs


@pytest.mark.parametrize("n,R", [(128, 5), (1024, 9), (4096, 3), (32768, 2)])
@pytest.mark.parametrize("density", [0.0, 0.08, 0.5, 1.0])
def test_compact_matches_numpy(n, R, density):
    rng = np.random.default_rng(n + int(density * 100))
    flags = rng.random((R, n)) < density
    h = rng.integers(0, 2**32, (R, n)).astype(np.uint32)
    wp = rng.integers(-5, 2**30, (R, n)).astype(np.int32)
    got = pc.compact_rows(
        np_to_jnp(flags), [(np_to_jnp(h), _UMAX), (np_to_jnp(wp), _PINF)],
        interpret=True)
    want = _ref_compact(flags, [h, wp], [_UMAX, _PINF])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_compact_single_payload_and_edge_rows():
    rng = np.random.default_rng(0)
    n, R = 1024, 4
    flags = np.zeros((R, n), bool)
    flags[0] = True                      # full row
    flags[1] = False                     # empty row
    flags[2, ::7] = True
    flags[3, -1] = True                  # single trailing element
    v = rng.integers(0, 2**31, (R, n)).astype(np.int32)
    (got,) = pc.compact_rows(np_to_jnp(flags), [(np_to_jnp(v), -1)],
                             interpret=True)
    want = _ref_compact(flags, [v], [np.int32(-1)])[0]
    np.testing.assert_array_equal(np.asarray(got), want)


def np_to_jnp(a):
    import jax.numpy as jnp

    return jnp.asarray(a)


def test_lut_searchsorted_matches_numpy():
    import jax.numpy as jnp

    from fastani_tpu.ops import xputils

    rng = np.random.default_rng(3)
    table = np.sort(rng.integers(0, 2**32, 100_000, dtype=np.uint64)
                    .astype(np.uint32))
    q = rng.integers(0, 2**32, (7, 333), dtype=np.uint64).astype(np.uint32)
    q[0, :10] = table[:10]          # exact hits
    q[1, 0] = 0
    q[1, 1] = 0xFFFFFFFF
    lut = xputils.build_prefix_lut(jnp, jnp.asarray(table))
    rounds = xputils.lut_rounds(np.asarray(lut))
    for side in ("left", "right"):
        got = np.asarray(xputils.lut_searchsorted(
            jnp, jnp.asarray(table), lut, jnp.asarray(q), rounds, side))
        want = np.searchsorted(table, q, side=side).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_wide_rows_sort_and_compact():
    """Width ceilings needed by genome-count-scaled caps (hits_cap up to
    32768, candidate grids up to 65536)."""
    import jax.numpy as jnp

    from fastani_tpu.ops import pallas_sort

    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**32, (2, 16384), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(pallas_sort.sort_rows_u32(jnp.asarray(x),
                                               interpret=True))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))

    n = 65536
    flags = rng.random((1, n)) < 0.05
    v = rng.integers(0, 2**31, (1, n)).astype(np.int32)
    (got_v,) = pc.compact_rows(np_to_jnp(flags), [(np_to_jnp(v), -1)],
                               interpret=True)
    want = _ref_compact(flags, [v], [np.int32(-1)])[0]
    np.testing.assert_array_equal(np.asarray(got_v), want)
