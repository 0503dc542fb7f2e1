"""Pallas bitonic row-sort vs np.sort, plus the stable key-packing idiom."""

import numpy as np
import pytest

from fastani_tpu.ops import pallas_sort as ps


@pytest.mark.parametrize("R,n", [(4, 1024), (5, 2048), (3, 4096), (2, 8192)])
def test_sort_rows_matches_numpy(R, n):
    rng = np.random.default_rng(R * n)
    x = rng.integers(0, 2**32, (R, n), dtype=np.uint32)
    x[0, :7] = [0xFFFFFFFF, 0, 5, 5, 5, 1, 0xFFFFFFFF]   # dupes + extremes
    import jax.numpy as jnp

    got = np.asarray(ps.sort_rows_u32(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))


def test_stable_flag_partition_idiom():
    """(flag << B) | index keys reproduce a stable argsort partition."""
    rng = np.random.default_rng(3)
    n = 1024
    flag = rng.uniform(size=(2, n)) < 0.2
    import jax.numpy as jnp

    key = (np.where(flag, 0, 1).astype(np.uint32) << 16) | np.arange(
        n, dtype=np.uint32)
    got = np.asarray(ps.sort_rows_u32(jnp.asarray(key), interpret=True))
    lorder = (got & 0xFFFF).astype(np.int64)
    want = np.argsort(np.where(flag, 0, 1), axis=1, kind="stable")
    np.testing.assert_array_equal(lorder, want)


def test_sort_rows_u32_kv_interpret():
    """Key-value bitonic: payload permutes with its key (unique keys)."""
    import jax.numpy as jnp

    from fastani_tpu.ops import pallas_sort

    rng = np.random.default_rng(11)
    R, n = 5, 1024
    # unique keys per row (permutation of arange with random offsets)
    keys = np.stack([rng.permutation(n).astype(np.uint32) + 7 * r
                     for r in range(R)])
    payload = rng.integers(0, 2**32, (R, n), dtype=np.uint32)
    ks, ps = pallas_sort.sort_rows_u32_kv(jnp.asarray(keys),
                                          jnp.asarray(payload),
                                          interpret=True)
    ks, ps = np.asarray(ks), np.asarray(ps)
    for r in range(R):
        order = np.argsort(keys[r], kind="stable")
        np.testing.assert_array_equal(ks[r], keys[r][order])
        np.testing.assert_array_equal(ps[r], payload[r][order])
