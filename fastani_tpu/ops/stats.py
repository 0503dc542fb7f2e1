"""Mash statistics: Jaccard <-> mash distance, binomial confidence bounds.

Host-side (NumPy/SciPy) replication of the reference's statistical layer
(reference: src/map/include/map_stats.hpp:36-257).  The reference computes
these in C++ with `float` variables and `double` literals/libm calls and uses
GSL's binomial survival function; we mirror the exact float32/float64
promotion points so that identity values match bit-for-bit, and use
scipy.stats.binom.sf (regularized incomplete beta, the same quantity GSL's
gsl_cdf_binomial_Q computes) for the CI search loop.

Everything here depends only on small integers (sharedSketches c, sketchSize
s, kmer size k), so the device-side pipeline consumes precomputed lookup
tables keyed on (s, c) and no floating-point parity risk exists on-device.
"""

from __future__ import annotations

import functools
import math

import numpy as np
from scipy.stats import binom

_f32 = np.float32


def j2md(j: float, k: int) -> np.float32:
    """Jaccard estimate (float) -> mash distance (float).

    Mirrors map_stats.hpp:44-54: the log argument is computed in double,
    the result is truncated to float.
    """
    j = _f32(j)
    if j == 0:
        return _f32(1.0)
    if j == 1:
        return _f32(0.0)
    # `1+j` is an int+float expression in C++ — a float32 addition; the
    # division and log then run in double on the f32-rounded denominator.
    denom = _f32(_f32(1) + j)
    return _f32((-1.0 / k) * math.log(2.0 * float(j) / float(denom)))


def md2j(d: float, k: int) -> np.float32:
    """Mash distance (float) -> jaccard estimate (float).

    Mirrors map_stats.hpp:62-66.  Note `k*d` is an int*float multiply that
    rounds to float32 BEFORE the double-precision exp().
    """
    d = _f32(d)
    kd = _f32(np.int32(k) * d)
    return _f32(1.0 / (2.0 * math.exp(float(kd)) - 1.0))


def _binom_sf(x_minus_1: int, p: float, n: int) -> float:
    """P(X >= x) for X ~ Binom(n, p) — gsl_cdf_binomial_Q(x-1, p, n)."""
    return float(binom.sf(x_minus_1, n, p))


def md_lower_bound(d: float, s: int, k: int, ci: float) -> np.float32:
    """Lower bound on mash distance d within confidence interval `ci`.

    Mirrors the GSL search loop of map_stats.hpp:79-111 including the
    post-loop `x--` walk and the x=s+1 fall-through when the loop never
    breaks (which can yield jaccard > 1 and hence a negative distance /
    identity upper bound above 100 — reference behavior, reproduced).
    """
    q2 = (1.0 - ci) / 2.0
    j = md2j(d, k)
    x = max(int(math.ceil(s * float(j))), 1)
    while x <= s:
        if _binom_sf(x - 1, float(j), s) < q2:
            x -= 1
            break
        x += 1
    jaccard = _f32(_f32(x) / s)
    return j2md(jaccard, k)


def estimate_minimum_hits(s: int, k: int, perc_identity: float) -> int:
    """Minimum shared sketches for the target identity (map_stats.hpp:120-131)."""
    mash_dist = _f32(1.0 - perc_identity / 100.0)
    jaccard = md2j(mash_dist, k)
    return int(math.ceil(1.0 * s * float(jaccard)))


def estimate_minimum_hits_relaxed(s: int, k: int, perc_identity: float) -> int:
    """Relaxed minimum using the 90% CI upper bound (map_stats.hpp:142-167)."""
    first = estimate_minimum_hits(s, k, perc_identity)
    result = first
    for i in range(first, -1, -1):
        jaccard = _f32(1.0 * i / s)
        d = j2md(jaccard, k)
        d_lower = md_lower_bound(d, s, k, 0.9)
        id_upper = _f32(100.0 * (1.0 - float(d_lower)))
        if id_upper >= perc_identity:
            result = i
        else:
            break
    return result


def estimate_pvalue(
    s: int,
    k: int,
    alphabet_size: int,
    identity: float,
    length_query: int,
    length_reference: int,
) -> float:
    """Random-match p-value model (map_stats.hpp:179-213)."""
    kmer_space = float(alphabet_size) ** k
    px = py = 1.0 / (1.0 + kmer_space / length_query)
    r = px * py / (px + py - px * py)
    x = estimate_minimum_hits_relaxed(s, k, identity)
    cdf_complement = 1.0 if x == 0 else _binom_sf(x - 1, r, s)
    return length_reference * cdf_complement


def recommended_window_size(
    p_value_cutoff: float,
    k: int,
    alphabet_size: int,
    identity: float,
    length_query: int,
    length_reference: int,
) -> int:
    """Smallest sketch rate meeting the p-value cutoff (map_stats.hpp:226-256).

    Returns 24 for the reference defaults (k=16, fragLen=3000, id=80,
    p=1e-3, refSize=5e6).
    """
    potential = [1, 2, 5] + list(range(10, length_query, 10))
    optimal = None
    for e in potential:
        if estimate_pvalue(e, k, alphabet_size, identity, length_query, length_reference) <= p_value_cutoff:
            optimal = e
            break
    if optimal is None:  # reference reads uninitialized memory here; we fail loudly
        raise ValueError("no sketch size satisfies the p-value cutoff")
    w = int(2.0 * length_query / optimal)
    return min(max(w, 1), length_query)


# ---------------------------------------------------------------------------
# Lookup tables for the device pipeline
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def min_hits_lut(k: int, perc_identity: float, s_max: int) -> np.ndarray:
    """minimumHits for every sketch size s in [0, s_max].

    Entry s = max(1, estimateMinimumHitsRelaxed(s, k, id)) exactly as consumed
    at computeMap.hpp:301 + computeMap.hpp:316-317.  s=0 fragments are skipped
    upstream; entry 0 is a placeholder 1.
    """
    from fastani_tpu.utils import platform

    def compute():
        out = np.ones(s_max + 1, dtype=np.int32)
        for s in range(1, s_max + 1):
            out[s] = max(1, estimate_minimum_hits_relaxed(s, k, perc_identity))
        return out

    return platform.lut_cache("minhits", compute, k, perc_identity, s_max)


@functools.lru_cache(maxsize=None)
def identity_lut(s: int, k: int) -> tuple:
    """(nucIdentity[c], nucIdentityUpperBound[c]) float32 arrays for c=0..s.

    Replicates computeMap.hpp:375-381: mash = j2md(c/s, k);
    lower = md_lower_bound(mash, s, k, 0.9); identity = 100*(1-mash);
    upper = 100*(1-lower) — all with the C++ float rounding points.
    """
    ident = np.zeros(s + 1, dtype=np.float32)
    upper = np.zeros(s + 1, dtype=np.float32)
    for c in range(s + 1):
        mash = j2md(_f32(1.0 * c / s), k)
        lower = md_lower_bound(mash, s, k, 0.9)
        # `100 * (1 - mash_dist)` is all-float in C++ (int operands promote
        # to float): two float32 operations, not one double rounding.
        ident[c] = _f32(_f32(100) * _f32(_f32(1) - mash))
        upper[c] = _f32(_f32(100) * _f32(_f32(1) - lower))
    return ident, upper


def identities_for(shared: np.ndarray, sketch_sizes: np.ndarray, k: int):
    """Vector map (c, s) -> (identity, upper) using cached per-s LUTs."""
    shared = np.asarray(shared)
    sketch_sizes = np.asarray(sketch_sizes)
    ident = np.zeros(shared.shape, dtype=np.float32)
    upper = np.zeros(shared.shape, dtype=np.float32)
    for s in np.unique(sketch_sizes):
        if s <= 0:
            continue
        lut_i, lut_u = identity_lut(int(s), k)
        sel = sketch_sizes == s
        c = np.clip(shared[sel], 0, int(s))
        ident[sel] = lut_i[c]
        upper[sel] = lut_u[c]
    return ident, upper
