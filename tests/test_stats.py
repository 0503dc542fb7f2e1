import numpy as np

from fastani_tpu.ops import stats


def test_recommended_window_size_defaults():
    # Reference defaults (parseCmdArgs.hpp:117-130 + :225-228) give w=24.
    w = stats.recommended_window_size(1e-3, 16, 4, 80.0, 3000, 5_000_000)
    assert w == 24


def test_j2md_md2j_roundtrip_edges():
    assert stats.j2md(0.0, 16) == np.float32(1.0)
    assert stats.j2md(1.0, 16) == np.float32(0.0)
    j = np.float32(0.8)
    d = stats.j2md(j, 16)
    j2 = stats.md2j(d, 16)
    assert abs(float(j2) - 0.8) < 1e-5


def test_identity_monotone_in_shared():
    ident, upper = stats.identity_lut(250, 16)
    assert ident.shape == (251,)
    assert np.all(np.diff(ident[1:]) >= 0)
    # upper bound dominates the point estimate (until the j>1 overflow regime)
    assert np.all(upper[1:250] >= ident[1:250])
    # full sharing -> identity 100
    assert ident[250] == np.float32(100.0)


def test_min_hits_lut():
    lut = stats.min_hits_lut(16, 80.0, 300)
    assert lut[0] == 1
    assert np.all(lut >= 1)
    assert lut[250] == max(1, stats.estimate_minimum_hits_relaxed(250, 16, 80.0))


def test_identities_for_vector():
    shared = np.array([240, 200, 0])
    s = np.array([245, 250, 250])
    ident, upper = stats.identities_for(shared, s, 16)
    li, lu = stats.identity_lut(245, 16)
    assert ident[0] == li[240]
    assert upper[0] == lu[240]
    assert ident[2] == np.float32(0.0)
