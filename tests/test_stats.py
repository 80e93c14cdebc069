"""Statistics kernel tests, pinned by the reference goldens."""

import numpy as np

from pyfastani_tpu import stats


def test_recommended_window_size_default_is_24():
    # golden: /root/reference/src/pyfastani/tests/test_ani.py:60
    assert stats.recommended_window_size(1e-3, 16, 4, 80.0, 3000, 5_000_000) == 24


def test_j2md_md2j_roundtrip():
    assert stats.j2md(0.0, 16) == 1.0
    assert stats.j2md(1.0, 16) == 0.0
    for j in (0.01, 0.02, 0.1, 0.5, 0.9):
        d = stats.j2md(j, 16)
        assert abs(stats.md2j(d, 16) - j) < 1e-6


def test_minimum_hits_monotone():
    prev = 0
    for s in (10, 50, 100, 240, 250, 500, 1000):
        m = stats.estimate_minimum_hits(s, 16, 80.0)
        r = stats.estimate_minimum_hits_relaxed(s, 16, 80.0)
        assert 0 <= r <= m
        assert m >= prev
        prev = m


def test_relaxed_hits_boundary():
    # the s=240 / s=250 boundary is what makes the default window 24:
    # at s=240 two shared sketches still have an 80%-identity upper bound,
    # at s=250 they do not.
    assert stats.estimate_minimum_hits_relaxed(240, 16, 80.0) == 2
    assert stats.estimate_minimum_hits_relaxed(250, 16, 80.0) == 3


def test_tables_match_scalar_functions():
    tab = stats.min_hits_relaxed_table(64, 16, 80.0)
    for s in (1, 7, 33, 64):
        assert tab[s] == stats.estimate_minimum_hits_relaxed(s, 16, 80.0)

    gate = stats.l2_gate_table(64, 16, 80.0)
    for s in (1, 16, 33, 64):
        threshold = int(gate[s])
        for shared in range(0, s + 1):
            ub = stats._identity_upper_bound(shared, s, 16)
            passes = np.float32(ub) >= np.float32(80.0)
            assert passes == (shared >= threshold), (s, shared)


def test_binomial_quantile_semantics():
    # smallest m with P(X > m) <= q
    n, p, q = 100, 0.1, 0.05
    m = stats._binom_quantile_complement(n, p, q)
    assert stats._binom_sf(n, p, m) <= q
    assert stats._binom_sf(n, p, m - 1) > q
