"""functions/stats.py: the scipy-free quantile constants feeding the
BH-FDR gate (a22). Values pinned against published tables."""

import math

from information_extraction_spark.functions.stats import (
    bh_crit_ppm,
    chi2_1_crit,
    inv_norm_cdf,
)


def test_inv_norm_cdf_known_quantiles():
    # Published z-values (Abramowitz & Stegun table precision).
    for p, z in [
        (0.975, 1.959964),
        (0.95, 1.644854),
        (0.999, 3.090232),
        (0.5, 0.0),
        (0.025, -1.959964),
        (0.001, -3.090232),
    ]:
        assert math.isclose(inv_norm_cdf(p), z, abs_tol=5e-6), p


def test_chi2_1_crit_published_values():
    for q, x in [(0.05, 3.841459), (0.01, 6.634897), (0.001, 10.827566)]:
        assert math.isclose(chi2_1_crit(q), x, abs_tol=5e-6), q


def test_bh_table_monotone_and_endpoints():
    t = bh_crit_ppm(50, alpha=0.05)
    assert len(t) == 50 and t[0][0] == 1 and t[-1][0] == 50
    # Rank-m threshold equals the raw-alpha critical value; thresholds
    # strictly decrease as the rank (allowed p) grows.
    assert t[-1][1] == 3841459
    crits = [c for _, c in t]
    assert all(a > b for a, b in zip(crits, crits[1:]))
