"""Scipy-free statistical constants shared by both engines.

The cross-engine discipline for anything transcendental (BENCH/EVAL
float rules; the DFT trig tables in operators/multimodal.py set the
pattern): compute the constant ONCE in driver-side Python, embed the
SAME integer literal in the Spark plan and the DuckDB oracle SQL, and
never let either engine evaluate exp/ln/erf in a compared column.
This module supplies the chi-square(1) critical values the
Benjamini-Hochberg step-up needs — one per candidate rank — via a
closed-form reduction to the normal quantile (chi2(1) upper-tail q
critical value = z^2 with z = Phi^-1(1 - q/2)) and Acklam's rational
approximation of Phi^-1 (|rel err| < 1.15e-9; approximation accuracy
only affects the statistical constant itself, never cross-engine
agreement, because both engines consume the identical literal).
"""

from __future__ import annotations

import math

# Acklam's inverse-normal-CDF coefficients (published constants).
_A = (
    -3.969683028665376e01,
    2.209460984245205e02,
    -2.759285104469687e02,
    1.383577518672690e02,
    -3.066479806614716e01,
    2.506628277459239e00,
)
_B = (
    -5.447609879822406e01,
    1.615858368580409e02,
    -1.556989798598866e02,
    6.680131188771972e01,
    -1.328068155288572e01,
)
_C = (
    -7.784894002430293e-03,
    -3.223964580411365e-01,
    -2.400758277161838e00,
    -2.549732539343734e00,
    4.374664141464968e00,
    2.938163982698783e00,
)
_D = (
    7.784695709041462e-03,
    3.224671290700398e-01,
    2.445134137142996e00,
    3.754408661907416e00,
)


def inv_norm_cdf(p: float) -> float:
    """Phi^-1(p) for 0 < p < 1 (Acklam 2003 rational approximation
    with one Halley refinement step — deterministic pure Python)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        x = (
            ((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q
            + _C[5]
        ) / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1)
    elif p <= p_high:
        q = p - 0.5
        r = q * q
        x = (
            (((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5])
            * q
            / (((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1)
        )
    else:
        q = math.sqrt(-2 * math.log1p(-p))
        x = -(
            ((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q
            + _C[5]
        ) / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1)
    # One Halley step against the exact CDF (erf is in math).
    e = 0.5 * math.erfc(-x / math.sqrt(2)) - p
    u = e * math.sqrt(2 * math.pi) * math.exp(x * x / 2)
    return x - u / (1 + x * u / 2)


def chi2_1_crit(q: float) -> float:
    """Upper-tail critical value of chi-square with 1 dof: the x with
    P(X > x) = q, via X = Z^2 (P(Z^2 > x) = 2(1 - Phi(sqrt(x))))."""
    z = inv_norm_cdf(1 - q / 2)
    return z * z


def bh_crit_ppm(m: int, alpha: float = 0.05) -> list[tuple[int, int]]:
    """Benjamini-Hochberg per-rank chi2(1) critical values in ppm:
    rank i (1-based, p-values ascending = chi2 descending) rejects
    raw iff p_i <= i*alpha/m iff chi2_i >= chi2_1_crit(i*alpha/m).
    Returned as (rank, crit_ppm) integer pairs for literal embedding
    in both engines."""
    return [
        (i, int(round(chi2_1_crit(i * alpha / m) * 1_000_000)))
        for i in range(1, m + 1)
    ]
