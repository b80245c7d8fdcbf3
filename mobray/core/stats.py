"""Statistical primitives without scipy.

The reference computes a Welch two-sample t-test p-value with
``scipy.stats.t.cdf`` (MOBPY/core/merge.py:230-284). scipy is not
available in this environment, so the Student-t survival function is
re-derived here from the regularized incomplete beta function using the
standard continued-fraction expansion (Lentz's method — a classic
public-domain numerical algorithm). The identity used:

    P(T_df > t) = 0.5 * I_x(df/2, 1/2),   x = df / (df + t^2),  t >= 0

Accuracy is validated in tests against hard-coded scipy values to
~1e-12 relative.
"""

from __future__ import annotations

import math

_FPMIN = 1e-300
_EPS = 3e-16
_MAXIT = 300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued-fraction for the incomplete beta function (Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta function I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Survival function P(T_df > t) of Student's t, for any real t."""
    if df <= 0:
        raise ValueError(f"df must be positive, got {df}")
    if t == 0.0:
        return 0.5
    x = df / (df + t * t)
    p_tail = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p_tail if t > 0 else 1.0 - p_tail


def norm_cdf(x: float) -> float:
    """Standard normal CDF via erfc."""
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def norm_sf(x: float) -> float:
    """Standard normal survival function."""
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def welch_pvalue(
    na: int,
    mean_a: float,
    var_a: float,
    nb: int,
    mean_b: float,
    var_b: float,
    epsilon: float = 1e-12,
) -> float:
    """Two-tailed Welch t-test p-value with the reference's edge cases.

    Mirrors MOBPY/core/merge.py:230-284 exactly:
      - either side empty -> 1.0
      - both singletons -> 1.0 if means equal within epsilon, else 0.5
      - zero pooled SE -> 1.0 if means equal within epsilon, else 0.0
      - Welch–Satterthwaite df clamped to [1, na+nb-2] when both
        variances positive; otherwise df = na+nb-2
      - p = 2 * (1 - t.cdf(|t|, df)), clipped to [0, 1]
    """
    if na == 0 or nb == 0:
        return 1.0
    if na == 1 and nb == 1:
        return 1.0 if abs(mean_a - mean_b) < epsilon else 0.5

    se_sq = var_a / na + var_b / nb
    if se_sq <= 0:
        return 1.0 if abs(mean_a - mean_b) < epsilon else 0.0

    t_stat = abs(mean_a - mean_b) / math.sqrt(se_sq)

    # Welch–Satterthwaite needs n>1 on both sides; with a Block input
    # var>0 implies n>=2 (Block.var is 0 for n<=1, MOBPY/core/pava.py:73),
    # so the extra n guards only protect direct callers passing raw stats.
    df_denom = 0.0
    if var_a > 0 and var_b > 0 and na > 1 and nb > 1:
        df_denom = (var_a / na) ** 2 / (na - 1) + (var_b / nb) ** 2 / (nb - 1)
    if df_denom > 0:
        df = se_sq**2 / df_denom
        df = max(1.0, min(df, float(na + nb - 2)))
    else:
        # subnormal variances can square to exactly 0 — fall back like the
        # reference's zero-variance branch
        df = float(max(1, na + nb - 2))

    p = 2.0 * t_sf(abs(t_stat), df)
    if p < 0.0:
        return 0.0
    if p > 1.0:
        return 1.0
    return float(p)


def pearson_corr(x, y) -> float:
    """Pearson correlation with the reference's degenerate-input fallbacks.

    Mirrors MOBPY/core/utils.py:388-438: <2 valid pairs -> 0.0; zero
    sample std (ddof=1) on either side -> 0.0; NaN result -> 0.0.
    Inputs are 1-D numpy arrays (NaN pairs removed by the caller or here).
    """
    import numpy as np

    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    mask = ~(np.isnan(x) | np.isnan(y))
    xc = x[mask]
    yc = y[mask]
    if len(xc) < 2:
        return 0.0
    if xc.std(ddof=1) == 0 or yc.std(ddof=1) == 0:
        return 0.0
    corr = float(np.corrcoef(xc, yc)[0, 1])
    if math.isnan(corr):
        return 0.0
    return corr
