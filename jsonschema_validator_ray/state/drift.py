"""Distribution-drift tests evaluated on merged sketch state (driver-side
final step): chi-square goodness-of-fit on categorical counts and a KS
statistic against a reference CDF. No scipy in the sandbox, so the chi-square
p-value uses the regularized upper incomplete gamma function Q(k/2, x/2)
(Numerical Recipes' standard series/continued-fraction formulation — public
algorithm)."""

from __future__ import annotations

import math
from typing import Mapping, Sequence


def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # lower series, then Q = 1 - P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - p)
    # continued fraction for Q directly
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(stat: float, dof: int) -> float:
    """Survival function of the chi-square distribution."""
    return _gammainc_upper_reg(dof / 2.0, stat / 2.0)


def chi_square_test(observed: Mapping[str, float],
                    reference_freqs: Mapping[str, float]) -> tuple[float, float]:
    """Chi-square goodness-of-fit of observed category counts against reference
    relative frequencies. Returns (statistic, p_value). Categories observed but
    absent from the reference are pooled with a tiny expected mass so they
    contribute (they indicate drift by definition)."""
    total = sum(observed.values())
    if total == 0:
        return 0.0, 1.0
    cats = set(observed) | set(reference_freqs)
    stat = 0.0
    eps = 1e-9
    for c in sorted(cats):
        obs = float(observed.get(c, 0.0))
        exp = max(float(reference_freqs.get(c, 0.0)) * total, eps * total)
        stat += (obs - exp) ** 2 / exp
    dof = max(len(cats) - 1, 1)
    return stat, chi2_sf(stat, dof)


def ks_statistic_from_cdf(digest, reference_cdf: Sequence[tuple[float, float]]) -> float:
    """KS statistic between a t-digest's empirical CDF and a reference CDF
    given as (edge, cdf) points, evaluated at the reference edges (the edges
    come from the clean generation's digest quantiles, so they cover the
    support)."""
    worst = 0.0
    for edge, ref_cdf in reference_cdf:
        emp = digest.cdf(float(edge))
        if emp != emp:  # NaN: empty digest
            return float("nan")
        worst = max(worst, abs(emp - float(ref_cdf)))
    return worst
