"""Raghavan (1988) upper bound on the p-value of a weighted Bernoulli sum.

Same math and precision as ``hypothesis_test_module.py:248-327``: weights
w_i = log10(p_i) / log10(p_max) normalized so the largest-probability read
has weight 1, m = sum w_i p_i, y = sum of weights of supporting reads,
d = y/m - 1, bound = e^k / (1+d)^(k + k/d) with k = m*d, evaluated with
decimal prec 100.  A fast float64 log-space evaluation handles the
overwhelming majority of edges; decimal is used when the fast path is out
of its safe range or lands near the decision threshold.
"""
from __future__ import annotations

import math
from decimal import Decimal, getcontext
from typing import Dict, Iterable

getcontext().prec = 100


def raghavan_upper_pvalue_bound(
    probability: Dict[str, float], x_equal_to_one: Iterable[str]
) -> float:
    assert max(probability.values()) <= 1.0
    assert min(probability.values()) > 0.0
    log_probabilities = {
        acc: -math.log10(p_i) for acc, p_i in probability.items()
    }
    log_p_i_max = max(log_probabilities.values())
    assert log_p_i_max > 0
    weight = {acc: lp / log_p_i_max for acc, lp in log_probabilities.items()}

    m = Decimal(sum(weight[acc] * probability[acc] for acc in probability))
    y = Decimal(sum(weight[x] for x in x_equal_to_one))
    d = y / m - 1
    k = m * d
    if y == 0:
        return 1.0
    if d == 0:
        return 0.5
    bound = k.exp() / (d + 1) ** (k + k / d)
    return float(bound)


def correction_factor(t_seq_len: int, delta_t: Dict[int, tuple]) -> float:
    """Bonferroni-style multiplicity factor (``hypothesis_test_module.py:
    329-341``): (4(m+1))^nI * C(m, nD) * C(3(m-nD), nS)."""
    m = t_seq_len
    n_S = sum(1 for s, _c, _u in delta_t.values() if s == "S")
    n_D = sum(1 for s, _c, _u in delta_t.values() if s == "D")
    n_I = sum(1 for s, _c, _u in delta_t.values() if s == "I")
    return (
        (4 * (m + 1)) ** n_I
        * math.comb(m, n_D)
        * math.comb(3 * (m - n_D), n_S)
    )
