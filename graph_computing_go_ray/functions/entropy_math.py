"""Entropy kernels shared by every entropy-flavoured operator.

Semantics recovered from the reference's Python oracles
(/root/reference/lab/test.ipynb cell 1, lab/ba_generate_entropy.ipynb cell 2)
and call sites (/root/reference/internal/wikiEntropy/wikiEntropy.go:102-106).

All kernels use the log-sum identity
    H = -sum_i (x_i/S) * log2(x_i/S) = log2(S) - (sum_i x_i*log2(x_i)) / S
which turns a normalized-probability entropy into two distributive SUM
aggregates — the shape that scales (partial sums per batch, one small
groupby) — at the cost of a different floating-point rounding path than the
reference's per-element loop; tolerance is 1e-6 (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import math

import numpy as np


def entropy_from_values(values: np.ndarray) -> float:
    """H of the normalized distribution of positive `values`.

    Zero entries are ignored (the reference only feeds positive degrees).
    """
    v = np.asarray(values, dtype=np.float64)
    v = v[v > 0]
    if v.size == 0:
        return 0.0
    s = float(v.sum())
    s1 = float((v * np.log2(v)).sum())
    return math.log2(s) - s1 / s


def entropy_from_sums(total: float, total_xlog2x: float) -> float:
    """H from pre-aggregated S = sum(x) and S1 = sum(x*log2 x)."""
    if total <= 0:
        return 0.0
    return math.log2(total) - total_xlog2x / total


def struct_entropy_norm(h: float, n: int) -> float:
    """Normalized structural entropy (reference lab/test.ipynb cell 1):
    (H - Emin) / (log2 n - Emin), Emin = log2(4*(n-1))/2."""
    if n <= 1:
        return float("nan")
    e_min = math.log2(4 * (n - 1)) / 2
    denom = math.log2(n) - e_min
    if denom == 0:
        return float("nan")
    return (h - e_min) / denom


def degree_distribution_entropy(hist_counts: np.ndarray) -> float:
    """A4 'degree distribution entropy': entropy over the histogram of degree
    VALUES (p_k = count_k / sum(count)), per lab/test.ipynb cell 1
    (handle_degree_distrubution_entropy)."""
    return entropy_from_values(np.asarray(hist_counts, dtype=np.float64))
