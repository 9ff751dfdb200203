"""Exact distributed quantiles without a global sort.

Two-pass histogram refinement (the T2/T3 boundary trick of
engine/rank.py percent_slice_boundaries, generalized to float columns):

1. One streaming pass computes per-batch (count, min, max) partials and a
   K-bin equi-width histogram; the driver holds only K counts.
2. The cumulative K-bin counts locate, for each target rank ceil(q*n),
   the ONE bin containing it. A second pass builds a distinct-value
   histogram restricted to exactly the needed bins (bin membership is
   recomputed with the same binning kernel, so pass-1 counts and pass-2
   rows agree bit-for-bit) and the driver resolves the value at the
   in-bin rank from that small table.

Exactness: rank-ceil(q*n) of the ascending total order, independent of
block/batch order (counts are order-free). Driver memory is K ints plus
the distinct values of the few target bins — at 100 TB pick K so that
n/K distinct values per bin stays small; value-heavy bins only arise
when one bin spans many distinct values AND holds a target rank, and K
can be raised per column without touching the algorithm."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _bin_of(v: np.ndarray, lo: float, hi: float, k: int) -> np.ndarray:
    """Bin index in [0, k): equi-width over [lo, hi], right edge inclusive
    in the last bin. Shared by both passes so membership is consistent."""
    if hi == lo:
        return np.zeros(len(v), dtype=np.int64)
    idx = np.floor((v - lo) * (k / (hi - lo))).astype(np.int64)
    return np.clip(idx, 0, k - 1)


def exact_quantiles(
    ds: Dataset, col: str, qs: list[float], k_bins: int = 4096,
) -> pd.DataFrame:
    """(q, value) — value at rank ceil(q*n), 1-based, ascending order.

    `ds` is consumed twice; pass a materialized dataset when the upstream
    is expensive."""
    # pass 1: (count, min, max, k-bin counts) per batch; driver combines
    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()),
             "mn": pa.array([float(v.min()) if len(v) else math.inf]),
             "mx": pa.array([float(v.max()) if len(v) else -math.inf])}
        )

    stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(stats["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    lo, hi = float(stats["mn"].min()), float(stats["mx"].max())

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = _bin_of(v, lo, hi, k_bins)
        cnt = np.bincount(b, minlength=k_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(cnt[nz], pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas().groupby("bin")["cnt"].sum()
    )
    counts = np.zeros(k_bins, dtype=np.int64)
    counts[hist.index.to_numpy()] = hist.to_numpy()
    cum = counts.cumsum()

    # target rank -> owning bin; group ranks by bin to filter once per bin
    ranks = {q: max(1, int(math.ceil(q * n))) for q in qs}
    bins_needed: dict[int, list[float]] = {}
    for q, r in ranks.items():
        j = int(np.searchsorted(cum, r))
        bins_needed.setdefault(j, []).append(q)

    # pass 2: distinct-value histogram of exactly the target bins
    needed = np.array(sorted(bins_needed), dtype=np.int64)

    def in_bins(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = _bin_of(v, lo, hi, k_bins)
        m = np.isin(b, needed)
        df = pd.DataFrame({"bin": b[m], "value": v[m]})
        out = df.groupby(["bin", "value"], as_index=False).size()
        return pa.Table.from_pandas(
            out.rename(columns={"size": "cnt"}), preserve_index=False
        )

    vals = (
        ds.map_batches(in_bins, batch_format="pyarrow")
        .to_pandas()
        .groupby(["bin", "value"], as_index=False)["cnt"].sum()
    )

    rows = []
    for j, qlist in bins_needed.items():
        sub = vals[vals["bin"] == j].sort_values("value")
        vcum = sub["cnt"].cumsum().to_numpy()
        base = int(cum[j - 1]) if j > 0 else 0
        for q in qlist:
            r_in = ranks[q] - base
            pos = int(np.searchsorted(vcum, r_in))
            rows.append({"q": float(q), "value": float(sub["value"].iloc[pos])})
    out = pd.DataFrame(rows).sort_values("q", ignore_index=True)
    out["q"] = out["q"].astype(np.float64)
    out["value"] = out["value"].astype(np.float64)
    return out
