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


def grouped_exact_quantiles(
    ds: Dataset, group_col: str, val_col: str, qs: list[float],
    k_bins: int = 4096,
) -> pd.DataFrame:
    """(group, q, value) — per-group value at rank ceil(q*n_g), 1-based
    ascending: exactly DuckDB ``quantile_disc`` (verified rule: index
    ceil(q*n)-1 into the sorted group, with q*n evaluated in the same
    IEEE doubles both sides use).

    The grouped generalization of :func:`exact_quantiles` for CONTINUOUS
    columns — where a (group, value) histogram would be corpus-sized
    (one distinct value per row), this stays exact with driver state
    O(groups × k_bins): pass 1 folds per-group (n, min, max); pass 2 a
    per-group k-bin count histogram (per-batch nonzero partials, one
    pandas combine); pass 3 collects distinct values ONLY from each
    group's target bins (≈ n_g/k_bins rows per requested quantile).
    Assumes the number of groups is driver-small (sources, languages,
    years); n_g per group is unbounded. ``ds`` is scanned three times —
    pass a materialized dataset when the upstream is expensive."""
    def stats_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_pylist(),
            "v": t[val_col].to_numpy(zero_copy_only=False).astype(np.float64),
        })
        out = df.groupby("g", as_index=False).agg(
            n=("v", "size"), mn=("v", "min"), mx=("v", "max"))
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("g", as_index=False)
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    )
    if stats.empty:
        return pd.DataFrame({"group": [], "q": [], "value": []})
    bounds = {r.g: (int(r.n), float(r.mn), float(r.mx))
              for r in stats.itertuples()}

    import ray
    b_ref = ray.put(bounds)

    def hist_partial(t: pa.Table) -> pa.Table:
        m = ray.get(b_ref)
        g = t[group_col].to_pylist()
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        frames = []
        for gk in set(g):
            _, lo, hi = m[gk]
            mask = np.fromiter((x == gk for x in g), bool, count=len(g))
            b = _bin_of(v[mask], lo, hi, k_bins)
            cnt = np.bincount(b, minlength=k_bins)
            nz = np.flatnonzero(cnt)
            frames.append(pd.DataFrame(
                {"g": gk, "bin": nz, "cnt": cnt[nz]}))
        out = (pd.concat(frames, ignore_index=True) if frames
               else pd.DataFrame({"g": [], "bin": [], "cnt": []}))
        return pa.Table.from_pandas(out, preserve_index=False)

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["g", "bin"], as_index=False)["cnt"].sum()
    )

    # per group: target rank -> owning bin
    needed: dict[object, dict[int, list[float]]] = {}
    cums: dict[object, np.ndarray] = {}
    for gk, sub in hist.groupby("g"):
        counts = np.zeros(k_bins, dtype=np.int64)
        counts[sub["bin"].to_numpy(np.int64)] = sub["cnt"].to_numpy(np.int64)
        cum = counts.cumsum()
        cums[gk] = cum
        n_g = bounds[gk][0]
        for q in qs:
            r = max(1, int(math.ceil(q * n_g)))
            j = int(np.searchsorted(cum, r))
            needed.setdefault(gk, {}).setdefault(j, []).append(q)

    tgt = {gk: np.array(sorted(d), dtype=np.int64)
           for gk, d in needed.items()}
    t_ref = ray.put(tgt)

    def in_bins(t: pa.Table) -> pa.Table:
        m = ray.get(b_ref)
        tg = ray.get(t_ref)
        g = t[group_col].to_pylist()
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        frames = []
        for gk in set(g):
            _, lo, hi = m[gk]
            mask = np.fromiter((x == gk for x in g), bool, count=len(g))
            b = _bin_of(v[mask], lo, hi, k_bins)
            keep = np.isin(b, tg[gk])
            df = pd.DataFrame({"g": gk, "bin": b[keep],
                               "value": v[mask][keep]})
            frames.append(df.groupby(["g", "bin", "value"],
                                     as_index=False).size())
        out = (pd.concat(frames, ignore_index=True) if frames
               else pd.DataFrame({"g": [], "bin": [], "value": [],
                                  "size": []}))
        return pa.Table.from_pandas(
            out.rename(columns={"size": "cnt"}), preserve_index=False)

    vals = (
        ds.map_batches(in_bins, batch_format="pyarrow")
        .to_pandas()
        .groupby(["g", "bin", "value"], as_index=False)["cnt"].sum()
    )

    rows = []
    for gk, d in needed.items():
        n_g = bounds[gk][0]
        gv = vals[vals["g"] == gk]
        for j, qlist in d.items():
            sub = gv[gv["bin"] == j].sort_values("value")
            vcum = sub["cnt"].cumsum().to_numpy()
            base = int(cums[gk][j - 1]) if j > 0 else 0
            for q in qlist:
                r_in = max(1, int(math.ceil(q * n_g))) - base
                pos = int(np.searchsorted(vcum, r_in))
                rows.append({"group": gk, "q": float(q),
                             "value": float(sub["value"].iloc[pos])})
    return (pd.DataFrame(rows)
            .sort_values(["group", "q"], ignore_index=True))


def weighted_exact_quantiles(
    ds: Dataset, col: str, wcol: str, qs: list[float], k_bins: int = 4096,
) -> pd.DataFrame:
    """(q, value) — the SMALLEST value whose cumulative weight (ascending
    value order) reaches q x total-weight. Same two-pass histogram
    refinement as exact_quantiles with integer WEIGHT sums in place of
    counts; the threshold q*W is evaluated once in float64, identically
    to the SQL twin. Weights must be non-negative int64."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"w": pa.array([int(w.sum())], pa.int64()),
             "mn": pa.array([float(v.min()) if len(v) else math.inf]),
             "mx": pa.array([float(v.max()) if len(v) else -math.inf])})

    stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    W = int(stats["w"].sum())
    if W == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    lo, hi = float(stats["mn"].min()), float(stats["mx"].max())

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _bin_of(v, lo, hi, k_bins)
        acc = np.bincount(b, weights=w.astype(np.float64),
                          minlength=k_bins).astype(np.int64)
        nz = np.flatnonzero(acc)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "w": pa.array(acc[nz], pa.int64())})

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .to_pandas().groupby("bin")["w"].sum())
    weights = np.zeros(k_bins, dtype=np.int64)
    weights[hist.index.to_numpy()] = hist.to_numpy()
    cum = weights.cumsum()

    thresholds = {q: q * float(W) for q in qs}
    bins_needed: dict[int, list[float]] = {}
    for q, thr in thresholds.items():
        j = int(np.searchsorted(cum.astype(np.float64), thr, side="left"))
        j = min(j, k_bins - 1)
        bins_needed.setdefault(j, []).append(q)

    needed = np.array(sorted(bins_needed), dtype=np.int64)

    def in_bins(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
        b = _bin_of(v, lo, hi, k_bins)
        m = np.isin(b, needed)
        df = pd.DataFrame({"bin": b[m], "value": v[m], "w": w[m]})
        out = df.groupby(["bin", "value"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    vals = (ds.map_batches(in_bins, batch_format="pyarrow")
            .to_pandas().groupby(["bin", "value"], as_index=False)["w"].sum())

    rows = []
    for j, qlist in bins_needed.items():
        sub = vals[vals["bin"] == j].sort_values("value")
        vcum = sub["w"].cumsum().to_numpy(np.int64)
        base = int(cum[j - 1]) if j > 0 else 0
        for q in qlist:
            thr_in = thresholds[q] - float(base)
            pos = int(np.searchsorted(vcum.astype(np.float64), thr_in,
                                      side="left"))
            pos = min(pos, len(vcum) - 1)
            rows.append({"q": float(q), "value": float(sub["value"].iloc[pos])})
    out = pd.DataFrame(rows).sort_values("q", ignore_index=True)
    out["q"] = out["q"].astype(np.float64)
    out["value"] = out["value"].astype(np.float64)
    return out
