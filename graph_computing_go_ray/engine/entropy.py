"""A4 (degree-distribution entropy) and A5 (structural entropy) over an edge
Dataset, with the three channels of the reference oracle: in / out / all.

Semantics (oracle: /root/reference/lab/test.ipynb cell 1, call sites
/root/reference/internal/wikiEntropy/wikiEntropy.go:102-106):

- Degrees are MULTIGRAPH degrees of the graph built from the edge list
  (parallel edges count; vertices not touching any edge don't exist).
- Structural entropy channels: in-channel over vertices with in_degree>0,
  p_i = deg_i / sum(deg); likewise out; "all" over in+out sums > 0.
  Normalized by (H - Emin)/(log2 n - Emin), Emin = log2(4(n-1))/2.
- Degree-distribution entropy: histogram over degree VALUES; in/out channels
  include degree-0 vertices (a vertex that appears only as a source has
  in-degree 0 and still contributes to the in-histogram), "all" excludes
  total-degree-0 (impossible for a vertex in an edge list anyway).

Everything is two Sum aggregates per channel (log-sum trick,
functions/entropy_math.py); only O(#distinct degree values) rows ever reach
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions import entropy_math as em


def _degree_table(edges: Dataset) -> Dataset:
    """(id, in_degree, out_degree) for every vertex appearing in the edge list.

    One shuffle: per-block partial counts for src and dst roles are emitted
    together and summed in a single groupby(id).
    """

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        s_ids, s_cnt = np.unique(src, return_counts=True)
        d_ids, d_cnt = np.unique(dst, return_counts=True)
        ids = np.concatenate([s_ids, d_ids])
        outd = np.concatenate([s_cnt, np.zeros(len(d_ids), dtype=np.int64)])
        ind = np.concatenate([np.zeros(len(s_ids), dtype=np.int64), d_cnt])
        return pa.table(
            {"id": ids.astype(np.int64), "in_degree": ind, "out_degree": outd}
        )

    partials = edges.select_columns(["src", "dst"]).map_batches(
        partial, batch_format="pyarrow"
    )
    from .join import bucket_grouped_sum

    return bucket_grouped_sum(partials, ["id"], ["in_degree", "out_degree"])


def degree_table(edges: Dataset) -> Dataset:
    return _degree_table(edges)


def _xlog2x(x: np.ndarray) -> np.ndarray:
    out = np.zeros(len(x), dtype=np.float64)
    pos = x > 0
    xf = x[pos].astype(np.float64)
    out[pos] = xf * np.log2(xf)
    return out


def entropy_report(edges: Dataset) -> dict[str, float]:
    """All six entropy scalars + vertex counts, computed distributed.

    Returns keys matching the reference result-doc fields consumed by the
    analysis notebooks (entropyin/normalizeentropyin/nodecount...,
    /root/reference/lab/openalex_entropy.ipynb cell 2) plus the degree-
    distribution channel values.
    """
    deg = _degree_table(edges)

    # Structural entropy: need Sum(deg), Sum(deg*log2 deg), n>0 per channel;
    # Degree-distribution entropy: histogram of degree values per channel.
    def partial(batch: pa.Table) -> pa.Table:
        ind = batch["in_degree"].to_numpy(zero_copy_only=False)
        outd = batch["out_degree"].to_numpy(zero_copy_only=False)
        alld = ind + outd
        rows = {
            "s_in": float(ind.sum()),
            "s1_in": float(_xlog2x(ind).sum()),
            "n_in": int((ind > 0).sum()),
            "s_out": float(outd.sum()),
            "s1_out": float(_xlog2x(outd).sum()),
            "n_out": int((outd > 0).sum()),
            "s_all": float(alld.sum()),
            "s1_all": float(_xlog2x(alld).sum()),
            "n_all": int((alld > 0).sum()),
            "n_vertices": len(ind),
        }
        return pa.table({k: [v] for k, v in rows.items()})

    sums_ds = deg.map_batches(partial, batch_format="pyarrow")
    agg = sums_ds.sum(
        ["s_in", "s1_in", "n_in", "s_out", "s1_out", "n_out",
         "s_all", "s1_all", "n_all", "n_vertices"]
    )
    g = {k.replace("sum(", "").replace(")", ""): v for k, v in agg.items()}

    # histograms (small: one row per distinct degree value)
    hists = {}
    for chan, col in (("in", "in_degree"), ("out", "out_degree")):
        h = deg.map_batches(
            lambda t, c=col: pa.table(
                {"degree": np.unique(t[c].to_numpy(zero_copy_only=False))[0:0]}
            )
            if t.num_rows == 0
            else _hist_partial(t, c),
            batch_format="pyarrow",
        )
        hists[chan] = (
            h.groupby("degree").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
        )
    h_all = deg.map_batches(_hist_all_partial, batch_format="pyarrow")
    hists["all"] = (
        h_all.groupby("degree").aggregate(Sum("cnt", alias_name="cnt")).to_pandas()
    )

    rep: dict[str, float] = {}
    for chan in ("in", "out", "all"):
        s, s1, n = g[f"s_{chan}"], g[f"s1_{chan}"], int(g[f"n_{chan}"])
        h_struct = em.entropy_from_sums(s, s1)
        rep[f"entropy_{chan}"] = h_struct
        rep[f"normalize_entropy_{chan}"] = em.struct_entropy_norm(h_struct, n)
        rep[f"node_{chan}_count"] = n
        hist = hists[chan]
        counts = hist["cnt"].to_numpy()
        if chan == "all":
            counts = hist.loc[hist["degree"] > 0, "cnt"].to_numpy()
        rep[f"degree_dist_entropy_{chan}"] = em.degree_distribution_entropy(counts)
    rep["node_count"] = int(g["n_vertices"])
    return rep


def _hist_partial(t: pa.Table, col: str) -> pa.Table:
    vals, cnts = np.unique(t[col].to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table({"degree": vals.astype(np.int64), "cnt": cnts.astype(np.int64)})


def _hist_all_partial(t: pa.Table) -> pa.Table:
    alld = t["in_degree"].to_numpy(zero_copy_only=False) + t["out_degree"].to_numpy(
        zero_copy_only=False
    )
    vals, cnts = np.unique(alld, return_counts=True)
    return pa.table({"degree": vals.astype(np.int64), "cnt": cnts.astype(np.int64)})
