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


def entropy_report(edges: Dataset) -> dict[str, float]:
    """All six entropy scalars + vertex counts, computed distributed.

    Returns keys matching the reference result-doc fields consumed by the
    analysis notebooks (entropyin/normalizeentropyin/nodecount...,
    /root/reference/lab/openalex_entropy.ipynb cell 2) plus the degree-
    distribution channel values.

    Everything derives from the three degree-VALUE histograms
    (S = Σ deg·cnt, S1 = Σ cnt·deg·log2(deg), n = Σ cnt over deg>0), so the
    whole report is ONE histogram pass over the degree table — only
    O(#distinct degree values) rows reach the driver.
    """
    deg = _degree_table(edges)

    def partial(batch: pa.Table) -> pa.Table:
        ind = batch["in_degree"].to_numpy(zero_copy_only=False)
        outd = batch["out_degree"].to_numpy(zero_copy_only=False)
        chans, degrees, cnts = [], [], []
        for chan, vals in ((0, ind), (1, outd), (2, ind + outd)):
            v, c = np.unique(vals, return_counts=True)
            chans.append(np.full(len(v), chan, dtype=np.int64))
            degrees.append(v.astype(np.int64))
            cnts.append(c.astype(np.int64))
        return pa.table(
            {"chan": np.concatenate(chans), "degree": np.concatenate(degrees),
             "cnt": np.concatenate(cnts)}
        )

    from .join import bucket_grouped_sum

    hist = bucket_grouped_sum(
        deg.map_batches(partial, batch_format="pyarrow"),
        ["chan", "degree"], ["cnt"], num_buckets=8,
    ).to_pandas()

    rep: dict[str, float] = {}
    for chan_id, chan in ((0, "in"), (1, "out"), (2, "all")):
        h = hist[hist["chan"] == chan_id]
        d = h["degree"].to_numpy().astype(np.float64)
        c = h["cnt"].to_numpy().astype(np.float64)
        pos = d > 0
        s = float((d[pos] * c[pos]).sum())
        s1 = float((c[pos] * d[pos] * np.log2(d[pos])).sum())
        n = int(c[pos].sum())
        h_struct = em.entropy_from_sums(s, s1)
        rep[f"entropy_{chan}"] = h_struct
        rep[f"normalize_entropy_{chan}"] = em.struct_entropy_norm(h_struct, n)
        rep[f"node_{chan}_count"] = n
        counts = c[pos] if chan == "all" else c  # dde in/out include degree 0
        rep[f"degree_dist_entropy_{chan}"] = em.degree_distribution_entropy(counts)
    rep["node_count"] = int(hist.loc[hist["chan"] == 0, "cnt"].sum())
    return rep
