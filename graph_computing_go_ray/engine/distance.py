"""A7/A8: distance complexity over a weighted undirected distance graph.

Reference: /root/reference/internal/distanceComplexity/distanceComplexity.go
:151-287; Python oracle lab/graph_distance_complexity.ipynb cell 1; goldens
distanceComplexity_test.go:18-92.

- 1-dim ("big"): per node i over ALL incident edge weights:
  R_i = Σw, H_i = -Σ (w/R_i)·log2(w/R_i); C = Σ H_i·R_i / Σ R_i.
- 2-dim ("little", module): over nodes with categories, intra-module edges
  only: per node s_i = Σ intra w, node entropy H_i over intra weights,
  hModule_j = Σ_i (s_i/D_j)·H_i with D_j = 2·Σ intra w; vall = 2·Σ all w
  (both endpoints categorized); O_j = Σ inter w incident to module j;
  moduleEntropy_j = hModule_j·D_j/vall − log2(D_j/vall)·O_j/vall;
  little = Σ_j moduleEntropy_j.

Input contract: edges (a, b, w) with one row per unordered pair (the
reference's distanceMap is last-write-wins per pair, SetEdge
distanceComplexity.go:34-71); categories (id, cat) single category per node
— multi-category cloning exists in the reference but shares the clone's
distance map by reference and is never exercised by its tests; this engine
requires pre-exploded single categories (documented deviation).

Everything reduces to groupby(node) / groupby(cat) log-sum aggregates;
≤ #modules rows reach the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from .join import bucket_join, rename


def _node_sums(ds: Dataset, node_col: str, w_col: str, extra_group=None) -> Dataset:
    """Per-node Σw and Σ w·log2(w) (log-sum entropy kernel)."""
    group = [node_col] if extra_group is None else [extra_group, node_col]

    def partial(t: pa.Table) -> pa.Table:
        w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {c: t[c].to_pylist() if t.schema.field(c).type == pa.large_string()
                else t[c].to_numpy(zero_copy_only=False) for c in group}
        df = pd.DataFrame({**cols, "s": w, "s1": w * np.log2(w)})
        g = df.groupby(group, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    p = ds.map_batches(partial, batch_format="pyarrow")
    return p.groupby(group).aggregate(Sum("s", alias_name="s"), Sum("s1", alias_name="s1"))


def _explode_endpoints(edges: Dataset, cols=("a", "b")) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        a = t[cols[0]].to_numpy(zero_copy_only=False)
        b = t[cols[1]].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64()),
             "w": pa.array(np.concatenate([w, w]), pa.float64())}
        )

    return edges.map_batches(fn, batch_format="pyarrow")


def distance_complexity_1d(edges: Dataset) -> float:
    """BigComplexity: C = Σ H_i·R_i / Σ R_i over all nodes (all edges)."""
    sums = _node_sums(_explode_endpoints(edges), "node", "w")

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        s1 = t["s1"].to_numpy(zero_copy_only=False)
        h = np.log2(s) - s1 / s  # H_i via log-sum identity
        return pa.table({"hr": pa.array(h * s), "r": pa.array(s)})

    agg = sums.map_batches(finish, batch_format="pyarrow").sum(["hr", "r"])
    g = agg["sum(r)"]
    return float(agg["sum(hr)"] / g) if g > 0 else 0.0


def distance_complexity_modular(
    edges: Dataset, categories: Dataset, num_buckets: int = 8
) -> dict:
    """LittlComplexity + per-module maps. categories: (id, cat)."""
    e1 = bucket_join(
        edges, rename(categories, {"id": "aid", "cat": "acat"}),
        on="a", right_on="aid", how="inner", num_buckets=num_buckets,
    )
    e2 = bucket_join(
        e1, rename(categories, {"id": "bid", "cat": "bcat"}),
        on="b", right_on="bid", how="inner", num_buckets=num_buckets,
    ).materialize()

    # global + per-module weight totals
    def wtag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        intra = pc.equal(t["acat"], t["bcat"])
        w = t["w"]
        return pa.table(
            {"cat": t["acat"], "bcat2": t["bcat"], "w": w,
             "intra": pc.cast(intra, pa.int64())}
        )

    tagged = e2.map_batches(wtag, batch_format="pyarrow")

    # vall = 2 * sum of all w (both endpoints categorized)
    tot = e2.map_batches(
        lambda t: pa.table({"w": t["w"]}), batch_format="pyarrow"
    ).sum("w")
    vall = 2.0 * float(tot)

    # per-module: D_j = 2*intra_w ; O_j = inter w incident (to both sides)
    def mod_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"cat": t["cat"].to_pylist(), "b2": t["bcat2"].to_pylist(),
             "w": t["w"].to_numpy(zero_copy_only=False),
             "intra": t["intra"].to_numpy(zero_copy_only=False)}
        )
        rows = []
        intra = df[df["intra"] == 1]
        g = intra.groupby("cat")["w"].agg(["sum", "count"]).reset_index()
        for _, r in g.iterrows():
            rows.append({"cat": r["cat"], "intra_w": r["sum"],
                         "n_edges": int(r["count"]), "outter_w": 0.0})
        inter = df[df["intra"] == 0]
        for col in ("cat", "b2"):
            gi = inter.groupby(col)["w"].sum().reset_index()
            for _, r in gi.iterrows():
                rows.append({"cat": r[col], "intra_w": 0.0, "n_edges": 0,
                             "outter_w": r["w"]})
        if not rows:
            rows = []
        out = pd.DataFrame(rows, columns=["cat", "intra_w", "n_edges", "outter_w"])
        return pa.Table.from_pandas(out, preserve_index=False)

    mod = (
        tagged.map_batches(mod_partial, batch_format="pyarrow")
        .groupby("cat")
        .aggregate(Sum("intra_w", alias_name="intra_w"),
                   Sum("n_edges", alias_name="n_edges"),
                   Sum("outter_w", alias_name="outter_w"))
        .to_pandas()
    )

    # per (module, node) intra sums -> node entropies -> hModule
    intra_edges = e2.map_batches(
        lambda t: _intra_explode(t), batch_format="pyarrow"
    )
    node_sums = _node_sums(intra_edges, "node", "w", extra_group="cat")

    def node_finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        s1 = t["s1"].to_numpy(zero_copy_only=False)
        h = np.log2(s) - s1 / s
        df = pd.DataFrame({"cat": t["cat"].to_pylist(), "sh": s * h, "one": 1})
        g = df.groupby("cat", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hmod = (
        node_sums.map_batches(node_finish, batch_format="pyarrow")
        .groupby("cat")
        .aggregate(Sum("sh", alias_name="sh"), Sum("one", alias_name="n_nodes"))
        .to_pandas()
    )

    # guard: zero categorized/intra edges leaves empty frames without columns
    if mod.empty:
        mod = pd.DataFrame({"cat": pd.Series([], dtype=object),
                            "intra_w": pd.Series([], dtype=np.float64),
                            "n_edges": pd.Series([], dtype=np.int64),
                            "outter_w": pd.Series([], dtype=np.float64)})
    if hmod.empty:
        hmod = pd.DataFrame({"cat": pd.Series([], dtype=object),
                             "sh": pd.Series([], dtype=np.float64),
                             "n_nodes": pd.Series([], dtype=np.int64)})
    mods = mod.merge(hmod, on="cat", how="left").fillna(0.0)
    little = 0.0
    module_complexity, module_node_size, module_edge_count = {}, {}, {}
    for _, r in mods.iterrows():
        d_j = 2.0 * float(r["intra_w"])
        if d_j == 0 or vall == 0:
            continue
        h_module = float(r["sh"]) / d_j
        o_j = float(r["outter_w"])
        term = h_module * d_j / vall - math.log2(d_j / vall) * o_j / vall
        little += term
        module_complexity[r["cat"]] = h_module
        module_node_size[r["cat"]] = int(r["n_nodes"])
        module_edge_count[r["cat"]] = int(r["n_edges"])
    return {
        "little_complexity": little,
        "module_complexity": module_complexity,
        "module_node_size": module_node_size,
        "module_edge_count": module_edge_count,
        "vall": vall,
    }


def _intra_explode(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    f = t.filter(pc.equal(t["acat"], t["bcat"]))
    a = f["a"].to_numpy(zero_copy_only=False)
    b = f["b"].to_numpy(zero_copy_only=False)
    w = f["w"].to_numpy(zero_copy_only=False)
    cat = f["acat"].to_pylist()
    return pa.table(
        {"cat": pa.array(cat + cat, pa.large_string()),
         "node": pa.array(np.concatenate([a, b]), pa.int64()),
         "w": pa.array(np.concatenate([w, w]), pa.float64())}
    )


def distance_complexity(
    edges: Dataset, categories: Dataset, num_buckets: int = 8
) -> dict:
    """Full result mirroring the reference's complexityResult."""
    edges = edges.materialize()
    big = distance_complexity_1d(edges)
    mod = distance_complexity_modular(edges, categories, num_buckets)
    return {"big_complexity": big, **mod}
