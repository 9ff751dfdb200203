"""A6: multilayer ("KQI") structural entropy over a category-partitioned
directed graph.

Reference: /root/reference/internal/entropy/entropy.go:100-164 with the
cleanGraph vertex-clone rewrite (entropy.go:46-92): a node with k categories
becomes k vertices (clones copy the node's out-list, and every in-edge to
the original is replicated to each clone). Expressed relationally, the
expanded edge set is

    edges ⋈ expand(src) ⋈ expand(dst)

where expand maps a vertex id to one expanded vertex per category — a pure
join/explode, O(1) per extra category (SURVEY §7 step 5).

Results (golden tests internal/entropy/entropy_test.go:9-32):
- big_degree_entropy  = in-degree structural entropy of the whole expanded
  graph (graph built from edges; vertices without edges don't exist);
- little_structural_entropy = Σ_j [H_j·vol_j/m − log2(vol_j/m)·g_j/m]
  over modules j with vol_j>0, where vol_j = intra-module edge count,
  g_j = out-edges from module j to other modules, m = total edge count,
  H_j = in-degree structural entropy of module j's subgraph.

Clone ids are negative (splitmix of (id, cat index)) so they can never
collide with the engine's positive url-hash ids; entropy values don't
depend on id values. Everything is groupby aggregates; only ≤ #modules
rows reach the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..functions.hashing import splitmix64
from .join import bucket_join


def expand_vertices(vertices: Dataset) -> Dataset:
    """vertices(id, cats: list<string>) → (orig_id, xid, cat); first category
    keeps the original id, extra categories get negative clone ids."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        cats = t["cats"].to_pylist()
        orig, xid, cat = [], [], []
        for i, cs in zip(ids, cats):
            for k, c in enumerate(cs):
                orig.append(i)
                if k == 0:
                    xid.append(i)
                else:
                    h = splitmix64(np.array([i], dtype=np.int64).view(np.uint64) ^ np.uint64(k))
                    xid.append(-int(h[0] & np.uint64(0x7FFFFFFFFFFFFFFF)) - 1)
                cat.append(c)
        return pa.table(
            {"orig_id": pa.array(orig, pa.int64()), "xid": pa.array(xid, pa.int64()),
             "cat": pa.array(cat, pa.large_string())}
        )

    return vertices.map_batches(fn, batch_format="pyarrow")


def expanded_edges(
    edges: Dataset, expand: Dataset, num_buckets: int = 8
) -> Dataset:
    """(src_x, dst_x, src_cat, dst_cat) for every expanded edge; edges whose
    dst is outside the vertex set are dropped by the inner join (the
    cleanGraph shrink, entropy.go:68-90)."""
    e1 = bucket_join(
        edges.select_columns(["src", "dst"]),
        expand.rename_columns({"orig_id": "s_orig", "xid": "src_x", "cat": "src_cat"}),
        on="src", right_on="s_orig", how="inner", num_buckets=num_buckets,
    )
    e2 = bucket_join(
        e1, expand.rename_columns({"orig_id": "d_orig", "xid": "dst_x", "cat": "dst_cat"}),
        on="dst", right_on="d_orig", how="inner", num_buckets=num_buckets,
    )
    return e2.select_columns(["src_x", "dst_x", "src_cat", "dst_cat"])


def _in_struct_entropy_from_counts(s: float, s1: float) -> float:
    if s <= 0:
        return 0.0
    return math.log2(s) - s1 / s


def multilayer_entropy(
    vertices: Dataset, edges: Dataset, num_buckets: int = 8
) -> dict:
    """Returns {big_degree_entropy, little_structural_entropy, m, modules}."""
    expand = expand_vertices(vertices).materialize()
    xe = expanded_edges(edges, expand, num_buckets).materialize()

    m = xe.count()

    # per-module intra/outgoing edge counts (vol_j, g_j)
    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        intra = pc.equal(t["src_cat"], t["dst_cat"])
        return pa.table(
            {"cat": t["src_cat"],
             "intra": pc.cast(intra, pa.int64()),
             "outgoing": pc.cast(pc.invert(intra), pa.int64())}
        )

    volg = (
        xe.map_batches(tag, batch_format="pyarrow")
        .groupby("cat")
        .aggregate(Sum("intra", alias_name="vol"), Sum("outgoing", alias_name="g"))
        .to_pandas()
    )

    # in-degrees of module subgraphs: (cat, dst_x) counts over intra edges
    def intra_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.equal(t["src_cat"], t["dst_cat"]))
        return pa.table({"cat": f["src_cat"], "dst_x": f["dst_x"]})

    mod_deg = (
        xe.map_batches(intra_only, batch_format="pyarrow")
        .groupby(["cat", "dst_x"]).aggregate(Count(alias_name="deg"))
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame(
            {"cat": t["cat"].to_pylist(), "s": deg, "s1": deg * np.log2(deg)}
        )
        g = df.groupby("cat", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    mod_sums = (
        mod_deg.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("cat").aggregate(Sum("s", alias_name="s"), Sum("s1", alias_name="s1"))
        .to_pandas()
    )

    # top graph in-degree entropy over ALL expanded edges
    top_deg = xe.groupby("dst_x").aggregate(Count(alias_name="deg"))

    def top_partial(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"s": [float(deg.sum())], "s1": [float((deg * np.log2(deg)).sum())]}
        )

    tops = top_deg.map_batches(top_partial, batch_format="pyarrow").sum(["s", "s1"])
    if not tops or tops.get("sum(s)") is None:  # empty expanded graph
        tops = {"sum(s)": 0.0, "sum(s1)": 0.0}
    big = _in_struct_entropy_from_counts(tops["sum(s)"], tops["sum(s1)"])

    # sparse graphs can have zero intra-module (or zero tagged) edges; the
    # empty pandas frames then lose their columns and the merge would KeyError
    if volg.empty:
        volg = pd.DataFrame({"cat": pd.Series([], dtype=object),
                             "vol": pd.Series([], dtype=np.int64),
                             "g": pd.Series([], dtype=np.int64)})
    if mod_sums.empty:
        mod_sums = pd.DataFrame({"cat": pd.Series([], dtype=object),
                                 "s": pd.Series([], dtype=np.float64),
                                 "s1": pd.Series([], dtype=np.float64)})
    mods = volg.merge(mod_sums, on="cat", how="left").fillna(0.0)
    little = 0.0
    module_rows = []
    for _, r in mods.iterrows():
        vol, g = float(r["vol"]), float(r["g"])
        if vol == 0 or m == 0:
            continue
        h_j = _in_struct_entropy_from_counts(float(r["s"]), float(r["s1"]))
        term = h_j * vol / m - math.log2(vol / m) * g / m
        little += term
        module_rows.append(
            {"cat": r["cat"], "vol": vol, "g": g, "h_in": h_j, "term": term}
        )
    return {
        "big_degree_entropy": big,
        "little_structural_entropy": little,
        "m": m,
        "modules": module_rows,
    }
