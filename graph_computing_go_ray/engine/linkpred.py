"""Link-prediction feature kernels over an undirected edge table:
Adamic-Adar scores for EXISTING edges (the standard "how redundant is this
link" signal used to rank intra-community edges).

AA(u,v) = sum over common neighbors w of 1/log2(deg(w)).

Ray shape (mirrors engine/triangles.py): distinct undirected edges →
per-center neighbor groups → wedge pairs (a,b) among the neighbors, each
carrying weight 1/log2(deg_center) where deg_center == the group size (no
join needed: neighbor lists are distinct) → closed against the actual edge
set → bucketed sum per (u,v).

Scale: a wedge (a,b) centered at w survives only when (a,b) is itself an
edge — i.e. only triangles contribute (3 wedge instances per triangle), so
the broadcast fast path ships nothing wedge-scale; the tagged-union
fallback (edge sets too big to broadcast) shuffles the raw wedges like
triangle_count's general path. Wedge volume per center is C(deg,2), bounded
the same way as the reference-era co-occurrence stage — centers are
hash-bucketed so heavy vertices parallelize across the allpairs kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import splitmix64
from ..functions.pairs import allpairs_with_group
from .triangles import undirected_distinct

ROUND = 6


def adamic_adar_edges(
    edges: Dataset,
    num_buckets: int | None = None,
    broadcast_max_edges: int = 20_000_000,
) -> Dataset:
    """(u, v, aa round 6) for every existing edge with >= 1 common
    neighbor."""
    if num_buckets is None:
        from .join import default_num_buckets

        num_buckets = default_num_buckets()

    und = undirected_distinct(edges).materialize()

    # both orientations: rows (center, nbr) — group by center = adjacency
    def both(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"center": pa.array(np.concatenate([u, v]), pa.int64()),
             "nbr": pa.array(np.concatenate([v, u]), pa.int64())}
        )

    from .join import add_bucket

    adj = add_bucket(
        und.map_batches(both, batch_format="pyarrow"), "center", num_buckets
    ).repartition(max(16, min(128, num_buckets)))

    n_edges = und.count()
    max_id = int(und.max("v"))
    use_broadcast = n_edges <= broadcast_max_edges and max_id < 2**31

    edge_ref = None
    if use_broadcast:
        import ray

        def pack(t: pa.Table) -> pa.Table:
            a = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"e": pa.array((a << np.uint64(32)) | b, pa.uint64())})

        packed = np.sort(
            und.map_batches(pack, batch_format="pyarrow").to_pandas()["e"].to_numpy()
        )
        edge_ref = ray.put(packed)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # neighbors sorted within center → emitted pairs are canonical a<b
        df = g.sort_values(["center", "nbr"])
        a, b, gsize, _ = allpairs_with_group(
            df["center"].to_numpy(), df["nbr"].to_numpy()
        )
        if not len(a):
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "v": np.array([], np.int64),
                                 "w8": np.array([], np.float64)})
        w8 = 1.0 / np.log2(gsize.astype(np.float64))
        if edge_ref is not None:
            import ray

            es = ray.get(edge_ref)
            key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
            idx = np.searchsorted(es, key).clip(max=max(len(es) - 1, 0))
            hit = es[idx] == key if len(es) else np.zeros(len(key), bool)
            a, b, w8 = a[hit], b[hit], w8[hit]
        # block-level combiner: same (u,v) from many centers partial-sums here
        out = (pd.DataFrame({"u": a, "v": b, "w8": w8})
               .groupby(["u", "v"], as_index=False)["w8"].sum())
        return out

    cand = adj.groupby("bucket").map_groups(wedges, batch_format="pandas")
    cand = cand.map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("u", pa.int64()), ("v", pa.int64()), ("w8", pa.float64())])
        ),
        batch_format="pandas",
    )

    if edge_ref is None:
        # tagged-union semi-join against the edge set (web-scale path)
        def tag(side: int):
            def fn(t: pa.Table) -> pa.Table:
                u = t["u"].to_numpy(zero_copy_only=False)
                cols = {
                    "u": t["u"], "v": t["v"],
                    "w8": (t["w8"] if "w8" in t.schema.names
                           else pa.array(np.zeros(t.num_rows), pa.float64())),
                    "bucket": pa.array(
                        (splitmix64(u.astype(np.int64).view(np.uint64))
                         % np.uint64(num_buckets)).astype(np.int64)),
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                }
                return pa.table(cols)

            return fn

        both_t = und.map_batches(tag(0), batch_format="pyarrow").union(
            cand.map_batches(tag(1), batch_format="pyarrow")
        ).repartition(max(16, min(128, num_buckets)))

        def close(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["side"] == 0][["u", "v"]].drop_duplicates()
            c = g[g["side"] == 1][["u", "v", "w8"]]
            if not len(e) or not len(c):
                return pd.DataFrame({"u": np.array([], np.int64),
                                     "v": np.array([], np.int64),
                                     "w8": np.array([], np.float64)})
            m = c.merge(e, on=["u", "v"], how="inner")
            return m.groupby(["u", "v"], as_index=False)["w8"].sum()

        cand = both_t.groupby("bucket").map_groups(close, batch_format="pandas")
        cand = cand.map_batches(
            lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
                pa.schema([("u", pa.int64()), ("v", pa.int64()),
                           ("w8", pa.float64())])
            ),
            batch_format="pandas",
        )

    # final combine across wedge buckets + rounding
    from .join import bucket_grouped

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], as_index=False)["w8"].sum()
        out["aa"] = np.round(out["w8"].to_numpy(np.float64), ROUND)
        return out[["u", "v", "aa"]]

    return bucket_grouped(
        cand, ["u", "v"], total,
        out_schema=pa.schema([("u", pa.int64()), ("v", pa.int64()),
                              ("aa", pa.float64())]),
        num_buckets=num_buckets,
    )
