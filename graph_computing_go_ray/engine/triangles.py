"""[north-rule] Triangle counting by degree-ordered edge orientation.

Classic compact-forward scheme: orient every undirected edge from the
endpoint with smaller (degree, id) to the larger; every triangle is counted
exactly once as a wedge (a→b, a→c) closed by the oriented edge b→c.
Orientation bounds out-degree by O(sqrt(m)), so wedge generation is
polynomial-safe even with heavy-hitter vertices (the orientation IS the
skew handling; SURVEY §2.10).

Ray shape: distinct-edge dedup (groupby) → degree table (groupby) → two
bucketed joins to attach endpoint degrees → per-src wedge generation
(map_groups) → bucketed semi-join count against the oriented edge set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.hashing import splitmix64
from .join import bucket_join


def undirected_distinct(edges: Dataset) -> Dataset:
    """Canonical (u=min, v=max) distinct edge set; self-loops dropped."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()  # block-level combiner
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("u", pa.int64()), ("v", pa.int64())])
        )

    c = edges.map_batches(canon, batch_format="pyarrow")
    from .degrees import distinct_pairs

    return distinct_pairs(c, ["u", "v"])


def _degrees(und: Dataset) -> Dataset:
    def partial(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [t["u"].to_numpy(zero_copy_only=False), t["v"].to_numpy(zero_copy_only=False)]
        )
        vals, cnts = np.unique(ids, return_counts=True)
        return pa.table({"id": vals.astype(np.int64), "deg": cnts.astype(np.int64)})

    p = und.map_batches(partial, batch_format="pyarrow")
    from .join import bucket_grouped_sum

    return bucket_grouped_sum(p, ["id"], ["deg"])


def triangle_count(
    edges: Dataset, num_buckets: int | None = None,
    broadcast_max_edges: int = 20_000_000,
) -> int:
    if num_buckets is None:
        from .join import default_num_buckets

        num_buckets = default_num_buckets()
    und = undirected_distinct(edges).materialize()
    deg = _degrees(und).materialize()

    with_u = bucket_join(
        und, deg.rename_columns({"id": "uid", "deg": "udeg"}),
        on="u", right_on="uid", how="inner", num_buckets=num_buckets,
    )
    with_uv = bucket_join(
        with_u, deg.rename_columns({"id": "vid", "deg": "vdeg"}),
        on="v", right_on="vid", how="inner", num_buckets=num_buckets,
    )

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ud = t["udeg"].to_numpy(zero_copy_only=False)
        vd = t["vdeg"].to_numpy(zero_copy_only=False)
        u_first = (ud < vd) | ((ud == vd) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        ddeg = np.where(u_first, vd, ud)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
             "ddeg": pa.array(ddeg, pa.int64())}
        )

    oriented = with_uv.map_batches(orient, batch_format="pyarrow").materialize()

    # wedge generation: bucket by src, one vectorized task per bucket
    # (numpy allpairs kernel — no per-group Python over |V| groups)
    from ..functions.pairs import allpairs_by_group
    from .join import add_bucket

    # Fast path: when the ORIENTED DISTINCT edge set is broadcastable
    # (<= ~160 MB packed) and ids fit 32 bits, wedge tasks close their own
    # wedges against a ray.put sorted (src<<32|dst) array and emit only a
    # COUNT — the w>=m wedge set never materializes or shuffles (a dense
    # graph makes ~35x more wedges than edges). Beyond the threshold the
    # bucketed semi-join below handles web-scale edge sets.
    n_edges = oriented.count()
    max_id = int(deg.max("id"))
    if n_edges <= broadcast_max_edges and max_id < 2**31:
        import ray

        def pack(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"e": pa.array((s << np.uint64(32)) | d, pa.uint64())})

        packed = np.sort(
            oriented.map_batches(pack, batch_format="pyarrow")
            .to_pandas()["e"].to_numpy()
        )
        edge_ref = ray.put(packed)

        def count_wedges(g: pd.DataFrame) -> pd.DataFrame:
            es = ray.get(edge_ref)
            df = g.sort_values(["src", "ddeg", "dst"])
            a, b = allpairs_by_group(df["src"].to_numpy(), df["dst"].to_numpy())
            if len(a) == 0 or len(es) == 0:
                return pd.DataFrame({"n": [0]})
            w = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
            idx = np.searchsorted(es, w).clip(max=len(es) - 1)
            return pd.DataFrame({"n": [int((es[idx] == w).sum())]})

        counts = add_bucket(oriented, "src", num_buckets, out_col="wbucket").repartition(
            max(16, min(128, num_buckets))
        ).groupby("wbucket").map_groups(count_wedges, batch_format="pandas")
        return int(counts.to_pandas()["n"].sum())

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["src", "ddeg", "dst"])  # neighbor order = orientation order
        a, b = allpairs_by_group(df["src"].to_numpy(), df["dst"].to_numpy())
        return pd.DataFrame({"src": a, "dst": b})

    # coalesce before the sort-based groupby: Ray's groupby degrades badly
    # on many tiny blocks (same fix as engine/join.bucket_grouped)
    cand = add_bucket(oriented, "src", num_buckets, out_col="wbucket").repartition(
        max(16, min(128, num_buckets))
    ).groupby("wbucket").map_groups(wedges, batch_format="pandas")
    cand = cand.map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        ),
        batch_format="pandas",
    )

    # bucketed semi-join count: candidates ∩ oriented edges on (src, dst)
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"src": t["src"].combine_chunks() if hasattr(t["src"], "combine_chunks") else t["src"],
                 "dst": t["dst"],
                 "bucket": pa.array(
                     (splitmix64(s.astype(np.int64).view(np.uint64))
                      % np.uint64(num_buckets)).astype(np.int64)),
                 "side": pa.array(np.full(t.num_rows, side, dtype=np.int8))}
            )

        return fn

    both = oriented.select_columns(["src", "dst"]).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(cand.map_batches(tag(1), batch_format="pyarrow")).repartition(
        max(16, min(128, num_buckets))
    )

    def count_matches(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0][["src", "dst"]]
        c = g[g["side"] == 1][["src", "dst"]]
        if len(e) == 0 or len(c) == 0:
            return pd.DataFrame({"n": [0]})
        m = c.merge(e.drop_duplicates(), on=["src", "dst"], how="inner")
        return pd.DataFrame({"n": [len(m)]})

    counts = both.groupby("bucket").map_groups(count_matches, batch_format="pandas")
    return int(counts.to_pandas()["n"].sum())
