"""A9: Google distance (NGD) between core vertices.

Reference: /root/reference/internal/wikipediaGoogleDistance/
wikipediaGoogleDistance.go:91-141 (formula :129):

    d(a,b) = (log2(max(|Na|,|Nb|)) - log2(|Na ∩ Nb|))
           / (log2(total) - log2(min(|Na|,|Nb|)))

over DISTINCT in-neighbor sets Na restricted to core vertices; pairs with
empty intersection are skipped (never materialized — the pairwise
intersection is a self-join on the shared in-neighbor, not an O(n²) loop).

Ray shape: distinct(src,dst) filtered to core dst → sizes groupby(dst) →
src-bucketed vectorized pair generation (the wedge kernel) →
groupby(a,b).count = |∩| → two bucketed joins for sizes → vectorized
formula. Shuffle keys: src then (a,b)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..functions.pairs import allpairs_by_group
from .join import add_bucket, bucket_join, rename


def google_distance(
    edges: Dataset,
    core_ids: np.ndarray,
    total_count: int,
    num_buckets: int | None = None,
) -> Dataset:
    """edges (src, dst); core_ids: sorted int64 array (broadcast);
    returns (a, b, distance) with a < b."""
    if num_buckets is None:
        from .join import default_num_buckets

        num_buckets = default_num_buckets()
    core_sorted = np.sort(np.asarray(core_ids, dtype=np.int64))
    core_ref = ray.put(core_sorted)

    def core_filter(t: pa.Table) -> pa.Table:
        ks = ray.get(core_ref)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            mask = np.zeros(len(dst), dtype=bool)
        else:
            idx = np.searchsorted(ks, dst)
            idx[idx >= len(ks)] = len(ks) - 1
            mask = ks[idx] == dst
        df = pd.DataFrame(
            {"src": t["src"].to_numpy(zero_copy_only=False)[mask],
             "dst": dst[mask]}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        )

    filt = edges.map_batches(core_filter, batch_format="pyarrow")
    # distinct (src,dst): in-neighbor SETS, parallel edges dropped (D6)
    from .degrees import distinct_pairs

    distinct = distinct_pairs(filt, ["src", "dst"]).materialize()

    from .join import bucket_grouped_count

    sizes = bucket_grouped_count(distinct, ["dst"], "n")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["src", "dst"])
        a, b = allpairs_by_group(df["src"].to_numpy(), df["dst"].to_numpy())
        return pd.DataFrame({"a": a, "b": b})

    cand = add_bucket(distinct, "src", num_buckets).groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    ).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("a", pa.int64()), ("b", pa.int64())])
        ),
        batch_format="pandas",
    )
    from .join import bucket_grouped_count as _bgc
    from .join import typed_seed

    inter = typed_seed(
        _bgc(cand, ["a", "b"], "i"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("i", pa.int64())]),
    )

    j1 = bucket_join(inter, rename(sizes, {"dst": "ad", "n": "na"}),
                     on="a", right_on="ad", how="inner", num_buckets=num_buckets)
    j2 = bucket_join(j1, rename(sizes, {"dst": "bd", "n": "nb"}),
                     on="b", right_on="bd", how="inner", num_buckets=num_buckets)

    def formula(t: pa.Table) -> pa.Table:
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        vmax = np.maximum(na, nb)
        vmin = np.minimum(na, nb)
        d = (np.log2(vmax) - np.log2(i)) / (np.log2(float(total_count)) - np.log2(vmin))
        return pa.table(
            {"a": t["a"], "b": t["b"], "distance": pa.array(d, pa.float64())}
        )

    return j2.map_batches(formula, batch_format="pyarrow")
