"""Distributed ordered prefix sum over a dense integer key.

The primitive behind training-sequence packing: every document needs its
GLOBAL token offset (sum of token counts of all documents ordered before
it) so the corpus can be cut into fixed-length training sequences — and a
naive implementation is a full global sort plus a sequential scan, which
is exactly what doesn't scale.

Two-pass range decomposition instead (the classic parallel scan):
  1. bucket rows by key range (dense keys → range id is pure arithmetic,
     no sort, no sampling pass);
  2. per-range totals (one tiny row per range) cumsum on the driver into
     per-range base offsets;
  3. per-range local sort + cumsum (vectorized, each range independent)
     plus the broadcast base offset.
One cheap shuffle (the range groupby); ranges scale with the cluster; the
only driver-side state is #ranges scalars.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def ordered_prefix_sum(ds: Dataset, key: str, val: str,
                       out: str = "prefix", num_ranges: int | None = None,
                       key_max: int | None = None) -> Dataset:
    """Adds ``out`` = sum of ``val`` over all rows with smaller ``key``
    (exclusive prefix sum in key order). Keys must be unique integers;
    ``key_max`` avoids an extra pass when the caller knows the bound."""
    import ray

    from .join import default_num_buckets

    if num_ranges is None:
        num_ranges = default_num_buckets()
    if key_max is None:
        key_max = int(ds.max(key))
    width = max(1, (key_max + num_ranges) // num_ranges)

    def with_range(t: pa.Table) -> pa.Table:
        rb = t[key].to_numpy(zero_copy_only=False) // width
        return t.append_column("__rb", pa.array(rb.astype(np.int64)))

    ranged = ds.map_batches(with_range, batch_format="pyarrow").materialize()

    # pass 1: per-range totals (per-block partials; tiny frame to driver)
    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "__rb": t["__rb"].to_numpy(zero_copy_only=False),
            "v": t[val].to_numpy(zero_copy_only=False),
        }).groupby("__rb", as_index=False)["v"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    tot = (
        ranged.map_batches(totals, batch_format="pyarrow")
        .to_pandas().groupby("__rb")["v"].sum().sort_index()
    )
    base = np.zeros(num_ranges + 1, dtype=np.int64)
    for rb, v in tot.items():
        base[int(rb) + 1] = v
    base = np.cumsum(base)
    base_ref = ray.put(base)

    # pass 2: per-range local exclusive cumsum + broadcast base offset
    def local(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        g = g.sort_values(key)
        v = g[val].to_numpy()
        g[out] = np.concatenate([[0], np.cumsum(v)[:-1]]) + b[int(g["__rb"].iloc[0])]
        return g.drop(columns="__rb")

    return ranged.groupby("__rb").map_groups(local, batch_format="pandas")
