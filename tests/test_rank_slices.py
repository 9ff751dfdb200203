"""percent_slice with start>0 (boundary-predicate path) vs the pandas
rank oracle, including tie-heavy degree distributions."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graph_computing_go_ray.engine.rank import percent_slice


def _oracle(df, start, end):
    d = df.sort_values(["deg", "id"], ascending=[False, True],
                       ignore_index=True)
    n = len(d)
    return d.iloc[int(math.ceil(n * start / 100)):int(math.ceil(n * end / 100))]


def test_percent_slice_general_matches_oracle():
    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "id": np.arange(500, dtype=np.int64),
        "deg": rng.randint(0, 12, size=500).astype(np.int64),  # heavy ties
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    for start, end in ((20, 80), (1, 99), (50, 100), (0, 30)):
        got = percent_slice(ds, "deg", "id", start, end).to_pandas()
        want = _oracle(df, start, end)
        assert got["id"].tolist() == want["id"].tolist(), (start, end)

    # empty slice: schema survives at the Dataset level (Ray's to_pandas
    # drops columns on any 0-row dataset, so assert on the schema itself)
    empty = percent_slice(ds, "deg", "id", 40, 40)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"id", "deg"}
