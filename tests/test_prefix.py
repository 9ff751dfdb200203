"""Distributed ordered prefix sum vs numpy cumsum, including sparse keys
(empty ranges) and skewed values."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from graph_computing_go_ray.engine.prefix import ordered_prefix_sum


def _check(keys, vals, num_ranges=8):
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(5)
    out = ordered_prefix_sum(ds, "k", "v", out="p", num_ranges=num_ranges)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    order = np.argsort(keys)
    expect = np.concatenate([[0], np.cumsum(np.asarray(vals)[order])[:-1]])
    assert df["k"].tolist() == sorted(keys)
    assert df["p"].tolist() == expect.tolist()


def test_prefix_dense_keys():
    rng = np.random.RandomState(3)
    n = 10_000
    _check(list(range(n)), rng.randint(0, 500, n).tolist())


def test_prefix_sparse_keys_empty_ranges():
    # keys clustered at the far end: most ranges are empty
    keys = [0, 1, 99_990, 99_991, 99_995, 99_999]
    vals = [5, 7, 11, 13, 17, 19]
    _check(keys, vals, num_ranges=16)


def test_prefix_skewed_values():
    keys = list(range(1000))
    vals = [10**6 if k < 3 else 1 for k in keys]  # hot head
    _check(keys, vals, num_ranges=4)
