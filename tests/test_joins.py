"""Boundary semantics of the custom join operators (as-of, interval) on
tiny synthetic frames — the oracle-backed queries cover them end-to-end;
these pin the edge cases (exact-boundary ts, duplicate ts, missing keys)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graph_computing_go_ray.engine.join import bucket_asof_join, bucket_interval_join


def _ts(s):
    return pd.Timestamp(s).to_datetime64()


def test_interval_join_boundaries():
    # key 1: points at t=10s,20s,30s (+ a duplicate at 20s); key 2: one point
    pts = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "pid": [10, 20, 21, 30, 99],
        "ts": pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:00:20",
                              "2024-01-01 00:00:20", "2024-01-01 00:00:30",
                              "2024-01-01 00:00:10"]),
    })
    iv = pd.DataFrame({
        "k2": [1, 1, 1, 3],
        "iid": [100, 101, 102, 103],
        "start": pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:00:20",
                                 "2024-01-01 00:00:00", "2024-01-01 00:00:00"]),
        "end": pd.to_datetime(["2024-01-01 00:00:20", "2024-01-01 00:00:25",
                               "2024-01-01 00:00:09", "2024-01-01 00:01:00"]),
    })
    out = bucket_interval_join(
        rd.from_pandas(pts), rd.from_pandas(iv),
        on="k", right_on="k2", point_ts="ts",
        start_col="start", end_col="end", num_buckets=4,
    ).to_pandas()
    got = sorted(zip(out["iid"], out["pid"]))
    # iid=100 (10s,20s]: start exclusive -> pid 10 out; both 20s dups in
    # iid=101 (20s,25s]: 20s excluded (start), nothing else <= 25s
    # iid=102 (0s,9s]: nothing (end-inclusive boundary below first point)
    # iid=103: key 3 has no points
    assert got == [(100, 20), (100, 21)]


def test_asof_join_backward_and_ties():
    left = pd.DataFrame({
        "k": [1, 1, 2, 3],
        "lid": [1, 2, 3, 4],
        "lts": pd.to_datetime(["2024-01-05", "2024-01-01", "2024-01-05",
                               "2024-01-05"]),
    })
    right = pd.DataFrame({
        "k2": [1, 1, 1, 2],
        "rid": [10, 11, 12, 20],
        "rts": pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-03",
                               "2024-01-06"]),
    })
    out = bucket_asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="k2", left_ts="lts", right_ts="rts", num_buckets=4,
    ).to_pandas()
    m = dict(zip(out["lid"], out["rid"]))
    # lid=1: latest rts<=Jan5 is Jan3; tie (rid 11,12) -> max rid wins
    assert m.get(1) == 12
    # lid=2: no right row <= Jan1 -> dropped (inner)
    assert 2 not in m
    # lid=3: right row is AFTER left ts -> dropped
    assert 3 not in m
    # lid=4: key 3 missing on right -> dropped
    assert 4 not in m
    assert out["rid"].dtype == np.int64 or str(out["rid"].dtype) == "int64"


def test_rename_cols_on_typed_seed_union():
    """Dataset.rename_columns silently no-ops when the lazy plan reports an
    empty schema (typed_seed union of a grouped-join output) — rename_cols
    must still rename, and bucket_join must survive an empty-schema side."""
    import pyarrow as pa

    from graph_computing_go_ray.engine.join import (bucket_join, rename_cols,
                                                    typed_seed)

    srcs = rd.from_arrow(pa.table({"id": pa.array([1, 2, 3], pa.int64())}))
    dsts = rd.from_arrow(pa.table({"id": pa.array([2, 3, 4], pa.int64())}))
    both = bucket_join(srcs, rename_cols(dsts, {"id": "did"}),
                       on="id", right_on="did", how="inner", num_buckets=4)
    both = typed_seed(both, pa.schema([("id", pa.int64())]))
    left = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 4], pa.int64()),
    }))
    out = bucket_join(left, rename_cols(both, {"id": "kid"}),
                      on="src", right_on="kid", how="inner",
                      num_buckets=4).to_pandas()
    assert sorted(out["src"].tolist()) == [2, 3]


def test_adaptive_map_join_strategy_equivalence():
    """Both adaptive_map_join strategies (broadcast attach vs bucketed
    hash join) must return the same inner-join result, columns and all."""
    import numpy as np
    import pyarrow as pa

    from graph_computing_go_ray.engine.join import adaptive_map_join

    rng = np.random.RandomState(5)
    facts = rd.from_arrow(pa.table({
        "k": pa.array(rng.randint(0, 50, size=500), pa.int64()),
        "x": pa.array(np.arange(500), pa.int64()),
    }))
    dim = rd.from_arrow(pa.table({
        "kk": pa.array(np.arange(0, 40, dtype=np.int64)),  # keys 40..49 miss
        "name": pa.array([f"n{i}" for i in range(40)], pa.string()),
    }))
    wide = adaptive_map_join(facts, dim, on="k", key_col="kk",
                             val_cols=["name"], broadcast_limit=1_000_000,
                             num_buckets=4).to_pandas()
    narrow = adaptive_map_join(facts, dim, on="k", key_col="kk",
                               val_cols=["name"], broadcast_limit=0,
                               num_buckets=4).to_pandas()
    assert list(wide.columns) == list(narrow.columns) == ["k", "x", "name"]
    a = wide.sort_values(["k", "x"], ignore_index=True)
    b = narrow.sort_values(["k", "x"], ignore_index=True)
    assert a.equals(b)
    assert (a["k"] < 40).all() and len(a) > 0


def test_read_bucket_uri_and_missing_dir(tmp_path):
    """VERDICT r4 #1: the bucket lookup layer must be URI-capable — a
    file:// dir reads the same rows as its plain-path twin, and a missing
    bucket_dir raises instead of silently returning an empty lookup side
    (the multi-node failure mode of the old os.path.isdir gate)."""
    import pyarrow as pa

    from graph_computing_go_ray.engine.join import read_bucket, write_bucketed

    ds = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "v": pa.array(np.arange(100, dtype=np.int64) * 2),
    }))
    plain = str(tmp_path / "bk")
    write_bucketed(ds, "k", 4, plain)

    got_rows = 0
    for b in range(4):
        t_plain = read_bucket(plain, b)
        t_uri = read_bucket("file://" + plain, b)
        assert (t_plain is None) == (t_uri is None)
        if t_plain is not None:
            assert t_uri.sort_by("k").equals(
                t_plain.select(t_uri.column_names).sort_by("k"))
            got_rows += t_plain.num_rows
    assert got_rows == 100

    with pytest.raises(FileNotFoundError):
        read_bucket(str(tmp_path / "nope"), 0)
    with pytest.raises(FileNotFoundError):
        read_bucket("file://" + str(tmp_path / "nope"), 0)


def test_write_parquet_safe_uri_empty(tmp_path):
    """write_parquet_safe's empty-dataset fallback must work through the fs
    layer on a URI path (it used to gate on os.path.isdir)."""
    import pyarrow as pa

    from graph_computing_go_ray.engine.join import write_parquet_safe

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.string())}))
    out = "file://" + str(tmp_path / "empty_out")
    write_parquet_safe(empty.filter(expr="a > 0"), out, schema)
    back = rd.read_parquet(out)
    assert back.count() == 0
    assert back.schema().names == ["a", "b"]
