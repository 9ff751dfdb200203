"""Bloom semi-join: no false negatives ever; fp rate near target; exact
when composed with a follow-up exact membership check."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from graph_computing_go_ray.engine.bloom import (bloom_contains,
                                                 bloom_semi_join, build_bloom)


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.RandomState(7)
    members = np.unique(rng.randint(0, 1 << 40, size=20_000).astype(np.int64))
    keys = rd.from_arrow(pa.table({"k": pa.array(members, pa.int64())}))
    bloom = build_bloom(keys, "k", fpp=0.01)

    # every member passes
    assert bloom_contains(bloom, pa.chunked_array([pa.array(members)])).all()

    # non-members pass at ~fpp (generous 3x bound for sampling noise)
    non = np.setdiff1d(
        rng.randint(0, 1 << 40, size=50_000).astype(np.int64), members
    )
    fp = bloom_contains(bloom, pa.chunked_array([pa.array(non)])).mean()
    assert fp < 0.03, fp


def test_bloom_semi_join_superset_and_exact_compose():
    n = 30_000
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.arange(n) % 97, pa.int64()),
    })).repartition(8)
    member_ids = np.arange(0, n, 7, dtype=np.int64)  # every 7th row
    keys = rd.from_arrow(pa.table({"kid": pa.array(member_ids)}))

    out = bloom_semi_join(ds, keys, on="id", key_col="kid", fpp=0.005)
    got = out.to_pandas()["id"].to_numpy()

    # superset of the true members, no false negatives
    assert np.isin(member_ids, got).all()
    # over-approximation is small
    extra = np.setdiff1d(got, member_ids)
    assert len(extra) <= 0.02 * n, len(extra)

    # exact compose: verify survivors against the true set (here with a
    # local check standing in for the exact bucketed join on survivors)
    exact = got[np.isin(got, member_ids)]
    assert sorted(exact.tolist()) == member_ids.tolist()


def test_bloom_string_keys():
    words = [f"tok-{i}" for i in range(5_000)]
    keys = rd.from_arrow(pa.table({"w": pa.array(words, pa.large_string())}))
    bloom = build_bloom(keys, "w", fpp=0.01)
    assert bloom_contains(
        bloom, pa.chunked_array([pa.array(words, pa.large_string())])
    ).all()
    other = pa.array([f"zzz-{i}" for i in range(20_000)], pa.large_string())
    fp = bloom_contains(bloom, pa.chunked_array([other])).mean()
    assert fp < 0.03, fp


def test_exact_semi_join_both_strategies_agree():
    """exact_semi_join must give IDENTICAL results on the broadcast path
    and the Bloom+bucketed-join path (VERDICT r2 #7)."""
    from graph_computing_go_ray.engine.bloom import exact_semi_join

    rng = np.random.RandomState(11)
    n = 20_000
    ds = rd.from_arrow(pa.table({
        "k": pa.array(rng.randint(0, 5_000, size=n).astype(np.int64)),
        "v": pa.array(np.arange(n), pa.int64()),
    })).repartition(6)
    member = np.unique(rng.randint(0, 5_000, size=1_200).astype(np.int64))
    keys = rd.from_arrow(pa.table({"id": pa.array(member, pa.int64())}))

    def run(limit):
        out = exact_semi_join(ds, keys, on="k", key_col="id",
                              broadcast_limit=limit).to_pandas()
        return out.sort_values(["k", "v"], ignore_index=True)[["k", "v"]]

    bcast = run(10 ** 9)   # broadcast path
    fact = run(0)          # forced Bloom + bucketed-join path
    assert bcast.equals(fact)
    # and both equal the ground truth
    truth = ds.to_pandas()
    truth = truth[truth["k"].isin(member)].sort_values(
        ["k", "v"], ignore_index=True)[["k", "v"]]
    assert bcast.equals(truth)


def test_exact_semi_join_string_keys():
    from graph_computing_go_ray.engine.bloom import exact_semi_join

    ds = rd.from_arrow(pa.table({
        "s": pa.array([f"u{i % 50}" for i in range(2_000)], pa.large_string()),
        "v": pa.array(np.arange(2_000), pa.int64()),
    })).repartition(4)
    member = [f"u{i}" for i in range(0, 50, 3)]
    keys = rd.from_arrow(pa.table({"id": pa.array(member, pa.large_string())}))
    for limit in (10 ** 9, 0):
        out = exact_semi_join(ds, keys, on="s", key_col="id",
                              broadcast_limit=limit).to_pandas()
        assert set(out["s"]) == set(member)
        assert len(out) == 2_000 // 50 * len(member)
