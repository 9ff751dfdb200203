"""Sub-discipline multilayer structural entropy (K11b) vs a pure-python
replica of openAlexSubDisplineStructuralEntropy.go:16-215 on the synthetic
works table."""

import collections
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from graph_computing_go_ray.pipelines.citations import (
    sub_discipline_structural_entropy,
)
from graph_computing_go_ray.sources.works_gen import generate_works


@pytest.fixture(scope="module")
def works(tmp_path_factory):
    """Dense custom fixture: the generic works_gen table has <10 in-circle
    edges per sub-discipline circle (membership² thins citations), which
    the cur_in>=2 gather filter would empty. Here ~85% of works carry 1-2
    Biology-L1 tags and cite within the pool, so shrink/gather/slice all
    bite; the rest carry Physics-L1 tags and a few rows are M7-useless."""
    import pyarrow as pa

    d = str(tmp_path_factory.mktemp("works_sub"))
    rng = np.random.RandomState(13)
    n = 260
    ids = np.arange(1, n + 1, dtype=np.int64)
    years = np.sort(rng.randint(2015, 2025, size=n)).astype(np.int32)
    tags, refs = [], []
    for i in range(n):
        if i % 7 == 3:
            tags.append([f"Physics-L1-{rng.randint(0, 4)}"])
        else:
            k = 1 + (i % 2)
            tags.append([f"Biology-L1-{t}"
                         for t in rng.choice(4, size=k, replace=False)])
        if i < 3:
            refs.append([])  # some ref-less heads
            continue
        kr = int(rng.randint(0, 7))
        tgt = {int(ids[i - 1 - (int(rng.zipf(1.4)) - 1) % i])
               for _ in range(kr)} - {int(ids[i])}
        refs.append(sorted(tgt))
    indeg = np.zeros(n + 1, dtype=np.int32)
    for r in refs:
        for t in r:
            indeg[t] += 1
    # a few M7-useless rows: no refs and never cited
    for i in range(0, n, 50):
        if indeg[ids[i]] == 0:
            refs[i] = []
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "publication_year": pa.array(years, pa.int32()),
        "referenced_works": pa.array(refs, pa.large_list(pa.int64())),
        "links_in_works": pa.array(indeg[1:], pa.int32()),
        "concepts_lv1": pa.array(tags, pa.large_list(pa.large_string())),
    })
    pq.write_table(t, f"{d}/works.parquet")
    rows = t.to_pylist()
    return d, rows


def _h_in(degs):
    s = float(sum(degs))
    if s <= 0:
        return 0.0
    s1 = float(sum(d * math.log2(d) for d in degs))
    return math.log2(s) - s1 / s


def _replica(rows, top_subject, year, end, gather=2):
    subs = [f"{top_subject}-L1-{k}" for k in range(4)]
    sset = set(subs)
    # membership (M7 useless filter + lv1 tag intersect)
    member = {}  # id -> set of cats
    by_id = {}
    for r in rows:
        if r["links_in_works"] == 0 and len(r["referenced_works"]) == 0:
            continue
        cs = set(r["concepts_lv1"]) & sset
        if not cs or r["publication_year"] > year:
            continue
        member[r["id"]] = cs
        by_id[r["id"]] = r
    # circle shrink + current in-degree
    cur = collections.Counter()
    edges = []
    for i, r in by_id.items():
        for t in r["referenced_works"]:
            if t in member:
                cur[t] += 1
                edges.append((i, t))
    keep0 = {i for i in member if cur[i] >= gather}
    # per-subject rank (-cur_in, id) + percent slice
    kept_cats = collections.defaultdict(list)  # id -> cats surviving slice
    for s in subs:
        ids = sorted((i for i in keep0 if s in member[i]),
                     key=lambda i: (-cur[i], i))
        n = len(ids)
        take = ids if end == 100 else ids[: math.ceil(n * end / 100)]
        for i in take:
            kept_cats[i].append(s)
    # expanded-graph KQI over edges within kept set
    kept = set(kept_cats)
    xdeg = collections.Counter()   # (dst, dst_cat-index irrelevant): deg per clone
    vol = collections.Counter()
    g = collections.Counter()
    mod_deg = collections.defaultdict(collections.Counter)
    m = 0
    for srcid, dstid in edges:
        if srcid not in kept or dstid not in kept:
            continue
        for sc in kept_cats[srcid]:
            for dc in kept_cats[dstid]:
                m += 1
                xdeg[(dstid, dc)] += 1
                if sc == dc:
                    vol[sc] += 1
                    mod_deg[sc][(dstid, dc)] += 1
                else:
                    g[sc] += 1
    big = _h_in(list(xdeg.values()))
    little = 0.0
    for s in subs:
        if vol[s] == 0 or m == 0:
            continue
        h_j = _h_in(list(mod_deg[s].values()))
        little += h_j * vol[s] / m - math.log2(vol[s] / m) * g[s] / m
    return {"big": big, "little": little, "m": m}


def test_sub_discipline_entropy_vs_replica(works):
    d, rows = works
    out = sub_discipline_structural_entropy(
        d, top_subject="Biology", years=(2024, 2020),
        percent_ends=(100, 40), num_buckets=2)
    assert len(out) == 4
    for _, row in out.iterrows():
        want = _replica(rows, "Biology", int(row["year"]),
                        int(row["end_percent"]))
        assert row["m"] == want["m"], (row["year"], row["end_percent"])
        assert row["big_degree_entropy"] == pytest.approx(
            want["big"], abs=1e-9)
        assert row["little_structural_entropy"] == pytest.approx(
            want["little"], abs=1e-9)


def test_sub_discipline_total_rank(works):
    d, rows = works
    out = sub_discipline_structural_entropy(
        d, top_subject="Physics", years=(2024,), percent_ends=(40,),
        rank_type="total", num_buckets=2)
    assert len(out) == 1
    assert out["rank_type"].iloc[0] == "total"
    assert out["m"].iloc[0] > 0
