"""Golden-value tests from the reference's own unit tests (FIXTURES.md F5)
plus the notebook entropy-oracle edge lists."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graph_computing_go_ray.engine.distance import distance_complexity
from graph_computing_go_ray.engine.entropy import entropy_report
from graph_computing_go_ray.engine.multilayer import multilayer_entropy


def _vertices(spec):
    return rd.from_pandas(pd.DataFrame(
        {"id": [i for i, _, _ in spec],
         "cats": [c for _, _, c in spec]}
    ))


def _edges(spec):
    rows = [(i, t) for i, outs, _ in spec for t in outs]
    return rd.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in rows], "dst": [b for _, b in rows]}
    ))


# internal/entropy/entropy_test.go:9-19
SPEC_V1 = [
    (1, [2, 3], ["a"]), (2, [3, 4, 5], ["a"]), (3, [4, 6], ["a"]),
    (4, [1, 6], ["b"]), (5, [4, 6], ["b"]), (6, [1, 2, 4], ["b"]),
]
# entropy_test.go:21-32 — node 3 is interdisciplinary
SPEC_V2 = [
    (1, [2, 3], ["a"]), (2, [3, 4, 5], ["a"]), (3, [4, 6], ["a", "b"]),
    (4, [1, 6], ["b"]), (5, [4, 6], ["b"]), (6, [1, 2, 4], ["b"]),
]


def test_multilayer_entropy_v1():
    res = multilayer_entropy(_vertices(SPEC_V1), _edges(SPEC_V1), num_buckets=2)
    assert res["little_structural_entropy"] == pytest.approx(1.504751568, abs=1e-9)


def test_multilayer_entropy_v2():
    res = multilayer_entropy(_vertices(SPEC_V2), _edges(SPEC_V2), num_buckets=2)
    assert res["little_structural_entropy"] == pytest.approx(1.612197223, abs=1e-9)
    assert res["big_degree_entropy"] == pytest.approx(2.636056086, abs=1e-9)


# internal/distanceComplexity/distanceComplexity_test.go:18-92
D_V1 = ([(1, 2, 1.0), (1, 3, 2.0), (1, 4, 3.0), (2, 3, 1.0), (2, 4, 2.0),
         (3, 4, 3.0)],
        {1: "a", 2: "a", 3: "b", 4: "b"}, 1.861654167, 1.4999999999999998)
D_V3 = ([(1, 2, 1.0), (1, 3, 2.0), (1, 4, 3.0), (2, 3, 1.0), (2, 4, 2.0),
         (3, 4, 3.0), (4, 5, 4.0)],
        {1: "a", 2: "a", 3: "b", 4: "b", 5: "b"},
        1.513679924, 1.4693609377704333)
D_V2 = ([(1, 2, 1.0), (1, 3, 2.0), (1, 4, 3.0), (1, 5, 2.0), (1, 6, 2.0),
         (2, 3, 1.0), (2, 4, 2.0), (2, 5, 1.0), (2, 6, 1.0), (3, 4, 1.0),
         (3, 5, 2.0), (3, 6, 2.0), (4, 5, 3.0), (4, 6, 3.0), (5, 6, 2.0)],
        {1: "a", 2: "a", 3: "b", 4: "b", 5: "b", 6: "b"},
        2.184720099868397, 2.2438900508)


@pytest.mark.parametrize("spec", [D_V1, D_V3, D_V2], ids=["v1", "v3", "v2"])
def test_distance_complexity_golden(spec):
    edge_list, cats, little, big = spec
    edges = rd.from_pandas(pd.DataFrame(
        {"a": [a for a, _, _ in edge_list], "b": [b for _, b, _ in edge_list],
         "w": [w for _, _, w in edge_list]}
    ))
    categories = rd.from_pandas(pd.DataFrame(
        {"id": list(cats), "cat": [cats[k] for k in cats]}
    ))
    res = distance_complexity(edges, categories, num_buckets=2)
    assert res["little_complexity"] == pytest.approx(little, abs=1e-9)
    assert res["big_complexity"] == pytest.approx(big, abs=1e-8)


# lab/test.ipynb cells 2,3,7 edge lists vs the notebook formulas (A4/A5)
ORACLE_EDGES = [
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
    [(1, 2), (1, 3), (4, 1), (2, 3), (4, 2), (4, 3)],
    [(0, 1), (1, 2), (2, 1), (3, 4), (4, 5), (6, 4), (7, 4)],
]


def _oracle_entropies(edges):
    """Re-implementation of lab/test.ipynb cell 1 (numpy, per-element)."""
    import collections

    d = collections.defaultdict(lambda: {"i": [], "o": []})
    for a, b in edges:
        d[a]["o"].append(b)
        d[b]["i"].append(a)
    ind = np.array([len(v["i"]) for v in d.values()])
    outd = np.array([len(v["o"]) for v in d.values()])
    alld = ind + outd

    def h(vals):
        vals = vals[vals > 0]
        f = vals / vals.sum()
        return float((-f * np.log2(f)).sum())

    def dde(vals):
        cnt = np.array(list(collections.Counter(vals).values()), dtype=float)
        p = cnt / cnt.sum()
        return float(np.nansum(p * np.log2(1 / p)))

    return {
        "entropy_in": h(ind), "entropy_out": h(outd), "entropy_all": h(alld),
        "dde_in": dde(ind), "dde_out": dde(outd),
        "n_in": int((ind > 0).sum()), "n_out": int((outd > 0).sum()),
    }


@pytest.mark.parametrize("i", range(len(ORACLE_EDGES)))
def test_entropy_report_vs_notebook_oracle(i):
    edges = ORACLE_EDGES[i]
    ds = rd.from_pandas(pd.DataFrame(
        {"src": [a for a, _ in edges], "dst": [b for _, b in edges]}
    ))
    rep = entropy_report(ds)
    want = _oracle_entropies(edges)
    for chan in ("in", "out", "all"):
        assert rep[f"entropy_{chan}"] == pytest.approx(
            want[f"entropy_{chan}"], abs=1e-9
        )
    assert rep["degree_dist_entropy_in"] == pytest.approx(want["dde_in"], abs=1e-9)
    assert rep["degree_dist_entropy_out"] == pytest.approx(want["dde_out"], abs=1e-9)
    assert rep["node_in_count"] == want["n_in"]
    assert rep["node_out_count"] == want["n_out"]
    # normalization formula (Emin = log2(4(n-1))/2)
    n = want["n_in"]
    e_min = math.log2(4 * (n - 1)) / 2
    assert rep["normalize_entropy_in"] == pytest.approx(
        (want["entropy_in"] - e_min) / (math.log2(n) - e_min), abs=1e-9
    )
