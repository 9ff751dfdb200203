"""Subject-partitioned pipelines vs pure-python oracles on the synthetic
works table; S9 TSV reader edge cases; M9 tag parsing."""

import collections

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from graph_computing_go_ray.functions.text import parse_subject_tags
from graph_computing_go_ray.pipelines import subjects as SUBJ
from graph_computing_go_ray.sources.works_gen import SUBJECTS, generate_works


@pytest.fixture(scope="module")
def works(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("works"))
    generate_works(d, n_works=600, seed=7, year_lo=2015, year_hi=2024)
    rows = pq.read_table(f"{d}/works.parquet").to_pylist()
    return d, rows


def test_subject_entropy_oracle(works):
    d, rows = works
    subject = SUBJECTS[0]
    rep = SUBJ.subject_entropy(d, subject)
    ids = {r["id"] for r in rows if subject in r["concepts_lv0"]}
    edges = [(r["id"], t) for r in rows if r["id"] in ids
             for t in r["referenced_works"] if t in ids]
    ind = collections.Counter(t for _, t in edges)
    vals = np.array(list(ind.values()), dtype=float)
    f = vals / vals.sum()
    want = float((-f * np.log2(f)).sum())
    assert rep["entropy_in"] == pytest.approx(want, abs=1e-9)


def test_academic_circle_multilayer_runs(works):
    d, rows = works
    res = SUBJ.academic_circle_multilayer(d, subjects=SUBJECTS[:5])
    assert res["m"] > 0
    assert res["little_structural_entropy"] > 0
    assert len(res["modules"]) <= 5
    # m equals the expanded edge count of the python oracle
    sset = set(SUBJECTS[:5])
    circle = {r["id"]: [c for c in r["concepts_lv0"] if c in sset]
              for r in rows if set(r["concepts_lv0"]) & sset}
    m = 0
    for rid, cats in circle.items():
        row = next(r for r in rows if r["id"] == rid)
        for t in row["referenced_works"]:
            if t in circle:
                m += len(cats) * len(circle[t])
    assert res["m"] == m


def test_nis_tsv_reader(tmp_path):
    p = tmp_path / "nis.tsv"
    p.write_text(
        "2020\tA\tB\t1.5\n"
        "2020\tA\tC\t0.0\n"          # zero guard -> dropped (M11)
        "bad line\n"                  # malformed -> dropped
        "2020\tB\tC\t2.5\n"
        "2021\tA\tB\t9.9\n"
    )
    ds = SUBJ.read_nis_tsv(str(p))
    df = ds.to_pandas()
    assert len(df) == 3
    res = SUBJ.lv2_distance_complexity(str(p), 2020)
    # oracle: nodes A(1.5) B(1.5+2.5) C(2.5)
    def h(ws):
        w = np.array(ws, float); r = w.sum()
        return float((-(w / r) * np.log2(w / r)).sum()), r
    hs = [h([1.5]), h([1.5, 2.5]), h([2.5])]
    g = sum(r for _, r in hs)
    want = sum(hi * r for hi, r in hs) / g
    assert res["big_complexity"] == pytest.approx(want, abs=1e-9)


def test_discipline_distance_complexity(works):
    import ray.data as rd

    lv2_to_lv0 = {"x1": {"Physics"}, "x2": {"Physics", "Chemistry"},
                  "x3": {"Chemistry"}}
    edges = rd.from_pandas(pd.DataFrame(
        {"a": ["x1", "x2"], "b": ["x2", "x3"], "w": [1.0, 2.0]}
    ))
    out = SUBJ.discipline_distance_complexity(edges, lv2_to_lv0)
    # edge (x1,x2): Physics only; (x2,x3): Chemistry only
    assert set(out) == {"Physics", "Chemistry"}
    assert out["Physics"]["big_complexity"] == pytest.approx(0.0, abs=1e-12)
    assert out["Chemistry"]["big_complexity"] == pytest.approx(0.0, abs=1e-12)


def test_parse_subject_tags():
    tags = ["lv1-Computer science-2020", "lv2-Physics-2019", "lv1-Bad",
            "lv1-Not a subject-2020", "other"]
    got = parse_subject_tags(tags, 1, {"Computer science", "Physics"})
    assert got == ["Computer science"]
    got2 = parse_subject_tags(tags, 2, {"Physics"})
    assert got2 == ["Physics"]
