"""Pages-side subject pipelines (S4 + wikiSubjectEntropy + J7 academic-
circle distance complexity) vs pure-python oracles on the synthetic pages
fixture."""

import collections
import math
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from graph_computing_go_ray.functions.hashing import hash_strings
from graph_computing_go_ray.functions.text import parse_subject_tags
from graph_computing_go_ray.pipelines import subject_pages as SP
from graph_computing_go_ray.pipelines.pages import build_link_graph
from graph_computing_go_ray.pipelines.snapshots import build_yearly_graphs
from graph_computing_go_ray.sources.pages_gen import SUBJECT_LIST, generate_pages
from tests.oracle_linkgraph import build_graph_oracle


def _id_of(url: str) -> int:
    return int(hash_strings([url])[0])


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    pages_dir = str(tmp_path_factory.mktemp("pages"))
    out_dir = str(tmp_path_factory.mktemp("graph"))
    generate_pages(pages_dir, n_pages=600, seed=47, n_files=3)
    paths = build_link_graph(pages_dir, out_dir, num_buckets=4)
    pdf = pq.read_table(pages_dir).to_pandas()
    pdf["year"] = pdf["warc_ts"].dt.year
    # the year with the most pages has the richest subgraph
    year = int(pdf["year"].value_counts().idxmax())
    yroot = str(tmp_path_factory.mktemp("yearly"))
    ymap = build_yearly_graphs(paths["extracted"], yroot, num_buckets=4,
                               years=[year])
    return pages_dir, paths, pdf, year, ymap[year]


def test_fixture_has_subject_tags(corpus):
    _, _, pdf, _, _ = corpus
    n_tagged = int((pdf["core_subject_tag"].map(len) > 0).sum())
    assert 0.4 * len(pdf) < n_tagged < 0.8 * len(pdf)
    flat = [t for tags in pdf["core_subject_tag"] for t in tags]
    assert all(t.startswith("lv") for t in flat)
    # tag year matches the page's snapshot year
    for tags, y in zip(pdf["core_subject_tag"], pdf["year"]):
        for t in tags:
            assert t.endswith(f"-{y}")


def test_pages_by_subject_tags_matches_python(corpus):
    pages_dir, paths, pdf, year, _ = corpus
    level = 1
    tags = SP.level_tags(level, year)
    got = SP.pages_by_subject_tags(
        SP._read_extracted(paths["extracted"]), tags, year
    ).to_pandas()
    tset = set(tags)
    want = pdf[
        (pdf["year"] == year)
        & pdf["core_subject_tag"].map(lambda ts: bool(tset.intersection(ts)))
    ]
    # extraction drops malformed pages; every surviving match must appear
    ext_urls = set(
        pq.read_table(paths["extracted"], columns=["url"])["url"].to_pylist()
    )
    assert set(got["url"]) == set(want["url"]) & ext_urls


def _subject_graph_oracle(pdf: pd.DataFrame, year: int, tags: set[str]):
    """Resolution within the (year, tags) page subset, python replica."""
    sel = pdf[
        (pdf["year"] == year)
        & pdf["core_subject_tag"].map(lambda ts: bool(tags.intersection(ts)))
    ]
    pages = [{"url": r.url, "html": r.html} for r in sel.itertuples()]
    return sel, build_graph_oracle(pages, _id_of)


def test_page_subject_entropy_matches_oracle(corpus, tmp_path):
    pages_dir, paths, pdf, year, _ = corpus
    level, subject = 1, None
    # pick the subject with the most tagged pages that year at lv1
    counts = collections.Counter()
    for tags, y in zip(pdf["core_subject_tag"], pdf["year"]):
        if y != year:
            continue
        for s in SUBJECT_LIST:
            if f"lv{level}-{s}-{year}" in tags:
                counts[s] += 1
    subject = counts.most_common(1)[0][0]

    rep = SP.page_subject_entropy(
        paths["extracted"], str(tmp_path), year, level, subject
    )
    tags = set(SP.level_tags(level, year, [subject]))
    _, orc = _subject_graph_oracle(pdf, year, tags)
    nonred = {v["id"] for v in orc["vertices"].values() if v["redirect"] is None}
    edges = [(s, d) for s, d in orc["edges"] if s in nonred]
    assert rep["edge_count"] == len(edges)
    if edges:
        ind = collections.Counter(d for _, d in edges)
        vals = np.array(list(ind.values()), dtype=float)
        f = vals / vals.sum()
        want = float((-f * np.log2(f)).sum())
        assert rep["entropy_in"] == pytest.approx(want, abs=1e-9)
    assert rep["subject"] == subject and rep["year"] == year


def test_academic_circle_pages_entropy_runs(corpus, tmp_path):
    _, paths, pdf, year, _ = corpus
    rep = SP.academic_circle_pages_entropy(paths["extracted"], str(tmp_path),
                                           year, 1)
    assert rep["subject"] == "academic circle"
    assert rep["graph_size"] > 0 and rep["edge_count"] > 0


def _multilayer_oracle(edges, cats_of):
    """Python replica of engine/multilayer.py over the clone-expanded graph."""
    xe = []
    for s, d in edges:
        for cs in cats_of.get(s, []):
            for cd in cats_of.get(d, []):
                xe.append((s, cs, d, cd))
    m = len(xe)
    indeg = collections.Counter((d, cd) for _, _, d, cd in xe)
    s_ = sum(indeg.values())
    s1 = sum(v * math.log2(v) for v in indeg.values())
    big = math.log2(s_) - s1 / s_ if s_ > 0 else 0.0
    vol, g = collections.Counter(), collections.Counter()
    mod_indeg = collections.defaultdict(collections.Counter)
    for s, cs, d, cd in xe:
        if cs == cd:
            vol[cs] += 1
            mod_indeg[cs][(d, cd)] += 1
        else:
            g[cs] += 1
    little = 0.0
    for cat, v in vol.items():
        degs = list(mod_indeg[cat].values())
        sm = sum(degs)
        sm1 = sum(x * math.log2(x) for x in degs)
        hj = math.log2(sm) - sm1 / sm if sm > 0 else 0.0
        little += hj * v / m - math.log2(v / m) * g.get(cat, 0) / m
    return big, little, m


def test_pages_multilayer_subject_entropy_matches_oracle(corpus, tmp_path):
    _, paths, pdf, year, _ = corpus
    level = 1
    out = SP.pages_multilayer_subject_entropy(paths["extracted"], str(tmp_path),
                                              year, level)
    tags = set(SP.level_tags(level, year))
    sel, orc = _subject_graph_oracle(pdf, year, tags)
    sset = set(SUBJECT_LIST)
    tag_of = {_id_of(r.url): list(r.core_subject_tag) for r in sel.itertuples()}
    nonred = {v["id"] for v in orc["vertices"].values() if v["redirect"] is None}
    cats_of = {
        i: parse_subject_tags(tag_of.get(i, []), level, sset) for i in nonred
    }
    edges = [(s, d) for s, d in orc["edges"] if s in nonred]
    big, little, m = _multilayer_oracle(edges, cats_of)
    assert out["m"] == m
    assert out["big_degree_entropy"] == pytest.approx(big, abs=1e-9)
    assert out["little_structural_entropy"] == pytest.approx(little, abs=1e-9)


# ---------------------------------------------------------------- J7 oracle
def _ngd_oracle(pdf, year, total):
    """Python NGD over the year graph: core = tagged non-redirect pages
    (wikipediaGoogleDistance.go:56-94)."""
    sel = pdf[pdf["year"] == year]
    pages = [{"url": r.url, "html": r.html} for r in sel.itertuples()]
    orc = build_graph_oracle(pages, _id_of)
    tag_of = {}
    for r in sel.itertuples():
        tag_of[_id_of(r.url)] = list(r.core_subject_tag)
    nonred = {v["id"] for v in orc["vertices"].values() if v["redirect"] is None}
    core = {i for i in nonred if tag_of.get(i)}
    inmap = collections.defaultdict(set)
    for s, d in orc["edges"]:
        if s in nonred and d in core:
            inmap[d].add(s)
    dist = {}
    cl = sorted(inmap)
    for i, u in enumerate(cl):
        for v in cl[i + 1:]:
            a, b = min(u, v), max(u, v)
            inter = len(inmap[u] & inmap[v])
            if inter == 0:
                continue
            nu, nv = len(inmap[u]), len(inmap[v])
            d = (math.log2(max(nu, nv)) - math.log2(inter)) / (
                math.log2(total) - math.log2(min(nu, nv))
            )
            dist[(a, b)] = d
    return dist, tag_of, nonred


def _complexity_oracle(edges, cats_of):
    """Python replica of engine/distance.py semantics over exploded
    (id, cat) categories."""
    inc = collections.defaultdict(list)
    for (a, b), w in edges.items():
        inc[a].append(w)
        inc[b].append(w)
    num = den = 0.0
    for ws in inc.values():
        r = sum(ws)
        h = -sum((w / r) * math.log2(w / r) for w in ws)
        num += h * r
        den += r
    big = num / den if den else 0.0

    rows = []  # exploded (a, b, w, ca, cb)
    for (a, b), w in edges.items():
        for ca in cats_of.get(a, []):
            for cb in cats_of.get(b, []):
                rows.append((a, b, w, ca, cb))
    vall = 2.0 * sum(r[2] for r in rows)
    intra_w = collections.defaultdict(float)
    outter_w = collections.defaultdict(float)
    node_w = collections.defaultdict(list)  # (cat, node) -> ws
    for a, b, w, ca, cb in rows:
        if ca == cb:
            intra_w[ca] += w
            node_w[(ca, a)].append(w)
            node_w[(ca, b)].append(w)
        else:
            outter_w[ca] += w
            outter_w[cb] += w
    sh = collections.defaultdict(float)
    for (cat, _node), ws in node_w.items():
        s = sum(ws)
        h = -sum((w / s) * math.log2(w / s) for w in ws)
        sh[cat] += s * h
    little = 0.0
    for cat, iw in intra_w.items():
        d_j = 2.0 * iw
        if d_j == 0 or vall == 0:
            continue
        h_module = sh[cat] / d_j
        o_j = outter_w.get(cat, 0.0)
        little += h_module * d_j / vall - math.log2(d_j / vall) * o_j / vall
    return big, little


def test_academic_circle_distance_complexity_matches_oracle(corpus, tmp_path):
    _, paths, pdf, year, ypaths = corpus
    level = 1
    res = SP.academic_circle_distance_complexity(
        paths["extracted"], ypaths, str(tmp_path), year, level
    )

    total = pq.read_table(ypaths["vertices"], columns=["id"]).num_rows
    dist, tag_of, nonred = _ngd_oracle(pdf, year, total)
    sset = set(SUBJECT_LIST)
    cats_of = {
        i: parse_subject_tags(tag_of.get(i, []), level, sset) for i in nonred
    }
    node_set = {i for i, cs in cats_of.items() if cs}
    kept = {
        p: w for p, w in dist.items()
        if p[0] in node_set and p[1] in node_set
    }
    big, little = _complexity_oracle(kept, cats_of)
    assert res["n_nodes_tagged"] == len(node_set)
    assert res["big_complexity"] == pytest.approx(big, abs=1e-9)
    assert res["little_complexity"] == pytest.approx(little, abs=1e-9)
    assert res["year"] == year and res["level"] == level
    # fixture must keep the comparison non-trivial (the modular little path
    # has its own reference goldens in test_entropy_golden.py)
    assert big > 0 and len(kept) > 0
