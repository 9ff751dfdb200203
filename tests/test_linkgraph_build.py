"""End-to-end link-graph build vs the pure-Python reference-semantics oracle:
byte-identical text per url, exact redirect-id map, exact edge multiset."""

import collections

import pyarrow.parquet as pq
import pytest

from graph_computing_go_ray.functions.hashing import hash_strings
from graph_computing_go_ray.pipelines.pages import build_link_graph
from graph_computing_go_ray.sources.pages_gen import generate_pages
from tests.oracle_linkgraph import build_graph_oracle


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    pages_dir = str(tmp_path_factory.mktemp("pages"))
    out_dir = str(tmp_path_factory.mktemp("graph"))
    generate_pages(pages_dir, n_pages=400, seed=42, n_files=3)
    paths = build_link_graph(pages_dir, out_dir, num_buckets=4)
    raw = pq.read_table(pages_dir).to_pylist()
    oracle = build_graph_oracle(raw, id_of=lambda u: int(hash_strings([u])[0]))
    return paths, raw, oracle


def test_extraction_byte_identical(built):
    paths, raw, oracle = built
    got = {
        r["url"]: r["text"]
        for r in pq.read_table(paths["extracted"], columns=["url", "text"]).to_pylist()
    }
    stored = {r["url"]: r["text"] for r in raw}
    assert len(got) > 0
    for url, text in got.items():
        v = oracle["vertices"][url]
        # redirect pages extract to title-only text; content pages must be
        # byte-identical to the generator's stored text column
        if v["redirect"] is None:
            assert text == stored[url], f"text mismatch for {url}"


def test_failed_side_output(built):
    paths, raw, oracle = built
    got = sorted(r["url"] for r in pq.read_table(paths["failed"]).to_pylist())
    assert got == sorted(oracle["failed"])
    assert len(got) > 0  # generator plants malformed pages


def test_redirect_ids_exact(built):
    paths, _, oracle = built
    vt = pq.read_table(paths["vertices"]).to_pylist()
    got = {r["id"]: r["redirect_id"] for r in vt if r["redirect_id"] is not None}
    assert got == oracle["redirect_ids"]
    # redirect rows that did NOT resolve exist (chains of length 4 give up)
    unresolved = [
        r for r in vt if r["redirect"] is not None and r["redirect_id"] is None
    ]
    assert len(unresolved) > 0


def test_edges_exact_multiset(built):
    paths, _, oracle = built
    et = pq.read_table(paths["edges"]).to_pylist()
    got = collections.Counter((r["src"], r["dst"]) for r in et)
    want = collections.Counter(oracle["edges"])
    assert got == want
    assert sum(want.values()) > 100


def test_no_self_edges(built):
    paths, _, _ = built
    et = pq.read_table(paths["edges"]).to_pylist()
    assert all(r["src"] != r["dst"] for r in et)


def test_host_edges_exact(built):
    from graph_computing_go_ray.pipelines.pages import host_edges

    paths, _, _ = built
    # replica: collapse the (already exactly-verified) page edge table to
    # host level with a plain python url->host parse
    vt = pq.read_table(paths["vertices"], columns=["id", "url"]).to_pylist()
    host_of = {r["id"]: r["url"].split("://", 1)[1].split("/", 1)[0]
               for r in vt}
    et = pq.read_table(paths["edges"], columns=["src", "dst"]).to_pylist()
    want = collections.Counter(
        (host_of[r["src"]], host_of[r["dst"]]) for r in et
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_edges(paths, num_buckets=4).to_pandas().to_dict("records")
    }
    assert got == dict(want)
    assert len(got) > 10


def test_host_pagerank_matches_numpy(built, tmp_path):
    import numpy as np

    from graph_computing_go_ray.pipelines.pages import host_pagerank

    paths, _, _ = built
    got = {r["host"]: r["rank"] for r in
           host_pagerank(paths, str(tmp_path / "hpr"), num_buckets=4)
           .to_pandas().to_dict("records")}
    # replica: host edge weights from the exactly-verified page edges,
    # then the numpy weighted-PageRank formulation of engine/wpagerank
    vt = pq.read_table(paths["vertices"], columns=["id", "url"]).to_pylist()
    host_of = {r["id"]: r["url"].split("://", 1)[1].split("/", 1)[0]
               for r in vt}
    et = pq.read_table(paths["edges"], columns=["src", "dst"]).to_pylist()
    w = collections.Counter(
        (host_of[r["src"]], host_of[r["dst"]]) for r in et)
    hosts = sorted({h for p in w for h in p})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    wsum = np.zeros(n)
    for (s, d), c in w.items():
        wsum[idx[s]] += c
    r = np.full(n, 1.0 / n)
    for _ in range(500):
        dang = r[wsum == 0].sum()
        contrib = np.zeros(n)
        for (s, d), c in w.items():
            contrib[idx[d]] += r[idx[s]] * (c / wsum[idx[s]])
        new = 0.15 / n + 0.85 * (contrib + dang / n)
        if np.abs(new - r).sum() < 1e-12:
            r = new
            break
        r = new
    assert set(got) == set(hosts)
    for h in hosts:
        assert abs(got[h] - r[idx[h]]) < 1e-8, h
    assert abs(sum(got.values()) - 1.0) < 1e-8


def test_host_trustrank_matches_numpy(built, tmp_path):
    """Full replica of pipelines/pages.py host_trustrank: weighted PR,
    top-3-by-(rank, id)-seed pick, seeded weighted TrustRank, spam mass."""
    import numpy as np

    from graph_computing_go_ray.pipelines.pages import host_trustrank

    paths, _, _ = built
    got = {r["host"]: (r["rank"], r["trust"], r["spam_mass"]) for r in
           host_trustrank(paths, str(tmp_path / "htr"), num_buckets=4)
           .to_pandas().to_dict("records")}

    vt = pq.read_table(paths["vertices"], columns=["id", "url"]).to_pylist()
    host_of = {r["id"]: r["url"].split("://", 1)[1].split("/", 1)[0]
               for r in vt}
    et = pq.read_table(paths["edges"], columns=["src", "dst"]).to_pylist()
    w = collections.Counter(
        (host_of[r["src"]], host_of[r["dst"]]) for r in et)
    hosts = sorted({h for p in w for h in p})
    hid = {h: int(hash_strings([h])[0]) for h in hosts}
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    wsum = np.zeros(n)
    for (s, d), c in w.items():
        wsum[idx[s]] += c

    def iterate(p):
        r = p.copy()
        for _ in range(500):
            dang = r[wsum == 0].sum()
            contrib = np.zeros(n)
            for (s, d), c in w.items():
                contrib[idx[d]] += r[idx[s]] * (c / wsum[idx[s]])
            new = 0.15 * p + 0.85 * (contrib + dang * p)
            if np.abs(new - r).sum() < 1e-12:
                return new
            r = new
        return r

    pr = iterate(np.full(n, 1.0 / n))
    order = sorted(range(n), key=lambda i: (-pr[i], hid[hosts[i]]))
    seed_idx = set(order[:3])
    p = np.zeros(n)
    for i in seed_idx:
        p[i] = 1.0 / 3.0
    tr = iterate(p)

    assert set(got) == set(hosts)
    for h in hosts:
        i = idx[h]
        gr, gt, gm = got[h]
        assert abs(gr - round(pr[i], 9)) < 1e-8, h
        assert abs(gt - round(tr[i], 9)) < 1e-8, h
        assert abs(gm - round((pr[i] - tr[i]) / pr[i], 9)) < 1e-6, h
    # seeds hold concentrated trust; global trust mass sums to 1
    assert sum(t for _, t, _ in got.values()) == pytest.approx(1.0, abs=1e-8)
    for i in seed_idx:
        assert got[hosts[i]][1] > 1.0 / n
