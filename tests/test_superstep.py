"""PageRank / CC / LPA vs independent numpy oracles on seeded random graphs,
plus the mid-iteration resume contract."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graph_computing_go_ray.engine.components import connected_components
from graph_computing_go_ray.engine.labelprop import label_propagation
from graph_computing_go_ray.engine.pagerank import pagerank
from graph_computing_go_ray.state import checkpoint as ckpt


def random_edges(n=300, m=1200, seed=7):
    rng = np.random.RandomState(seed)
    # zipf-ish dst skew so heavy hitters exist; drop self loops
    src = rng.randint(0, n, size=m)
    dst = (rng.zipf(1.3, size=m) - 1) % n
    keep = src != dst
    return pd.DataFrame({"src": src[keep].astype(np.int64),
                         "dst": dst[keep].astype(np.int64)})


def numpy_pagerank(edges: pd.DataFrame, d=0.85, tol=1e-9, iters=200):
    ids = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    s = np.array([idx[v] for v in edges["src"]])
    t = np.array([idx[v] for v in edges["dst"]])
    outdeg = np.bincount(s, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[outdeg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, t, r[s] / outdeg[s])
        new = (1 - d) / n + d * (contrib + dang / n)
        delta = np.abs(new - r).sum()
        r = new
        if delta < tol:
            break
    return dict(zip(ids, r))


def numpy_cc(edges: pd.DataFrame):
    ids = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    parent = {v: v for v in ids}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in zip(edges["src"], edges["dst"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in ids}


@pytest.fixture(scope="module")
def graph(tmp_path_factory):
    edges = random_edges()
    return edges, rd.from_pandas(edges), str(tmp_path_factory.mktemp("ss"))


def test_pagerank_matches_numpy(graph):
    edges_pd, edges_ds, root = graph
    wd = os.path.join(root, "pr")
    ranks, info = pagerank(edges_ds, wd, tol=1e-10, max_iters=200, num_parts=4)
    got = ranks.to_pandas().set_index("id")["rank"].to_dict()
    want = numpy_pagerank(edges_pd, tol=1e-10)
    assert info["converged"]
    assert set(got) == set(want)
    ids = sorted(got)
    np.testing.assert_allclose(
        [got[i] for i in ids], [want[i] for i in ids], rtol=0, atol=1e-6
    )
    assert abs(sum(got.values()) - 1.0) < 1e-8


def test_pagerank_resume_mid_iteration(graph):
    edges_pd, edges_ds, root = graph
    wd_full = os.path.join(root, "pr_full")
    wd_res = os.path.join(root, "pr_res")
    ranks_full, _ = pagerank(edges_ds, wd_full, tol=1e-10, max_iters=200, num_parts=4)
    # phase 1: stop after 3 supersteps
    pagerank(edges_ds, wd_res, tol=1e-10, max_iters=3, num_parts=4)
    assert ckpt.latest_complete_iteration(wd_res) == 3
    # simulate a crash mid-iteration 4: partial state dir without manifest
    os.makedirs(ckpt.state_dir(wd_res, 4), exist_ok=True)
    open(os.path.join(ckpt.state_dir(wd_res, 4), "part-00000.parquet"), "wb").close()
    # resume to convergence; must match the uninterrupted run exactly
    ranks_res, info = pagerank(edges_ds, wd_res, tol=1e-10, max_iters=200, num_parts=4)
    a = ranks_full.to_pandas().sort_values("id")["rank"].to_numpy()
    b = ranks_res.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    # lineage manifests recorded per superstep
    m = ckpt.read_manifest(wd_res, info["final_iter"])
    assert m["parent"] == info["final_iter"] - 1
    assert "edges_per_sec" in m


def test_connected_components_exact(graph):
    edges_pd, edges_ds, root = graph
    wd = os.path.join(root, "cc")
    labels, info = connected_components(edges_ds, wd, num_parts=4)
    got = labels.to_pandas().set_index("id")["label"].to_dict()
    want = numpy_cc(edges_pd)
    assert info["converged"]
    assert got == want


def test_label_propagation_deterministic(graph):
    edges_pd, edges_ds, root = graph
    wd1 = os.path.join(root, "lpa1")
    wd2 = os.path.join(root, "lpa2")
    l1, _ = label_propagation(edges_ds, wd1, max_iters=10, num_parts=4)
    l2, _ = label_propagation(edges_ds, wd2, max_iters=10, num_parts=2)
    a = l1.to_pandas().sort_values("id")["label"].to_numpy()
    b = l2.to_pandas().sort_values("id")["label"].to_numpy()
    # deterministic across partition counts
    assert (a == b).all()
    # labels coarsen communities: fewer labels than vertices
    assert len(np.unique(a)) < len(a)


def test_pagerank_uri_workdir_and_rerun_nonce(graph, tmp_path):
    """The checkpoint root accepts a filesystem URI (file://...) — the
    multi-node shared-storage path — and a fresh run over a REUSED workdir
    (resume=False) must not serve the previous run's cached shards from
    long-lived workers (run_id nonce)."""
    edges_pd, edges_ds, root = graph
    wd_uri = "file://" + os.path.join(str(tmp_path), "pr_uri")
    ranks, info = pagerank(edges_ds, wd_uri, tol=1e-10, max_iters=200, num_parts=4)
    assert info["converged"]
    got = ranks.to_pandas().set_index("id")["rank"].to_dict()
    want = numpy_pagerank(edges_pd, tol=1e-10)
    ids = sorted(got)
    np.testing.assert_allclose(
        [got[i] for i in ids], [want[i] for i in ids], rtol=0, atol=1e-6
    )
    # manifests live under the URI root and carry the run nonce
    m0 = ckpt.read_manifest(wd_uri, 0)
    assert m0.get("run_id")
    # re-run IN PLACE with resume=False: different nonce, same converged result
    ranks2, info2 = pagerank(edges_ds, wd_uri, tol=1e-10, max_iters=200,
                             num_parts=4, resume=False)
    assert ckpt.read_manifest(wd_uri, 0)["run_id"] != m0["run_id"]
    a = ranks.to_pandas().sort_values("id")["rank"].to_numpy()
    b = ranks2.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def numpy_coreness(edges: pd.DataFrame):
    """Exact peeling (Batagelj-Zaversnik style, simple undirected graph)."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in zip(edges["src"], edges["dst"]):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    remaining = set(deg)
    k = 0
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.discard(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def test_kcore_matches_peeling(graph):
    from graph_computing_go_ray.engine.kcore import kcore

    edges_pd, edges_ds, root = graph
    wd = os.path.join(root, "kcore")
    cores, info = kcore(edges_ds, wd, num_parts=4)
    got = cores.to_pandas().set_index("id")["core"].to_dict()
    want = numpy_coreness(edges_pd)
    assert info["converged"]
    assert got == want


def test_gather_arrow_resolution_rule():
    """A subclass overriding gather() but NOT gather_arrow() must fall back
    to its pandas gather — an inherited arrow path would silently run the
    BASE semantics (the weighted-PageRank bug this rule guards against)."""
    from graph_computing_go_ray.engine.pagerank import PageRankProgram
    from graph_computing_go_ray.engine.superstep import (
        VertexProgram,
        _resolve_gather_arrow,
    )

    class WeightedVariant(PageRankProgram):
        def gather(self, edges, state_of, global_vals):  # more derived
            raise NotImplementedError

    class ArrowVariant(PageRankProgram):
        def gather_arrow(self, t, state_of, global_vals):  # more derived
            raise NotImplementedError

    class PlainProgram(VertexProgram):
        def gather(self, edges, state_of, global_vals):
            raise NotImplementedError

    assert _resolve_gather_arrow(PageRankProgram()) is not None
    assert _resolve_gather_arrow(WeightedVariant()) is None
    assert _resolve_gather_arrow(ArrowVariant()) is not None
    assert _resolve_gather_arrow(PlainProgram()) is None

    from graph_computing_go_ray.engine.wpagerank import WeightedPageRankProgram

    # the real weighted program defines BOTH at the same level -> arrow
    assert _resolve_gather_arrow(WeightedPageRankProgram()) is not None


def test_delta_pagerank_matches_replica_and_power_iteration(graph):
    """Residual-push PageRank: same-round replica parity (1e-10) and
    fixed-point agreement with the power-iteration engine (1e-5); with
    theta > 0 the pushed frontier must shrink below n while still
    converging to the same ranks."""
    from graph_computing_go_ray.engine.deltapr import (
        delta_pagerank, delta_pagerank_replica)

    edges_pd, edges_ds, root = graph
    ids = np.unique(np.concatenate([edges_pd["src"], edges_pd["dst"]]))
    n = len(ids)

    # theta = 0: full sweeps — parity with the replica and with power iter
    wd0 = os.path.join(root, "dpr0")
    out0, info0 = delta_pagerank(edges_ds, wd0, tol=1e-9, theta=0.0,
                                 num_parts=4)
    df0 = out0.to_pandas().sort_values("id", ignore_index=True)
    want0 = delta_pagerank_replica(edges_pd["src"].to_numpy(),
                                   edges_pd["dst"].to_numpy(), ids,
                                   tol=1e-9, theta=0.0)
    assert info0["converged"]
    np.testing.assert_allclose(df0["rank"].to_numpy(), want0,
                               rtol=0, atol=1e-10)
    pr = numpy_pagerank(edges_pd, tol=1e-12, iters=500)
    np.testing.assert_allclose(df0["rank"].to_numpy(),
                               [pr[i] for i in df0["id"]],
                               rtol=0, atol=1e-5)
    assert abs(df0["rank"].sum() - 1.0) < 1e-6

    # theta > 0: frontier-adaptive — same fixed point, exact replica
    theta = 1e-7 / n
    wd1 = os.path.join(root, "dpr1")
    out1, info1 = delta_pagerank(edges_ds, wd1, tol=1e-9, theta=theta,
                                 num_parts=4)
    df1 = out1.to_pandas().sort_values("id", ignore_index=True)
    want1 = delta_pagerank_replica(edges_pd["src"].to_numpy(),
                                   edges_pd["dst"].to_numpy(), ids,
                                   tol=1e-9, theta=theta)
    assert info1["converged"]
    np.testing.assert_allclose(df1["rank"].to_numpy(), want1,
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(df1["rank"].to_numpy(),
                               [pr[i] for i in df1["id"]],
                               rtol=0, atol=1e-5)


def test_object_state_crash_resume(graph):
    """Object-store-resident shards (superstep object_state): iterations
    between persist points write no parquet; a crash that loses the
    keeper's in-memory refs before the final flush must resume from the
    latest PERSISTED iteration and still converge to the exact
    uninterrupted result."""
    import glob
    import json

    edges_pd, edges_ds, root = graph
    wd_full = os.path.join(root, "pr_obj_full")
    wd = os.path.join(root, "pr_obj_res")
    ranks_full, _ = pagerank(edges_ds, wd_full, tol=1e-10, max_iters=200,
                             num_parts=4)
    pagerank(edges_ds, wd, tol=1e-10, max_iters=5, num_parts=4)
    # default persist_every=8 -> iters 1-4 in-memory only, 5 flushed;
    # only 0 and 5 carry parquet
    for it in (1, 2, 3, 4):
        assert not glob.glob(
            os.path.join(ckpt.state_dir(wd, it), "*.parquet")), it
        assert not ckpt.read_manifest(wd, it)["state_persisted"]
    assert ckpt.latest_complete_iteration(wd) == 5
    # simulate the crash-before-flush: drop iter-5 parquet, mark its
    # manifest unpersisted (the keeper's refs died with the driver)
    for f in glob.glob(os.path.join(ckpt.state_dir(wd, 5), "*.parquet")):
        os.remove(f)
    m5 = ckpt.read_manifest(wd, 5)
    m5["state_persisted"] = False
    ckpt.write_manifest(wd, 5, m5)
    assert ckpt.latest_complete_iteration(wd) == 0
    ranks_res, info = pagerank(edges_ds, wd, tol=1e-10, max_iters=200,
                               num_parts=4)
    assert info["converged"]
    a = ranks_full.to_pandas().sort_values("id")["rank"].to_numpy()
    b = ranks_res.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_superstep_skew_combiner_bound(tmp_path):
    """Skew probe (round-3 verdict #7): one dst holds ~20% of all edges;
    the block-level combiner must bound that hot vertex's reduce fan-in
    to at most (#edge blocks) partial rows — NOT its raw in-degree. The
    bound is asserted from the max_dst_rows metric every lineage
    manifest now carries."""
    import ray

    rng = np.random.RandomState(11)
    m = 4000
    n = 400
    hot_edges = m // 5  # 20% of edges into dst 0
    src_hot = rng.randint(1, n, size=hot_edges)
    src_rest = rng.randint(0, n, size=m - hot_edges)
    dst_rest = rng.randint(0, n, size=m - hot_edges)
    edges = pd.DataFrame({
        "src": np.concatenate([src_hot, src_rest]).astype(np.int64),
        "dst": np.concatenate([np.zeros(hot_edges, np.int64),
                               dst_rest.astype(np.int64)]),
    })
    edges = edges[edges["src"] != edges["dst"]]
    hot_in = int((edges["dst"] == 0).sum())
    assert hot_in > 0.15 * len(edges)

    wd = os.path.join(str(tmp_path), "skew")
    pagerank(rd.from_pandas(edges), wd, tol=1e-10, max_iters=3, num_parts=4)

    # bound = number of gather BATCHES (PageRank's gather cross-part
    # combine emits exactly one row per dst per batch): blocks are
    # coalesced to max(num_parts, CPUs) and map_batches cuts ~1024-row
    # batches inside them
    n_blocks = max(4, int(ray.cluster_resources().get("CPU", 0)))
    n_batches_bound = n_blocks + len(edges) // 1024 + 1
    worst = 0
    for it in range(1, 4):
        man = ckpt.read_manifest(wd, it)
        mdf = pd.DataFrame(man["metrics"])
        assert "max_dst_rows" in mdf.columns
        worst = max(worst, int(mdf["max_dst_rows"].max()))
    assert worst <= n_batches_bound, (worst, n_batches_bound)
    assert worst < hot_in / 4  # far below the raw fan-in


def test_keeper_pool_session_reuse_and_keeper_loss(graph, tmp_path):
    """Protects the round-4 keeper-pool perf win (VERDICT r4 #8): (1) two
    sequential superstep runs in one session REUSE the session keeper pool
    (per-run actor creation measurably doubled short queries once);
    (2) a killed keeper does not poison state reads — _read_state_any
    falls back to the persisted parquet shard — and the next run detects
    the dead handles and rebuilds the pool."""
    import pyarrow as pa

    import ray

    from graph_computing_go_ray.engine import superstep as ss

    edges_pd, edges_ds, root = graph
    wd1 = os.path.join(str(tmp_path), "kp1")
    wd2 = os.path.join(str(tmp_path), "kp2")
    pagerank(edges_ds, wd1, tol=0.0, max_iters=3, num_parts=4)
    pool1 = [a._actor_id.hex() for a in ss._KEEPER_POOL]
    assert pool1
    pagerank(edges_ds, wd2, tol=0.0, max_iters=3, num_parts=4)
    pool2 = [a._actor_id.hex() for a in ss._KEEPER_POOL]
    assert pool2 == pool1

    # dead-keeper fallback: a persisted parquet shard must still be
    # readable when the keeper holding (no) refs for it has been killed
    ckpt.write_part(wd1, 99, 0, pa.table(
        {"id": pa.array([1], pa.int64()),
         "rank": pa.array([0.5], pa.float64())}))
    lone = ray.remote(num_cpus=0)(ss._StateKeeper).remote()
    ray.get(lone.lookup.remote("", -1, -1))
    ray.kill(lone)
    df = ss._read_state_any(wd1, 99, 0, "keeper-loss-test", [lone])
    assert float(df["rank"].iloc[0]) == 0.5

    # pool rebuild: kill the session pool; the next run must detect the
    # dead handles and mint fresh actors instead of failing
    for a in ss._KEEPER_POOL:
        ray.kill(a)
    pagerank(edges_ds, os.path.join(str(tmp_path), "kp3"),
             tol=0.0, max_iters=2, num_parts=4)
    pool3 = [a._actor_id.hex() for a in ss._KEEPER_POOL]
    assert pool3 and set(pool3).isdisjoint(set(pool1))
