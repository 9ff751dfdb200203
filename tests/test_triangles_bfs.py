"""Triangle counting (broadcast fast path AND bucketed fallback) vs the
dense-matrix oracle, and BFS hop distances vs a pure-python BFS."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graph_computing_go_ray.engine.bfs import bfs_depths
from graph_computing_go_ray.engine.triangles import triangle_count


def _random_edges(n=200, m=1500, seed=3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n, size=m)
    v = rng.randint(0, n, size=m)
    keep = u != v
    return pd.DataFrame({"src": u[keep], "dst": v[keep]})


def _exact_triangles(df, n):
    a = np.zeros((n, n), dtype=np.int64)
    a[df["src"], df["dst"]] = 1
    a |= a.T
    np.fill_diagonal(a, 0)
    return int(np.trace(a @ a @ a) // 6)


def test_triangle_count_both_paths():
    df = _random_edges()
    want = _exact_triangles(df, 200)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    assert triangle_count(ds) == want                          # broadcast path
    assert triangle_count(ds, broadcast_max_edges=0) == want   # bucketed fallback


def _exact_bfs(df, seed):
    adj = collections.defaultdict(set)
    for s, d in zip(df["src"], df["dst"]):
        adj[s].add(d)
        adj[d].add(s)  # symmetrize, matching bfs_depths(symmetrize=True)
    dist = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for x in frontier:
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    nxt.append(y)
        frontier = nxt
    return dist


def test_bfs_depths_matches_python_bfs(tmp_path):
    df = _random_edges(n=500, m=900, seed=9)  # sparse: several components
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    seed = int(df["src"].min())
    out, info = bfs_depths(ds, [seed], str(tmp_path / "bfs"), num_parts=4)
    # ONE to_pandas: each call re-executes the lazy pipeline and Ray's row
    # order differs across executions — zipping columns from two separate
    # executions scrambles the id<->dist pairing (the source of this
    # test's historical flake; engine output was always correct)
    pdf = out.to_pandas()
    got = dict(zip(pdf["id"].to_numpy(), pdf["dist"].to_numpy()))
    want = _exact_bfs(df, seed)
    assert got == want
    assert info["iterations"] >= max(want.values())


def test_bfs_local_vs_distributed_parity(tmp_path):
    """The local-cutoff BFS leg must equal the distributed superstep run
    exactly (multi-seed, directed — the bow-tie configuration)."""
    df = _random_edges(n=400, m=800, seed=13)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    seeds = sorted(set(df["src"].to_numpy()[:5].tolist()))
    a, ia = bfs_depths(ds, seeds, str(tmp_path / "bl"), num_parts=4,
                       symmetrize=False)
    b, ib = bfs_depths(ds, seeds, str(tmp_path / "bd"), num_parts=4,
                       symmetrize=False, local_cutoff=0)
    assert ia.get("local") is True and "local" not in ib
    pa_ = a.to_pandas().sort_values("id", ignore_index=True)
    pb = b.to_pandas().sort_values("id", ignore_index=True)
    import pandas as pd
    pd.testing.assert_frame_equal(pa_, pb)
