"""[north-rule] iterative graph algorithms exposed as driver queries.

PageRank runs on the directed bipartite lineitem graph (order → part);
CC / LPA / triangles run on the undirected part co-occurrence graph.
Workdirs are keyed by sf_dir so checkpoints are reused within a round
(and exercise the resume path when a query is re-run)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..engine.components import connected_components
from ..engine.labelprop import label_propagation
from ..engine.pagerank import pagerank
from ..engine.triangles import triangle_count, undirected_distinct
from ..sources.readers import lineitem_edges, read_table

ROUND = 6


ALGO_VERSION = "v2"  # bump when superstep/program semantics change so
# checkpoint reuse can never serve results from an older engine


def _workdir(sf_dir: str, algo: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(
        "/tmp/gcgr_work", f"{os.path.basename(sf_dir)}-{key}-{ALGO_VERSION}", algo
    )


def cooccur_pairs(sf_dir: str, num_buckets: int | None = None) -> Dataset:
    """(u, v) co-occurrence pairs of parts within each order, u<v, one row
    per (order, pair). Vectorized: orders are hash-bucketed and each bucket
    generates pairs with the numpy allpairs kernel — no per-group Python
    (the A9/triangle wedge primitive)."""
    from ..engine.join import add_bucket, default_num_buckets
    from ..functions.pairs import allpairs_by_group

    if num_buckets is None:
        num_buckets = default_num_buckets()
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    b = add_bucket(li, "l_orderkey", num_buckets)

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        df = (
            g[["l_orderkey", "l_partkey"]].drop_duplicates()
            .sort_values(["l_orderkey", "l_partkey"])
        )
        a, c = allpairs_by_group(
            df["l_orderkey"].to_numpy(), df["l_partkey"].to_numpy()
        )
        return pd.DataFrame({"u": a, "v": c})

    pairs = b.groupby("bucket").map_groups(gen, batch_format="pandas")
    return pairs.map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("u", pa.int64()), ("v", pa.int64())])
        ),
        batch_format="pandas",
    )


def cooccur_edge_ds(sf_dir: str) -> Dataset:
    """Distinct undirected co-occurrence pairs of parts within an order."""
    from ..engine.degrees import distinct_pairs

    return distinct_pairs(cooccur_pairs(sf_dir), ["u", "v"]).rename_columns(
        {"u": "src", "v": "dst"}
    )


def pagerank_bipartite(sf_dir: str) -> Dataset:
    """PageRank over order→part edges; (id, rank) rounded for stability."""
    ranks, _info = pagerank(
        lineitem_edges(sf_dir), _workdir(sf_dir, "pagerank"),
        tol=1e-10, max_iters=100, num_parts=8,
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {"id": t["id"],
             "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 9))}
        ),
        batch_format="pyarrow",
    )


def hits_bipartite(sf_dir: str) -> Dataset:
    """HITS hubs/authorities over order→part edges (engine/hits.py);
    (id, hub, auth) with L2-normalized scores rounded for stability."""
    from ..engine.hits import hits

    ranks, _info = hits(
        lineitem_edges(sf_dir), _workdir(sf_dir, "hits"),
        tol=1e-12, max_iters=100, num_parts=8,
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {"id": t["id"],
             "hub": pa.array(np.round(t["hub"].to_numpy(zero_copy_only=False), 9)),
             "auth": pa.array(np.round(t["auth"].to_numpy(zero_copy_only=False), 9))}
        ),
        batch_format="pyarrow",
    )


def ppr_bipartite(sf_dir: str) -> Dataset:
    """Personalized PageRank over order→part edges, seeded at the 5
    smallest part vertices (engine/ppr.py). Seed selection is a distributed
    sort+limit with a small bounded driver-side dedup — seeds are
    semantically a user input; this just fixes a deterministic one."""
    from ..engine.ppr import personalized_pagerank

    edges = lineitem_edges(sf_dir)
    head = edges.select_columns(["dst"]).sort("dst").limit(50_000).to_pandas()
    seeds = head["dst"].drop_duplicates().head(5).to_numpy(dtype=np.int64)
    ranks, _info = personalized_pagerank(
        edges, _workdir(sf_dir, "ppr"), seeds,
        tol=1e-12, max_iters=100, num_parts=8,
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {"id": t["id"],
             "rank": pa.array(np.round(t["rank"].to_numpy(zero_copy_only=False), 9))}
        ),
        batch_format="pyarrow",
    )


def hyperball_cooccur(sf_dir: str) -> pd.DataFrame:
    """HyperBall neighborhood function over the undirected part
    co-occurrence graph (engine/hyperball.py): one row per radius t with
    the estimated number of vertex pairs within distance <= t, plus the
    interpolated 90% effective diameter on every row."""
    from ..engine.hyperball import hyperball

    _balls, info = hyperball(
        cooccur_edge_ds(sf_dir), _workdir(sf_dir, "hyperball"),
        b=7, num_parts=8, symmetrize=True,
    )
    neigh = info["neighborhood"]
    return pd.DataFrame({
        "t": np.arange(len(neigh), dtype=np.int64),
        "pairs_within_t": np.round(np.array(neigh), 3),
        "effective_diameter_90": np.round(info["effective_diameter_90"], 3),
    })


def components_cooccur(sf_dir: str) -> Dataset:
    labels, _ = connected_components(
        cooccur_edge_ds(sf_dir), _workdir(sf_dir, "cc"), num_parts=8
    )
    return labels


def coreness_cooccur(sf_dir: str) -> Dataset:
    """k-core decomposition (h-index iteration, engine/kcore.py) over the
    undirected part co-occurrence graph; exact peeling parity is asserted
    in tests/test_superstep.py."""
    from ..engine.kcore import kcore

    cores, _ = kcore(
        cooccur_edge_ds(sf_dir), _workdir(sf_dir, "kcore"), num_parts=8
    )
    return cores


def labelprop_cooccur(sf_dir: str) -> Dataset:
    labels, _ = label_propagation(
        cooccur_edge_ds(sf_dir), _workdir(sf_dir, "lpa"), max_iters=15, num_parts=8
    )
    return labels


def triangles_cooccur(sf_dir: str) -> pd.DataFrame:
    n = triangle_count(cooccur_edge_ds(sf_dir))  # CPU-scaled buckets
    return pd.DataFrame([{"n_triangles": n}])


def component_sizes(sf_dir: str) -> Dataset:
    """Histogram of component sizes — a second, SQL-free sanity surface."""
    from ..engine.degrees import grouped_count

    labels = components_cooccur(sf_dir)
    return grouped_count(labels, "label", "size")


def bfs_cooccur(sf_dir: str) -> Dataset:
    """BFS hop distances over the undirected part co-occurrence graph from
    the minimum vertex id (deterministic seed, same as the SQL oracle's
    min(u)); only reached vertices are emitted."""
    from ..engine.bfs import bfs_depths

    edges = cooccur_edge_ds(sf_dir)
    seed = edges.min("src")  # u<v pairs: min(u) is the global min vertex
    out, _ = bfs_depths(
        edges, [int(seed)], _workdir(sf_dir, f"bfs_{int(seed)}"),
        num_parts=8, symmetrize=True,
    )
    return out.rename_columns({"id": "id", "dist": "dist"})


def global_clustering(sf_dir: str) -> pd.DataFrame:
    """Global clustering coefficient of the part co-occurrence graph:
    3 * n_triangles / n_wedges (0 when wedge-free), with the exact wedge
    count n_wedges = sum over vertices of C(deg, 2).

    Both sides are pure aggregates: the degree table is a groupby over the
    distinct edge set and the wedge sum is an integer map_batches partial —
    nothing vertex-scale reaches the driver."""
    from ..engine.triangles import _degrees

    und = undirected_distinct(cooccur_edge_ds(sf_dir)).materialize()
    deg = _degrees(und)

    def partial(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())})

    wedges = int(
        deg.map_batches(partial, batch_format="pyarrow").to_pandas()["w"].sum()
    )
    tri = triangle_count(und.rename_columns({"u": "src", "v": "dst"}))
    cc = round(3.0 * tri / wedges, ROUND) if wedges else 0.0
    return pd.DataFrame(
        [{"n_wedges": wedges, "n_triangles": tri, "global_cc": cc}]
    )


def degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity coefficient (Pearson r of endpoint degrees over
    both orientations of every distinct undirected edge) of the part
    co-occurrence graph.

    All moments are EXACT integer sums (deg <= |V| so the int64/HUGEINT
    partials are exact on both the Ray and DuckDB side); the only float op
    is the final ratio — summation-order-proof by construction (the
    pricing_summary lesson, VERDICT r1 #1)."""
    from ..engine.join import bucket_join, default_num_buckets
    from ..engine.triangles import _degrees

    nb = default_num_buckets()
    und = undirected_distinct(cooccur_edge_ds(sf_dir)).materialize()
    deg = _degrees(und).materialize()

    with_u = bucket_join(
        und, deg.rename_columns({"id": "uid", "deg": "udeg"}),
        on="u", right_on="uid", how="inner", num_buckets=nb,
    )
    with_uv = bucket_join(
        with_u, deg.rename_columns({"id": "vid", "deg": "vdeg"}),
        on="v", right_on="vid", how="inner", num_buckets=nb,
    )

    def moments(t: pa.Table) -> pa.Table:
        du = t["udeg"].to_numpy(zero_copy_only=False).astype(object)
        dv = t["vdeg"].to_numpy(zero_copy_only=False).astype(object)
        # python-int accumulation: exact regardless of magnitude
        sx = int(np.sum(du + dv))
        sxx = int(np.sum(du * du + dv * dv))
        sxy = int(np.sum(2 * du * dv))
        return pa.table({"n": pa.array([2 * t.num_rows], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sxx": pa.array([sxx], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64())})

    m = with_uv.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, sx, sxx, sxy = (int(m["n"]), int(m["sx"]), int(m["sxx"]), int(m["sxy"]))
    den = n * sxx - sx * sx
    r = round(float(n * sxy - sx * sx) / float(den), ROUND) if den else 0.0
    return pd.DataFrame([{"n_endpoints": n, "assortativity": r}])


def adamic_adar_topk(sf_dir: str, k: int = 50) -> Dataset:
    """Top-k existing co-occurrence edges by Adamic-Adar score (common
    neighbors weighted 1/log2(deg)); ties broken by (u, v) ascending.
    engine/linkpred.py holds the wedge-closing kernel."""
    from ..engine.linkpred import adamic_adar_edges

    scored = adamic_adar_edges(cooccur_edge_ds(sf_dir))
    return scored.sort(["aa", "u", "v"], descending=[True, False, False]).limit(k)
