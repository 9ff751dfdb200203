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
