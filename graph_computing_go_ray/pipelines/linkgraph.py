"""Flagship link-graph pipeline wiring (driver ``entry()`` target).

Composes the canonical engine kernels over the bipartite lineitem edge
graph: degree table → PageRank supersteps → per-vertex result table with
global entropy scalars attached."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd

from ..engine import entropy as ent_k
from ..engine.join import bucket_join
from ..engine.pagerank import pagerank
from ..sources.readers import lineitem_edges


def flagship_summary(sf_dir: str) -> pd.DataFrame:
    """Per-vertex (id, in/out degree, pagerank) + global entropy scalars.

    A short PageRank run (smoke budget) in a throwaway workdir; full
    convergence runs live in pipelines/graphalgos.py and bench.py."""
    edges = lineitem_edges(sf_dir)
    deg = ent_k.degree_table(edges)
    rep = ent_k.entropy_report(edges)
    wd = tempfile.mkdtemp(prefix="gcgr_flagship_")
    try:
        ranks, _ = pagerank(edges, wd, tol=1e-8, max_iters=15, num_parts=4)
        out = bucket_join(
            deg, ranks.rename_columns({"id": "rid"}),
            on="id", right_on="rid", how="left", num_buckets=4,
        ).to_pandas()
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    out["graph_entropy_in"] = rep["entropy_in"]
    out["graph_node_count"] = rep["node_count"]
    return out
