"""Flagship link-graph pipeline wiring (driver ``entry()`` target).

Composes the canonical engine kernels over the bipartite lineitem edge
table: degree table → rank → entropy scalars. Extended per round as more
kernels land (PageRank / CC / LPA results join in here).
"""

from __future__ import annotations

import pandas as pd

from ..engine import degrees as deg_k
from ..engine import entropy as ent_k
from ..sources.readers import lineitem_edges


def flagship_summary(sf_dir: str) -> pd.DataFrame:
    """Per-vertex degree table of the edge graph, with global entropy scalars
    attached as columns (one small driver-side dict → broadcast columns)."""
    edges = lineitem_edges(sf_dir)
    deg = ent_k.degree_table(edges)
    rep = ent_k.entropy_report(edges)
    out = deg.to_pandas()
    out["graph_entropy_in"] = rep["entropy_in"]
    out["graph_node_count"] = rep["node_count"]
    return out
