"""Parquet readers for the driver's test tables and engine tables.

Always pass ``columns=`` — at 100 TB a read that loads all columns for a
2-column transform is wrong (SURVEY.md §2.1: partition-pruned reads replace
the reference's Mongo secondary-index cursors,
/root/reference/internal/extractWikipediadump/mongoClient.go:115-137).
"""

from __future__ import annotations

import os

import ray.data as rd
from ray.data import Dataset


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns)


def lineitem_edges(sf_dir: str) -> Dataset:
    """Canonical bipartite edge table over the driver harness data:
    src = l_orderkey, dst = l_partkey (multi-edges kept).

    Stands in for the resolved link-graph edge table when exercising graph
    kernels against DuckDB oracles (FIXTURES.md F7)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return ds.rename_columns({"l_orderkey": "src", "l_partkey": "dst"})
