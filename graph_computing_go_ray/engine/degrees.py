"""Degree kernels over the canonical edge table ``edges(src:int64, dst:int64)``.

Reference semantics: in-degree = count(*) grouped by dst over resolved edges
(/root/reference/internal/wikiEntropy/wikiEntropy.go:74-83); degree histograms
= count(vertices) grouped by degree value
(/root/reference/internal/wikiEntropy/degreeStats.go:28-40).

Scale notes: the groupby(dst) is THE wide shuffle of the engine. Every kernel
pre-aggregates inside map_batches (one partial row per key per block) and the
global combine is the hash-bucketed grouped aggregation of engine/join.py
(single-int shuffle key + vectorized per-bucket reduce), so the shuffle moves
|distinct keys per block| rows and never sort-merges wide keys.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .join import bucket_grouped, bucket_grouped_sum


def _partial_count(key: str, out_name: str):
    """map_batches fn: per-block count(*) by `key` (combiner before shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key).aggregate([(key, "count")])
        return g.rename_columns([key, out_name])

    return fn


def grouped_count(ds: Dataset, key: str, out_name: str) -> Dataset:
    """count(*) GROUP BY key: per-block partials + bucketed final sum."""
    partial = ds.select_columns([key]).map_batches(
        _partial_count(key, out_name), batch_format="pyarrow"
    )
    return bucket_grouped_sum(partial, [key], [out_name])


def in_degree(edges: Dataset) -> Dataset:
    """(dst, in_degree) over the edge table; parallel edges each count."""
    return grouped_count(edges, "dst", "in_degree")


def out_degree(edges: Dataset) -> Dataset:
    """(src, out_degree) over the edge table."""
    return grouped_count(edges, "src", "out_degree")


def degree_histogram(degree_ds: Dataset, degree_col: str) -> Dataset:
    """(degree, n_vertices) histogram of a degree table (A2)."""
    partial = degree_ds.select_columns([degree_col]).map_batches(
        _partial_count(degree_col, "n_vertices"), batch_format="pyarrow"
    )
    return bucket_grouped_sum(partial, [degree_col], ["n_vertices"])


def distinct_edges(edges: Dataset) -> Dataset:
    """(src, dst, multiplicity) — dedups parallel edges, keeping the count
    (reference D6: in-neighbor hashsets drop parallel edges,
    wikipediaGoogleDistance.go:84-88)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["src", "dst"]).aggregate([("dst", "count")])
        return g.rename_columns(["src", "dst", "multiplicity"])

    p = edges.select_columns(["src", "dst"]).map_batches(partial, batch_format="pyarrow")
    return bucket_grouped_sum(p, ["src", "dst"], ["multiplicity"])


def distinct_pairs(ds: Dataset, keys: list[str], num_buckets: int = 32) -> Dataset:
    """DISTINCT keys via per-block drop_duplicates + bucketed dedup."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            batch.select(keys).to_pandas().drop_duplicates(), preserve_index=False
        )

    p = ds.map_batches(partial, batch_format="pyarrow")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[keys].drop_duplicates()

    return bucket_grouped(p, keys, dedup, num_buckets)
