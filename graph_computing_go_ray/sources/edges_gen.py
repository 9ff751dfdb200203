"""Deterministic synthetic edge table generator (vectorized) for the
scaling benchmark: the two-parallelism-level criterion needs supersteps
that are compute-dominated, which means tens of millions of edges — far
beyond what the html-pages path can generate quickly. Zipf-skewed dsts
keep the heavy-hitter/combiner paths honest."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate_edges(
    out_dir: str,
    n_edges: int = 10_000_000,
    n_vertices: int = 1_000_000,
    seed: int = 42,
    zipf_s: float = 1.2,
    n_files: int = 32,
) -> str:
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = f"{n_edges}-{n_vertices}-{seed}-{zipf_s}-{n_files}-v1"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = (n_edges + n_files - 1) // n_files
    for f in range(n_files):
        rng = np.random.RandomState(seed * 7919 + f)
        n = min(per, n_edges - f * per)
        src = rng.randint(0, n_vertices, size=n).astype(np.int64)
        dst = ((rng.zipf(zipf_s, size=n) - 1) % n_vertices).astype(np.int64)
        keep = src != dst
        t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
        pq.write_table(t, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
