"""Weighted PageRank as a gather-scatter superstep program.

Standard weighted power iteration (the PageRank generalization every web
engine runs once links carry multiplicities/strengths):
    r_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} w(u,v)/W(u) * r_k(u) + D_k/N )
where W(u) = sum of u's out-edge weights and D_k = rank mass of vertices
with W(u) = 0 (dangling — with strictly positive weights this is exactly
out-degree 0, the unweighted dangling set).

Ray shape: the per-edge normalized weight nw = w/W(src) is computed ONCE
before the partition build (per-src weight sums via one bucketed groupby,
joined back onto the edges) and stored as an edge attribute in the CSR
blocks — supersteps then never recompute normalization; gather is
rank[src] * nw with the same unique+bincount combiner as unweighted
PageRank. Weights <= 0 are rejected (they would silently break the
dangling criterion).

Parity: numpy replica of the same formulation
(tests/test_graph_extras.py), allclose 1e-9 per vertex at convergence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .pagerank import PageRankProgram
from .superstep import (
    build_graph_partitions,
    final_state,
    local_col,
    run_supersteps,
)


class WeightedPageRankProgram(PageRankProgram):
    name = "wpagerank"

    # NOTE: a subclass that changes gather semantics MUST override
    # gather_arrow too — the engine prefers the Arrow path, so an
    # inherited unweighted gather_arrow would silently shadow a weighted
    # pandas gather (caught by the numpy parity test).
    def gather_arrow(self, t, state_of, global_vals):
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        nw = local_col(t, "nw")
        out_u, out_s = [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            contrib = st["rank"].to_numpy()[pos] * nw[m]
            u, inv = np.unique(dst_all[m], return_inverse=True)
            out_u.append(u)
            out_s.append(np.bincount(inv, weights=contrib))
        if not out_u:
            return {"dst": np.array([], np.int64),
                    "contrib": np.array([], np.float64)}
        return {"dst": np.concatenate(out_u),
                "contrib": np.concatenate(out_s)}


def weighted_pagerank(
    edges: Dataset,
    workdir: str,
    weight_col: str = "w",
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, rank) Dataset, run info). `edges` carries (src, dst,
    <weight_col>); weights must be > 0."""
    from .join import bucket_grouped_sum, bucket_join, default_num_buckets
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        def pos_w(t: pa.Table) -> pa.Table:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if (w <= 0).any():
                raise ValueError("weighted_pagerank requires weights > 0")
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        ew = edges.select_columns(["src", "dst", weight_col]).map_batches(
            pos_w, batch_format="pyarrow"
        ).materialize()

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas().groupby("src", as_index=False)["w"].sum()
            return pa.Table.from_pandas(
                df.rename(columns={"w": "wsum"}), preserve_index=False
            )

        wsums = bucket_grouped_sum(
            ew.map_batches(partial, batch_format="pyarrow"),
            ["src"], ["wsum"], num_buckets=default_num_buckets(),
        )
        joined = bucket_join(
            ew, wsums.rename_columns({"src": "wsrc"}),
            on="src", right_on="wsrc", how="inner",
            num_buckets=default_num_buckets(),
        )

        def norm(t: pa.Table) -> pa.Table:
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "nw": pa.array(
                    t["w"].to_numpy(zero_copy_only=False)
                    / t["wsum"].to_numpy(zero_copy_only=False), pa.float64()),
            })

        info = build_graph_partitions(
            joined.map_batches(norm, batch_format="pyarrow"),
            workdir, num_parts, edge_attrs=("nw",),
        )
    prog = WeightedPageRankProgram(damping, tol)
    prog.name = "wpagerank"
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    ranks = final_state(workdir).select_columns(["id", "rank"])
    return ranks, {**run, **info}
