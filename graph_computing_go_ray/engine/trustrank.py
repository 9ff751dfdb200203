"""[north-rule] TrustRank — personalized PageRank with the restart vector
concentrated on a trusted seed set, over a WEIGHTED link graph (Gyöngyi,
Garcia-Molina & Pedersen, VLDB 2004 — "Combating Web Spam with TrustRank";
public algorithm). Trust flows from the seeds along out-links; a host's
relative spam mass compares its PageRank to how much of that rank is
reachable from trusted seeds:

    TR_{k+1}(v) = (1-d)*p(v) + d * ( sum_{u->v} w(u,v)/W(u) * TR_k(u)
                                     + D_k * p(v) )
    spam_mass(v) = (PR(v) - TR(v)) / PR(v)       (both normalized to sum 1)

with p(v) = 1/|S| on the seed set S and dangling mass D_k restarting at
the seeds (the PPR convention, engine/ppr.py).

Ray shape: pure program composition over the existing superstep engine —
the weighted gather comes from WeightedPageRankProgram (per-edge nw=w/W(src)
precomputed into the CSR blocks at build, engine/wpagerank.py:68) and the
seeded restart/apply from PersonalizedPageRankProgram (engine/ppr.py:24);
no new distributed machinery. The MRO is arranged so the Arrow weighted
gather is the most-derived gather (guarded by _resolve_gather_arrow,
engine/superstep.py:103).

Parity: numpy power-iteration replica of the same formulation,
allclose 1e-9 at convergence (tests/test_graph_extras.py).
"""

from __future__ import annotations

import numpy as np

from ray.data import Dataset

from .ppr import PersonalizedPageRankProgram
from .wpagerank import WeightedPageRankProgram


class WeightedTrustRankProgram(PersonalizedPageRankProgram,
                               WeightedPageRankProgram):
    """Weighted gather (WPR, Arrow path) + seeded restart apply (PPR)."""

    name = "trustrank"

    def __init__(self, seed_ids: np.ndarray, damping: float = 0.85,
                 tol: float = 1e-9):
        super().__init__(seed_ids, damping, tol)
        self.params = {**self.params, "program": "trustrank"}


def weighted_trustrank(
    edges: Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    weight_col: str = "w",
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """Run weighted TrustRank from `seed_ids` to convergence; returns
    ((id, rank) Dataset, info). `edges` carries (src, dst, <weight_col>),
    weights > 0. Use a distinct workdir per (graph, seed set)."""
    import pyarrow as pa

    from .join import bucket_grouped_sum, bucket_join, default_num_buckets
    from .superstep import (
        _load_graph_meta,
        build_graph_partitions,
        final_state,
        load_edge_blocks,
        run_supersteps,
    )

    info = _load_graph_meta(workdir)
    if info is None:
        # identical normalization build to weighted_pagerank: per-src
        # weight sums once, nw stored as a CSR edge attribute.
        def pos_w(t: pa.Table) -> pa.Table:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if (w <= 0).any():
                raise ValueError("weighted_trustrank requires weights > 0")
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        ew = edges.select_columns(["src", "dst", weight_col]).map_batches(
            pos_w, batch_format="pyarrow"
        ).materialize()

        def partial(t: pa.Table) -> pa.Table:
            df = t.to_pandas().groupby("src", as_index=False)["w"].sum()
            import pandas as pd  # noqa: F401  (Table.from_pandas path)
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
    prog = WeightedTrustRankProgram(seed_ids, damping, tol)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    ranks = final_state(workdir).select_columns(["id", "rank"])
    return ranks, {**run, **info}
