"""[north-rule] PageRank as a partitioned gather-scatter superstep program.

Formulation (standard power iteration with dangling redistribution):
    r_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} r_k(u)/outdeg(u) + D_k/N )
where D_k = sum of r_k over dangling vertices (outdeg 0). Convergence:
L1 delta below tol. Per-vertex parity target: allclose 1e-6 against a numpy
power iteration of the same formulation (tests/test_pagerank.py).

Multigraph semantics: parallel edges contribute multiple times (out_degree
counts parallel edges) — consistent with the engine's degree kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import (
    VertexProgram,
    build_graph_partitions,
    final_state,
    local_col,
    run_supersteps,
)


class PageRankProgram(VertexProgram):
    name = "pagerank"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("contrib", pa.float64())]
    )

    def __init__(self, damping: float = 0.85, tol: float = 1e-9):
        self.damping = damping
        self.tol = tol
        self.params = {"damping": damping, "tol": tol}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame(
            {"id": ids, "rank": np.full(len(ids), 1.0 / n_total),
             "out_degree": out_degree}
        )

    def gather_arrow(self, t, state_of, global_vals):
        """Arrow-native gather: numpy views straight off the edge block —
        no to_pandas copy (superstep engine fast path)."""
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        out_u, out_s = [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            contrib = (
                st["rank"].to_numpy()[pos]
                / np.maximum(st["out_degree"].to_numpy()[pos], 1)
            )
            # combiner: unique+bincount is ~3x faster than pandas groupby
            u, inv = np.unique(dst_all[m], return_inverse=True)
            out_u.append(u)
            out_s.append(np.bincount(inv, weights=contrib))
        if not out_u:
            return {"dst": np.array([], np.int64),
                    "contrib": np.array([], np.float64)}
        # cross-part combine: merge the per-src-part partials so each
        # batch emits EXACTLY one row per dst (bound = #edge blocks, the
        # skew-probe contract) — the partials are far smaller than the
        # edge rows, so this second unique is cheap relative to the
        # shuffle rows it removes
        dstc = np.concatenate(out_u)
        cc = np.concatenate(out_s)
        u2, inv2 = np.unique(dstc, return_inverse=True)
        return {"dst": u2, "contrib": np.bincount(inv2, weights=cc)}

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        sums = np.zeros(len(sid))
        if len(msgs):
            u, inv = np.unique(msgs["dst"].to_numpy(), return_inverse=True)
            agg = np.bincount(inv, weights=msgs["contrib"].to_numpy())
            pos = np.searchsorted(sid, u)
            sums[pos] = agg
        d = self.damping
        n = global_vals["n_total"]
        dang = global_vals["dangling_mass"]
        new_rank = (1.0 - d) / n + d * (sums + dang / n)
        old = state["rank"].to_numpy()
        out = state.copy()
        out["rank"] = new_rank
        dangling = state["out_degree"].to_numpy() == 0
        return out, {
            "delta": float(np.abs(new_rank - old).sum()),
            "dangling_next": float(new_rank[dangling].sum()),
            "rank_sum": float(new_rank.sum()),
            "n": len(out),
        }

    def init_metrics(self, state):
        dangling = state["out_degree"].to_numpy() == 0
        return {"dangling_next": float(state["rank"].to_numpy()[dangling].sum())}

    def globals_from_metrics(self, metrics, n_total):
        dang = (
            float(metrics["dangling_next"].fillna(0.0).sum())
            if "dangling_next" in metrics.columns else 0.0
        )
        return {"n_total": n_total, "dangling_mass": dang}

    def converged(self, metrics):
        return "delta" in metrics.columns and float(metrics["delta"].sum()) < self.tol


def pagerank(
    edges: Dataset,
    workdir: str,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
    num_parts: int = 8,
    resume: bool = True,
    info: dict | None = None,
) -> tuple[Dataset, dict]:
    """Build partitions (if absent), run to convergence; returns
    ((id, rank) Dataset, run info with per-superstep timings/edges-per-sec)."""
    import json
    import os

    import ray.data as rd

    from ..state import checkpoint as ckpt
    from .superstep import _load_graph_meta, load_edge_blocks

    if info is None:
        info = _load_graph_meta(workdir)
        if info is None:
            info = build_graph_partitions(edges, workdir, num_parts)
    prog = PageRankProgram(damping, tol)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    ranks = final_state(workdir).select_columns(["id", "rank"])
    return ranks, {**run, **info}
