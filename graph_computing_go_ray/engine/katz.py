"""Katz centrality as a gather-scatter superstep program (same skeleton
as engine/pagerank.py).

Jacobi iteration of the standard fixpoint (Katz 1953, public formulation):
    x_{k+1}(v) = alpha * sum_{u->v} x_k(u) + beta,   x_0 = beta
which converges to (I - alpha A^T)^{-1} beta when alpha < 1/rho(A).
The wrapper picks a provably contractive alpha from the graph itself:
alpha = ratio / max_out_degree makes the iteration an L1 contraction
(column sums of A^T are the out-degrees), so no spectral estimate is
needed. Convergence: L1 delta < tol.

Per-vertex parity target: allclose 1e-9 against a numpy replica of the
same Jacobi iteration (tests/test_graph_extras.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


class KatzProgram(VertexProgram):
    name = "katz"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("contrib", pa.float64())]
    )

    def __init__(self, alpha: float, beta: float = 1.0, tol: float = 1e-12):
        self.alpha = alpha
        self.beta = beta
        self.tol = tol
        self.params = {"alpha": alpha, "beta": beta, "tol": tol}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame(
            {"id": ids, "katz": np.full(len(ids), self.beta, np.float64)}
        )

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            contrib = st["katz"].to_numpy()[pos]
            dst = edges["dst"].to_numpy()[m]
            u, inv = np.unique(dst, return_inverse=True)
            sums = np.bincount(inv, weights=contrib)
            outs.append(pd.DataFrame({"dst": u, "contrib": sums}))
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        sums = np.zeros(len(sid))
        if len(msgs):
            u, inv = np.unique(msgs["dst"].to_numpy(), return_inverse=True)
            agg = np.bincount(inv, weights=msgs["contrib"].to_numpy())
            pos = np.searchsorted(sid, u)
            sums[pos] = agg
        new = self.alpha * sums + self.beta
        old = state["katz"].to_numpy()
        out = state.copy()
        out["katz"] = new
        return out, {"delta": float(np.abs(new - old).sum()), "n": len(out)}

    def converged(self, metrics):
        return "delta" in metrics.columns and float(metrics["delta"].sum()) < self.tol


def katz_centrality(
    edges: Dataset,
    workdir: str,
    alpha: float | None = None,
    beta: float = 1.0,
    ratio: float = 0.85,
    tol: float = 1e-12,
    max_iters: int = 200,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, katz) Dataset, run info). When alpha is None it is derived as
    ratio / max_out_degree — contractive for ANY graph, one cheap degree
    aggregate (no spectral estimation)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts)
    if alpha is None:
        from .degrees import grouped_count

        max_out = int(grouped_count(edges, "src", "n").max("n"))
        alpha = ratio / max(max_out, 1)
    prog = KatzProgram(alpha, beta, tol)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    ranks = final_state(workdir).select_columns(["id", "katz"])
    return ranks, {**run, **info, "alpha": alpha}
