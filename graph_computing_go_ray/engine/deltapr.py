"""[north-rule] Residual-push ("delta") PageRank — the frontier-adaptive
alternative to power iteration (Andersen-Chung-Lang push, run as
synchronous supersteps; Berkhin, "Bookmark-coloring algorithm").

State per vertex: (rank, residual). A superstep pushes every vertex whose
residual exceeds ``theta``: rank absorbs the residual and d*res/outdeg is
offered along each out-edge (dangling residual spreads uniformly through
one global scalar, exactly like the power-iteration engine's dangling
mass). Vertices below ``theta`` hold their residual — on a power-law
graph the frontier collapses to the hubs within a few rounds, so total
pushed-edge work to a given accuracy undercuts full sweeps (the
measured ratio is recorded in BASELINE.md).

Invariant: true_rank = rank + (I - d P^T)^{-1} residual, so at
termination (global residual mass < tol) absorbing the leftover residual
into rank leaves L1 error <= d * tol / (1-d).

Parity: exact same-round replica (tests/test_superstep.py) plus allclose
agreement with the power-iteration engine at the solver tolerance.
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


class DeltaPageRankProgram(VertexProgram):
    name = "delta_pagerank"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("contrib", pa.float64())]
    )

    def __init__(self, damping: float = 0.85, tol: float = 1e-9,
                 theta: float = 0.0):
        self.damping = damping
        self.tol = tol
        self.theta = theta
        self.params = {"damping": damping, "tol": tol, "theta": theta}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({
            "id": ids,
            "rank": np.zeros(len(ids)),
            "res": np.full(len(ids), (1.0 - self.damping) / n_total),
            "out_degree": out_degree,
        })

    def gather_arrow(self, t, state_of, global_vals):
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        d = self.damping
        out_u, out_s = [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            res = st["res"].to_numpy()[pos]
            pushed = res > self.theta
            if not pushed.any():
                continue
            contrib = (d * res[pushed]
                       / np.maximum(st["out_degree"].to_numpy()[pos][pushed],
                                    1))
            u, inv = np.unique(dst_all[m][pushed], return_inverse=True)
            out_u.append(u)
            out_s.append(np.bincount(inv, weights=contrib))
        if not out_u:
            return {"dst": np.array([], np.int64),
                    "contrib": np.array([], np.float64)}
        return {"dst": np.concatenate(out_u),
                "contrib": np.concatenate(out_s)}

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        incoming = np.zeros(len(sid))
        if len(msgs):
            u, inv = np.unique(msgs["dst"].to_numpy(), return_inverse=True)
            agg = np.bincount(inv, weights=msgs["contrib"].to_numpy())
            incoming[np.searchsorted(sid, u)] = agg
        d = self.damping
        n = global_vals["n_total"]
        dang = global_vals["dangling_push"]
        old_res = state["res"].to_numpy()
        pushed = old_res > self.theta
        rank = state["rank"].to_numpy() + np.where(pushed, old_res, 0.0)
        res = (np.where(pushed, 0.0, old_res) + incoming + d * dang / n)
        dangling = state["out_degree"].to_numpy() == 0
        out = state.copy()
        out["rank"] = rank
        out["res"] = res
        will_push = res > self.theta
        return out, {
            "res_sum": float(res.sum()),
            "pushed": int(pushed.sum()),
            "dangling_push_next": float(res[dangling & will_push].sum()),
            "n": len(out),
        }

    def init_metrics(self, state):
        dangling = state["out_degree"].to_numpy() == 0
        res = state["res"].to_numpy()
        return {"dangling_push_next":
                float(res[dangling & (res > self.theta)].sum()),
                "res_sum": float(res.sum())}

    def globals_from_metrics(self, metrics, n_total):
        dang = (float(metrics["dangling_push_next"].fillna(0.0).sum())
                if "dangling_push_next" in metrics.columns else 0.0)
        return {"n_total": n_total, "dangling_push": dang}

    def converged(self, metrics):
        if "res_sum" not in metrics.columns:
            return False
        if float(metrics["res_sum"].sum()) < self.tol:
            return True
        # frontier empty: every residual <= theta — nothing will ever
        # move again (the held mass, <= n*theta, is the documented error)
        return ("pushed" in metrics.columns
                and int(metrics["pushed"].sum()) == 0)


def delta_pagerank(
    edges: Dataset, workdir: str, damping: float = 0.85, tol: float = 1e-9,
    theta: float = 0.0, max_iters: int = 300, num_parts: int = 8,
    resume: bool = True, info: dict | None = None,
) -> tuple[Dataset, dict]:
    """((id, rank) with the leftover residual absorbed, run info with
    per-round pushed-vertex counts in run['metrics_history'] if kept)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    if info is None:
        info = _load_graph_meta(workdir)
        if info is None:
            info = build_graph_partitions(edges, workdir, num_parts)
    prog = DeltaPageRankProgram(damping, tol, theta)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"],
            "rank": pa.array(
                t["rank"].to_numpy(zero_copy_only=False)
                + t["res"].to_numpy(zero_copy_only=False), pa.float64()),
        })

    ranks = final_state(workdir).map_batches(fin, batch_format="pyarrow")
    return ranks, {**run, **info}


def delta_pagerank_replica(src: np.ndarray, dst: np.ndarray,
                           ids: np.ndarray, damping: float = 0.85,
                           tol: float = 1e-9, theta: float = 0.0,
                           max_iters: int = 300) -> np.ndarray:
    """Same-round single-process replica (pytest oracle): synchronous
    push with the identical theta mask, dangling handling and stop rule."""
    ids = np.sort(ids)
    n = len(ids)
    spos = np.searchsorted(ids, src)
    dpos = np.searchsorted(ids, dst)
    outd = np.zeros(n, np.int64)
    np.add.at(outd, spos, 1)
    dangling = outd == 0
    d = damping
    rank = np.zeros(n)
    res = np.full(n, (1.0 - d) / n)
    dang = float(res[dangling & (res > theta)].sum())
    for _ in range(max_iters):
        if res.sum() < tol or not (res > theta).any():
            break
        pushed = res > theta
        contrib = np.zeros(n)
        m = pushed[spos]
        np.add.at(contrib, dpos[m],
                  d * res[spos][m] / np.maximum(outd[spos][m], 1))
        rank = rank + np.where(pushed, res, 0.0)
        res = np.where(pushed, 0.0, res) + contrib + d * dang / n
        dang = float(res[dangling & (res > theta)].sum())
    return rank + res
