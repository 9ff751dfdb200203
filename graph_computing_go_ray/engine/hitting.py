"""[north-rule] Expected hitting time of a target vertex set under the
simple random walk on the SYMMETRIZED graph, via fixed-round Jacobi
iteration on the superstep engine.

System solved: h(v) = 0 for v in T; h(v) = 1 + mean_{u ~ v} h(u) otherwise
(the standard first-step recurrence; Lovász, "Random walks on graphs").
Each Jacobi round is one superstep: every vertex pushes its current h to
its neighbors (block combiner pre-sums per destination, so a hot vertex
receives at most #edge-blocks partials), and the reducer applies
1 + hsum/deg outside T.

Runs a FIXED number of rounds (iteration-count parity with the pytest
replica; early-stop would make parity depend on float summation order).
Vertices whose component does not contain T never converge — their h
increments by ~1 per round forever — so the finalizer reports h only for
vertices whose last Jacobi delta fell below ``reach_tol`` and emits -1.0
for the rest (T itself reports 0.0). Values for converged vertices are
within O(spectral-gap decay) of the true hitting time; tests compare
against a same-round numpy replica at 1e-9 and against the exact linear
solve loosely.

No counterpart in /root/reference (beyond-reference operator).
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


class HittingTimeProgram(VertexProgram):
    name = "hitting_time"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("hsum", pa.float64())]
    )

    def __init__(self, targets: np.ndarray | None, rounds: int,
                 target_mod: int | None = None):
        """Target set: either an explicit id array (tests, small sets) or
        the pure rule id % target_mod == 0 — the rule form never collects
        ids on the driver, which is the right shape at 10^12 vertices."""
        self.targets = (None if targets is None
                        else np.sort(np.asarray(targets, np.int64)))
        self.target_mod = target_mod
        self.rounds = rounds
        self.params = {"rounds": rounds, "target_mod": target_mod,
                       "n_targets": -1 if targets is None else len(self.targets)}

    def _is_t(self, ids: np.ndarray) -> np.ndarray:
        if self.target_mod is not None:
            return ids % self.target_mod == 0
        pos = np.searchsorted(self.targets, ids).clip(
            max=max(len(self.targets) - 1, 0))
        return (len(self.targets) > 0) & (self.targets[pos] == ids)

    def init_state(self, ids, out_degree, in_degree, n_total):
        is_t = self._is_t(ids)
        return pd.DataFrame({
            "id": ids,
            "h": np.zeros(len(ids), np.float64),
            "delta": np.zeros(len(ids), np.float64),
            # symmetrized graph: out_degree == #neighbors (multigraph)
            "deg": out_degree.astype(np.float64),
            "is_t": is_t.astype(np.int64),
            "round": np.zeros(len(ids), np.int64),
        })

    def gather_arrow(self, t, state_of, global_vals):
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        out_d, out_h = [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            h = st["h"].to_numpy()[pos]
            dst = dst_all[m]
            order = np.argsort(dst, kind="stable")
            ds_, hs = dst[order], h[order]
            new = np.concatenate([[True], ds_[1:] != ds_[:-1]])
            starts = np.flatnonzero(new)
            ends = np.concatenate([starts[1:], [len(ds_)]])
            seg = np.add.reduceat(hs, starts) if len(starts) else hs[:0]
            out_d.append(ds_[starts])
            out_h.append(seg)
        if not out_d:
            return {"dst": np.array([], np.int64),
                    "hsum": np.array([], np.float64)}
        return {"dst": np.concatenate(out_d),
                "hsum": np.concatenate(out_h)}

    def gather(self, edges, state_of, global_vals):
        t = pa.table({"part": pa.array(edges["part"].to_numpy()),
                      "src": pa.array(edges["src"].to_numpy()),
                      "dst": pa.array(edges["dst"].to_numpy())})
        return pd.DataFrame(self.gather_arrow(t, state_of, global_vals))

    def reduce_apply(self, state, msgs, global_vals):
        rnd = int(state["round"].iloc[0]) if len(state) else 0
        sid = state["id"].to_numpy()
        hsum = np.zeros(len(sid), np.float64)
        if len(msgs):
            agg = msgs.groupby("dst", as_index=False)["hsum"].sum()
            pos = np.searchsorted(sid, agg["dst"].to_numpy())
            hsum[pos] = agg["hsum"].to_numpy()
        deg = state["deg"].to_numpy()
        is_t = state["is_t"].to_numpy() == 1
        old = state["h"].to_numpy()
        new = np.where(is_t | (deg == 0), 0.0,
                       1.0 + hsum / np.maximum(deg, 1.0))
        out = state.copy()
        out["h"] = new
        out["delta"] = np.abs(new - old)
        out["round"] = rnd + 1
        return out, {"n": len(out), "done_round": rnd + 1,
                     "max_delta": float(np.abs(new - old).max(initial=0.0))}

    def converged(self, metrics):
        return ("done_round" in metrics.columns
                and int(metrics["done_round"].max()) >= self.rounds)


def hitting_times(
    edges: Dataset, targets, workdir: str, rounds: int = 80,
    num_parts: int = 8, reach_tol: float = 1e-3, resume: bool = True,
    target_mod: int | None = None,
) -> tuple[Dataset, dict]:
    """((id, hitting_time) with -1.0 sentinel for not-converged/unreachable
    vertices, run info). Targets report 0.0. Pass target_mod (and
    targets=None) for the driver-scale rule form."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=True)
    prog = HittingTimeProgram(
        None if targets is None else np.asarray(list(targets), np.int64),
        rounds, target_mod=target_mod)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=rounds, resume=resume)

    def fin(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        delta = t["delta"].to_numpy(zero_copy_only=False)
        is_t = t["is_t"].to_numpy(zero_copy_only=False) == 1
        ok = is_t | (delta <= reach_tol)
        return pa.table({
            "id": t["id"],
            "hitting_time": pa.array(np.where(ok, h, -1.0), pa.float64()),
        })

    out = final_state(workdir).map_batches(fin, batch_format="pyarrow")
    return out, {**run, **info}


def hitting_replica(src: np.ndarray, dst: np.ndarray, ids: np.ndarray,
                    targets: np.ndarray, rounds: int = 80,
                    reach_tol: float = 1e-3) -> np.ndarray:
    """Same-round single-process Jacobi replica (pytest oracle)."""
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ids = np.sort(ids)
    n = len(ids)
    spos = np.searchsorted(ids, s)
    dpos = np.searchsorted(ids, d)
    deg = np.zeros(n, np.float64)
    np.add.at(deg, spos, 1.0)
    is_t = np.isin(ids, targets)
    h = np.zeros(n, np.float64)
    delta = np.zeros(n, np.float64)
    for _ in range(rounds):
        hsum = np.zeros(n, np.float64)
        np.add.at(hsum, dpos, h[spos])
        new = np.where(is_t | (deg == 0), 0.0, 1.0 + hsum / np.maximum(deg, 1.0))
        delta = np.abs(new - h)
        h = new
    ok = is_t | (delta <= reach_tol)
    return np.where(ok, h, -1.0)
