"""[north-rule] HITS (hubs & authorities) as a partitioned gather-scatter
superstep program — a second eigenvector-style ranking alongside PageRank,
part of the link-graph analytics surface (public algorithm: Kleinberg 1999).

Simultaneous-update power iteration on the directed edge set:
    a_{k+1}(v) = sum_{u->v} h_k(u)        (authorities from hubs)
    h_{k+1}(u) = sum_{u->v} a_k(v)        (hubs from authorities)
with L2 normalization each step. The engine partitions edges by the
message SENDER, so the graph is materialized as the doubled edge set
(u, v, dir=0) + (v, u, dir=1): dir=0 rows carry hub(src) -> auth(dst),
dir=1 rows carry auth(src) -> hub(dst) — one gather covers both halves.

Normalization without an extra pass: state shards hold RAW (unnormalized)
values; the global L2 norms of the previous iteration travel in
global_vals, and gather divides contributions by them — messages are
therefore built from the NORMALIZED previous vector, exactly matching
the textbook iteration. Convergence is checked on the cosine similarity
between successive normalized hub/auth vectors, computed on the driver
from per-part (dot, sq_old, sq_new) sums — no extra shuffle.

Parity oracle: numpy power iteration of the same formulation
(tests/test_superstep.py), allclose 1e-6 per vertex at convergence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


def _sum_by_dst(dst: np.ndarray, val: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-dst sums via sort + reduceat (block combiner, no pandas groupby)."""
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    return d[starts], np.add.reduceat(v, starts)


class HitsProgram(VertexProgram):
    name = "hits"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("a_sum", pa.float64()), ("h_sum", pa.float64())]
    )

    def __init__(self, tol: float = 1e-8):
        self.tol = tol
        self.params = {"tol": tol}

    def init_state(self, ids, out_degree, in_degree, n_total):
        v = np.full(len(ids), 1.0 / np.sqrt(n_total))
        return pd.DataFrame({"id": ids, "hub": v, "auth": v})

    def init_metrics(self, state):
        # seed the norm globals: the init vector is already L2-normalized,
        # so per-part raw sq sums give ||h_0|| = ||a_0|| = 1
        return {
            "hub_sq": float((state["hub"].to_numpy() ** 2).sum()),
            "auth_sq": float((state["auth"].to_numpy() ** 2).sum()),
            # cosine bookkeeping columns (absent deltas on iter 0)
            "hub_dot": np.nan, "auth_dot": np.nan,
            "hub_sq_old": np.nan, "auth_sq_old": np.nan,
        }

    def globals_from_metrics(self, metrics, n_total):
        return {
            "hub_norm": float(np.sqrt(max(metrics["hub_sq"].sum(), 1e-300))),
            "auth_norm": float(np.sqrt(max(metrics["auth_sq"].sum(), 1e-300))),
        }

    def gather(self, edges, state_of, global_vals):
        hn, an = global_vals["hub_norm"], global_vals["auth_norm"]
        outs = []
        part_arr = edges["part"].to_numpy()
        dir_arr = edges["dir"].to_numpy()
        src_arr = edges["src"].to_numpy()
        dst_arr = edges["dst"].to_numpy()
        for p in np.unique(part_arr):
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            for d, col, norm, out_col in (
                (0, "hub", hn, "a_sum"),   # u->v: normalized hub(u) feeds auth(v)
                (1, "auth", an, "h_sum"),  # reversed: normalized auth(v) feeds hub(u)
            ):
                m = (part_arr == p) & (dir_arr == d)
                if not m.any():
                    continue
                pos = np.searchsorted(sid, src_arr[m])
                contrib = st[col].to_numpy()[pos] / norm
                u, s = _sum_by_dst(dst_arr[m], contrib)
                df = pd.DataFrame({"dst": u, "a_sum": 0.0, "h_sum": 0.0})
                df[out_col] = s
                outs.append(df)
        if not outs:
            return pd.DataFrame({"dst": np.array([], np.int64),
                                 "a_sum": np.array([], np.float64),
                                 "h_sum": np.array([], np.float64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        new_a = np.zeros(len(sid))
        new_h = np.zeros(len(sid))
        if len(msgs):
            for col, acc in (("a_sum", new_a), ("h_sum", new_h)):
                u, s = _sum_by_dst(msgs["dst"].to_numpy(),
                                   msgs[col].to_numpy())
                acc[np.searchsorted(sid, u)] = s
        old_h = state["hub"].to_numpy()
        old_a = state["auth"].to_numpy()
        out = state.copy()
        out["hub"] = new_h
        out["auth"] = new_a
        # per-part sums for the driver's cosine convergence + next norms
        return out, {
            "hub_sq": float((new_h ** 2).sum()),
            "auth_sq": float((new_a ** 2).sum()),
            "hub_dot": float((new_h * old_h).sum()),
            "auth_dot": float((new_a * old_a).sum()),
            "hub_sq_old": float((old_h ** 2).sum()),
            "auth_sq_old": float((old_a ** 2).sum()),
            "n": len(out),
        }

    def converged(self, metrics):
        if "hub_dot" not in metrics.columns or metrics["hub_dot"].isna().any():
            return False
        eps = 1e-300
        ok = True
        for pre in ("hub", "auth"):
            dot = float(metrics[f"{pre}_dot"].sum())
            nn = float(np.sqrt(max(metrics[f"{pre}_sq"].sum(), eps)))
            no = float(np.sqrt(max(metrics[f"{pre}_sq_old"].sum(), eps)))
            ok = ok and (1.0 - dot / (nn * no)) < self.tol
        return ok


def doubled_edges(edges: Dataset) -> Dataset:
    """(src, dst, dir=0) + (dst, src, dir=1) — the HITS gather input."""

    def dbl(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([s, d]), pa.int64()),
            "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            "dir": pa.array(np.concatenate(
                [np.zeros(len(s), np.int8), np.ones(len(d), np.int8)])),
        })

    return edges.select_columns(["src", "dst"]).map_batches(
        dbl, batch_format="pyarrow"
    )


def hits(
    edges: Dataset,
    workdir: str,
    tol: float = 1e-8,
    max_iters: int = 100,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """Run HITS to convergence; returns ((id, hub, auth) Dataset with
    L2-normalized scores, run info)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(
            doubled_edges(edges), workdir, num_parts, edge_attrs=("dir",)
        )
    prog = HitsProgram(tol)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)

    # final state is raw; normalize once from the recorded global norms
    from ..state import checkpoint as ckpt

    man = ckpt.read_manifest(workdir, run["final_iter"])
    mdf = pd.DataFrame(man["metrics"])
    hn = float(np.sqrt(max(mdf["hub_sq"].sum(), 1e-300)))
    an = float(np.sqrt(max(mdf["auth_sq"].sum(), 1e-300)))

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"],
            "hub": pa.array(t["hub"].to_numpy(zero_copy_only=False) / hn),
            "auth": pa.array(t["auth"].to_numpy(zero_copy_only=False) / an),
        })

    ranks = final_state(workdir).select_columns(["id", "hub", "auth"]).map_batches(
        norm, batch_format="pyarrow"
    )
    return ranks, {**run, **info}
