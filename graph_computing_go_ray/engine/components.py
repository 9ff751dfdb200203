"""[north-rule] Connected components via hash-min label propagation to
fixpoint on the symmetrized edge set. Component id = min vertex id in the
component (exact, deterministic). Converges when no label changes."""

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


class HashMinProgram(VertexProgram):
    name = "connected_components"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("label", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({"id": ids, "label": ids})

    def gather_arrow(self, t, state_of, global_vals):
        """Arrow-native gather (superstep fast path): numpy views off the
        edge block, per-dst min combiner via sort + reduceat."""
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        out_d, out_l = [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            lab = st["label"].to_numpy()[pos]
            dst = dst_all[m]
            order = np.argsort(dst, kind="stable")
            ds_, lb = dst[order], lab[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            out_d.append(ds_[starts])
            out_l.append(np.minimum.reduceat(lb, starts))
        if not out_d:
            return {"dst": np.array([], np.int64),
                    "label": np.array([], np.int64)}
        # cross-part combine: one min per dst per batch (bound = #batches,
        # the skew-probe contract; partials are tiny vs the edge rows)
        dc = np.concatenate(out_d)
        lc = np.concatenate(out_l)
        order = np.argsort(dc, kind="stable")
        ds_, lb = dc[order], lc[order]
        starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
        return {"dst": ds_[starts], "label": np.minimum.reduceat(lb, starts)}

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        new_label = state["label"].to_numpy().copy()
        if len(msgs):
            dst = msgs["dst"].to_numpy()
            lab = msgs["label"].to_numpy()
            order = np.argsort(dst, kind="stable")
            ds_, lb = dst[order], lab[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            pos = np.searchsorted(sid, ds_[starts])
            new_label[pos] = np.minimum(
                new_label[pos], np.minimum.reduceat(lb, starts)
            )
        changed = int((new_label != state["label"].to_numpy()).sum())
        out = state.copy()
        out["label"] = new_label
        return out, {"changed": changed, "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}  # force at least one superstep

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0


def connected_components(
    edges: Dataset, workdir: str, max_iters: int = 100,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """Edges are symmetrized at partition-build time (undirected CC)."""
    import json
    import os

    import ray.data as rd

    from ..state import checkpoint as ckpt
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts, symmetrize=True)
    prog = HashMinProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    if not run["converged"]:
        # hash-min needs O(diameter) supersteps; truncated labels silently
        # split components, so surface it (engine/scc.py raises for the
        # same reason — CC keeps a warning for backwards compatibility)
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iters} "
            f"supersteps ({workdir}); labels may split components",
            RuntimeWarning,
        )
    labels = final_state(workdir).select_columns(["id", "label"])
    return labels, {**run, **info}
