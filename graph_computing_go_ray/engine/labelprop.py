"""[north-rule] Synchronous label propagation (community detection).

Per superstep every vertex adopts the most frequent label among its
in-neighbors on the symmetrized edge set; ties break to the SMALLEST label
(deterministic, SURVEY §2.10). Vertices with no neighbors keep their label.
Synchronous LPA can oscillate on bipartite-ish structures, so the driver
caps iterations (max_iters) in addition to the no-change fixpoint.

Messages are pre-aggregated per block as (dst, label, cnt) partial counts —
the combiner keeps hot vertices from fanning in raw edges."""

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


class LabelPropProgram(VertexProgram):
    name = "label_propagation"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("label", pa.int64()), ("cnt", pa.int64())]
    )

    def __init__(self, max_stable: int = 1):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({"id": ids, "label": ids})

    def gather_arrow(self, t, state_of, global_vals):
        """Arrow-native gather (superstep fast path): the same
        lexsort+run-length combiner straight off process-local copies of
        the edge block columns — no to_pandas of the block."""
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        out_d, out_l, out_c = [], [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            lab = st["label"].to_numpy()[pos]
            dst = dst_all[m]
            order = np.lexsort((lab, dst))
            ds_, lb = dst[order], lab[order]
            new = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (lb[1:] != lb[:-1])]
            )
            starts = np.flatnonzero(new)
            counts = np.diff(np.concatenate([starts, [len(ds_)]]))
            out_d.append(ds_[starts])
            out_l.append(lb[starts])
            out_c.append(counts)
        if not out_d:
            return {"dst": np.array([], np.int64),
                    "label": np.array([], np.int64),
                    "cnt": np.array([], np.int64)}
        # cross-part combine: sum cnt per (dst, label) so each batch emits
        # one row per (dst, label) — same bound the skew probe asserts
        dc = np.concatenate(out_d)
        lc = np.concatenate(out_l)
        cc = np.concatenate(out_c)
        order = np.lexsort((lc, dc))
        ds_, lb, ct = dc[order], lc[order], cc[order]
        new = np.concatenate(
            [[True], (ds_[1:] != ds_[:-1]) | (lb[1:] != lb[:-1])]
        )
        starts = np.flatnonzero(new)
        return {"dst": ds_[starts], "label": lb[starts],
                "cnt": np.add.reduceat(ct, starts)}

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            lab = st["label"].to_numpy()[pos]
            dst = edges["dst"].to_numpy()[m]
            # per-(dst,label) counts via lexsort + run-length (no pandas)
            order = np.lexsort((lab, dst))
            ds_, lb = dst[order], lab[order]
            new = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (lb[1:] != lb[:-1])]
            )
            starts = np.flatnonzero(new)
            counts = np.diff(np.concatenate([starts, [len(ds_)]]))
            outs.append(pd.DataFrame(
                {"dst": ds_[starts], "label": lb[starts], "cnt": counts}
            ))
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        new_label = state["label"].to_numpy().copy()
        if len(msgs):
            agg = msgs.groupby(["dst", "label"], as_index=False)["cnt"].sum()
            # argmax count, tie -> min label: sort by (dst, -cnt, label), first
            agg = agg.sort_values(
                ["dst", "cnt", "label"], ascending=[True, False, True]
            ).groupby("dst", as_index=False).first()
            pos = np.searchsorted(sid, agg["dst"].to_numpy())
            new_label[pos] = agg["label"].to_numpy()
        changed = int((new_label != state["label"].to_numpy()).sum())
        out = state.copy()
        out["label"] = new_label
        return out, {"changed": changed, "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0


def label_propagation(
    edges: Dataset, workdir: str, max_iters: int = 20,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    import json
    import os

    import ray.data as rd

    from ..state import checkpoint as ckpt
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts, symmetrize=True)
    prog = LabelPropProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    labels = final_state(workdir).select_columns(["id", "label"])
    return labels, {**run, **info}
