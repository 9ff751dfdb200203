"""[north-rule] Semi-supervised label spreading on the superstep engine:
seed vertices hold fixed ground-truth labels; every other vertex adopts
the majority label among its labeled in-neighbors each round (ties to the
SMALLEST label, unlabeled neighbors abstain). The transductive
kNN-graph classifier of Zhu & Ghahramani (2002), run as synchronous
supersteps with block-level (dst, label, count) combiners — identical
message shape to engine/labelprop.py, so hot vertices receive at most
#edge-blocks partial rows.

No counterpart in /root/reference (beyond-reference operator); exact
replica pytest in tests/test_textops.py."""

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

UNLABELED = -1


class LabelSpreadProgram(VertexProgram):
    name = "label_spread"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("label", pa.int64()), ("cnt", pa.int64())]
    )

    def __init__(self, seed_labels: dict[int, int]):
        # seed map ships once inside the (pickled) program — bounded by
        # the seed count; at corpus scale seeds would ride the state
        # shards from a join instead (same init_state contract)
        self._ids = np.sort(np.array(list(seed_labels), np.int64))
        self._labs = np.array([seed_labels[i] for i in self._ids], np.int64)
        self.params = {"n_seeds": len(self._ids)}

    def init_state(self, ids, out_degree, in_degree, n_total):
        lab = np.full(len(ids), UNLABELED, np.int64)
        if len(self._ids):
            pos = np.searchsorted(self._ids, ids).clip(
                max=len(self._ids) - 1)
            hit = self._ids[pos] == ids
            lab[hit] = self._labs[pos[hit]]
        return pd.DataFrame({"id": ids, "label": lab,
                             "is_seed": (lab != UNLABELED).astype(np.int64)})

    def gather_arrow(self, t, state_of, global_vals):
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
            keep = lab != UNLABELED
            lab, dst = lab[keep], dst[keep]
            if not len(dst):
                continue
            order = np.lexsort((lab, dst))
            ds_, lb = dst[order], lab[order]
            new = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (lb[1:] != lb[:-1])])
            starts = np.flatnonzero(new)
            counts = np.diff(np.concatenate([starts, [len(ds_)]]))
            out_d.append(ds_[starts])
            out_l.append(lb[starts])
            out_c.append(counts)
        if not out_d:
            z = np.array([], np.int64)
            return {"dst": z, "label": z, "cnt": z}
        return {"dst": np.concatenate(out_d),
                "label": np.concatenate(out_l),
                "cnt": np.concatenate(out_c)}

    def gather(self, edges, state_of, global_vals):
        t = pa.table({"part": pa.array(edges["part"].to_numpy()),
                      "src": pa.array(edges["src"].to_numpy()),
                      "dst": pa.array(edges["dst"].to_numpy())})
        return pd.DataFrame(self.gather_arrow(t, state_of, global_vals))

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        new_label = state["label"].to_numpy().copy()
        if len(msgs):
            agg = msgs.groupby(["dst", "label"], as_index=False)["cnt"].sum()
            agg = agg.sort_values(
                ["dst", "cnt", "label"], ascending=[True, False, True]
            ).groupby("dst", as_index=False).first()
            pos = np.searchsorted(sid, agg["dst"].to_numpy())
            free = state["is_seed"].to_numpy()[pos] == 0
            new_label[pos[free]] = agg["label"].to_numpy()[free]
        changed = int((new_label != state["label"].to_numpy()).sum())
        out = state.copy()
        out["label"] = new_label
        return out, {"changed": changed, "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}

    def converged(self, metrics):
        return ("changed" in metrics.columns
                and int(metrics["changed"].sum()) == 0)


def label_spread(
    edges: Dataset, seed_labels: dict[int, int], workdir: str,
    max_iters: int = 10, num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, label, is_seed) after spreading, run info). Edges are used
    DIRECTED: a vertex gathers labels from its in-neighbors (pass
    (src=neighbor, dst=vertex) rows — e.g. a kNN edge list)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts)
    prog = LabelSpreadProgram(seed_labels)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).select_columns(["id", "label", "is_seed"])
    return out, {**run, **info}


def spread_replica(src: np.ndarray, dst: np.ndarray, ids: np.ndarray,
                   seed_labels: dict[int, int],
                   max_iters: int = 10) -> np.ndarray:
    """Exact single-process replica (pytest oracle): same majority rule,
    same tie-break, same synchronous rounds, same fixpoint stop."""
    ids = np.sort(ids)
    lab = np.full(len(ids), UNLABELED, np.int64)
    for k, v in seed_labels.items():
        lab[np.searchsorted(ids, k)] = v
    is_seed = lab != UNLABELED
    spos = np.searchsorted(ids, src)
    dpos = np.searchsorted(ids, dst)
    for _ in range(max_iters):
        m = lab[spos] != UNLABELED
        if not m.any():
            break
        df = pd.DataFrame({"dst": dpos[m], "label": lab[spos][m]})
        agg = df.groupby(["dst", "label"], as_index=False).size()
        agg = agg.sort_values(["dst", "size", "label"],
                              ascending=[True, False, True]
                              ).groupby("dst", as_index=False).first()
        new = lab.copy()
        pos = agg["dst"].to_numpy()
        free = ~is_seed[pos]
        new[pos[free]] = agg["label"].to_numpy()[free]
        if (new == lab).all():
            break
        lab = new
    return lab
