"""k-core decomposition (coreness per vertex) — a graph kernel beyond the
reference's four algorithms, on the same superstep engine.

Algorithm: distributed h-index iteration (Lü, Zhou, Zhang & Stanley,
"The H-index of a network node and its relation to degree and coreness",
Nature Communications 2016 — public result): init estimate = degree; each
round a vertex's new estimate is the h-index of its neighbors' estimates,
capped by its own. Estimates decrease monotonically and converge exactly to
the peeling coreness.

Superstep shape: the gather combiner emits per-(dst, estimate) COUNT rows
(not one row per edge), so a hot vertex receives at most
(#blocks × #distinct estimate values) rows; the reduce computes every
vertex's h-index in one vectorized lexsort + cumsum + reduceat pass —
no per-vertex Python.

Input contract: a SIMPLE undirected graph — callers canonicalize to
distinct (min, max) pairs first (kcore() below does this); partitions are
built with symmetrize=True so degree = undirected degree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


def _hist_rows(dst: np.ndarray, val: np.ndarray) -> pd.DataFrame:
    """(dst, val) rows -> per-(dst, val) counts, vectorized."""
    order = np.lexsort((val, dst))
    d, v = dst[order], val[order]
    new = np.concatenate([[True], (d[1:] != d[:-1]) | (v[1:] != v[:-1])])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.concatenate([starts, [len(d)]]))
    return pd.DataFrame({"dst": d[starts], "val": v[starts],
                         "cnt": cnt.astype(np.int64)})


class CorenessProgram(VertexProgram):
    name = "kcore_hindex"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("val", pa.int64()), ("cnt", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        # symmetrized partitions: out_degree IS the undirected degree
        return pd.DataFrame({"id": ids, "core": out_degree.astype(np.int64)})

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            est = st["core"].to_numpy()[pos]
            outs.append(_hist_rows(edges["dst"].to_numpy()[m], est))
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        old = state["core"].to_numpy()
        new = old.copy()
        if len(msgs):
            # re-aggregate block partials (counts SUM across blocks), then
            # h-index per dst from the (value desc, cumulative count)
            # profile: h = max over rows of min(val, cum)
            df = msgs.groupby(["dst", "val"], as_index=False)["cnt"].sum()
            order = np.lexsort((-df["val"].to_numpy(), df["dst"].to_numpy()))
            d = df["dst"].to_numpy()[order]
            v = df["val"].to_numpy()[order]
            c = df["cnt"].to_numpy()[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            gcum = c.cumsum()
            base = np.repeat(np.concatenate([[0], gcum[starts[1:] - 1]]),
                             np.diff(np.concatenate([starts, [len(d)]])))
            cum = gcum - base
            cand = np.minimum(v, cum)
            h = np.maximum.reduceat(cand, starts)
            pos = np.searchsorted(sid, d[starts])
            new[pos] = np.minimum(new[pos], h)
        changed = int((new != old).sum())
        out = state.copy()
        out["core"] = new
        return out, {"changed": changed, "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0


def kcore(
    edges: Dataset, workdir: str, max_iters: int = 100,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """Coreness per vertex. Edges are canonicalized to distinct undirected
    (min, max) pairs, then symmetrized at partition build."""
    import pyarrow.compute as pc

    import ray.data as rd

    from ..state import checkpoint as ckpt
    from .degrees import distinct_pairs
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        def canon(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = s != d  # self loops don't affect coreness semantics here
            s, d = s[keep], d[keep]
            return pa.table(
                {"src": pa.array(np.minimum(s, d), pa.int64()),
                 "dst": pa.array(np.maximum(s, d), pa.int64())}
            )

        und = distinct_pairs(
            edges.map_batches(canon, batch_format="pyarrow"), ["src", "dst"]
        )
        info = build_graph_partitions(und, workdir, num_parts, symmetrize=True)
    prog = CorenessProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                        max_iters=max_iters, resume=resume)
    cores = final_state(workdir).select_columns(["id", "core"])
    return cores, {**run, **info}
