"""Approximate betweenness centrality by sampled-source Brandes
(Brandes 2001; sampling estimator per Brandes & Pich 2007 — public
algorithms), as ONE two-phase superstep program.

For each sampled source s (k sources run simultaneously, one state-column
group each):

- **Forward phase** — synchronized BFS with path counting: a vertex is
  reached in the superstep equal to its hop distance, and ALL of its
  shortest-path predecessors were reached exactly one superstep earlier,
  so its path count sigma(v) is the one-round sum of its predecessors'
  sigmas. Vertices send sigma exactly once (the round after being
  reached).
- **Backward phase** — dependency accumulation by descending BFS layer:
  a global layer counter t walks D..1 (D = deepest layer over all
  sources, carried through the manifest metrics); layer-t vertices send
  (1 + delta_v)/sigma_v along REVERSED edges and receivers u accept only
  messages whose sender layer equals dist(u)+1 (shortest-path dags only),
  adding sigma_u * sum to delta_u.

Both directions travel in one doubled edge set tagged fwd/bwd (the
engine/hits.py idiom), so one partition build serves both phases; the
phase and layer counter derive from the previous superstep's metrics —
no driver-side state beyond the manifest.

Estimator: bc(v) = sum over sampled sources s != v of delta_s(v)
(unscaled pair-dependency sum — multiply by n/k for the population
estimate; the raw sum is what the parity oracle checks).

Parity: exact against a python Brandes replica on the same sources
(tests/test_graph_extras.py, 1e-9 — the message order inside one round
is a sum re-ordering, below 1e-9 at test scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


def _sum_by_dst(dst: np.ndarray, val: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    return d[starts], np.add.reduceat(v, starts)


class BrandesProgram(VertexProgram):
    name = "betweenness"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("sidx", pa.int64()),
         ("dval", pa.int64()), ("val", pa.float64())]
    )

    def __init__(self, seeds):
        self.seeds = [int(s) for s in seeds]
        self.params = {"seeds": sorted(self.seeds)}

    @property
    def k(self) -> int:
        return len(self.seeds)

    def init_state(self, ids, out_degree, in_degree, n_total):
        cols = {"id": ids}
        for i, s in enumerate(self.seeds):
            is_seed = ids == s
            cols[f"dist_{i}"] = np.where(is_seed, 0, -1).astype(np.int64)
            cols[f"sig_{i}"] = is_seed.astype(np.float64)
            cols[f"new_{i}"] = is_seed.astype(np.int8)
            cols[f"dlt_{i}"] = np.zeros(len(ids))
        return pd.DataFrame(cols)

    def init_metrics(self, state):
        mx = max(int(state[f"dist_{i}"].max()) for i in range(self.k))
        return {"f_changed": int(sum(state[f"new_{i}"].sum()
                                     for i in range(self.k))),
                "max_dist": mx}

    def globals_from_metrics(self, metrics, n_total):
        if "blayer_done" in metrics.columns:
            t = int(metrics["blayer_done"].max())
            return {"phase": "back", "blayer": t - 1}
        if "f_changed" in metrics.columns and int(metrics["f_changed"].sum()) == 0:
            return {"phase": "back", "blayer": int(metrics["max_dist"].max())}
        return {"phase": "fwd"}

    def converged(self, metrics):
        if "blayer_done" in metrics.columns:
            return int(metrics["blayer_done"].max()) <= 1
        # degenerate: forward found no vertex beyond the sources
        return ("f_changed" in metrics.columns
                and int(metrics["f_changed"].sum()) == 0
                and int(metrics["max_dist"].max()) == 0)

    def gather(self, edges, state_of, global_vals):
        phase = global_vals.get("phase", "fwd")
        outs = []
        part_arr = edges["part"].to_numpy()
        fwd_arr = edges["fwd"].to_numpy()
        want_fwd = 1 if phase == "fwd" else 0
        for p in np.unique(part_arr):
            m = (part_arr == p) & (fwd_arr == want_fwd)
            if not m.any():
                continue
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            src = edges["src"].to_numpy()[m]
            dst_all = edges["dst"].to_numpy()[m]
            pos = np.searchsorted(sid, src)
            for i in range(self.k):
                if phase == "fwd":
                    sel = st[f"new_{i}"].to_numpy()[pos] == 1
                    if not sel.any():
                        continue
                    layer = int(st[f"dist_{i}"].to_numpy()[pos][sel][0]) + 1
                    d, v = _sum_by_dst(dst_all[sel],
                                       st[f"sig_{i}"].to_numpy()[pos][sel])
                else:
                    t = global_vals["blayer"]
                    dv = st[f"dist_{i}"].to_numpy()[pos]
                    sel = dv == t
                    if not sel.any():
                        continue
                    layer = t
                    contrib = ((1.0 + st[f"dlt_{i}"].to_numpy()[pos][sel])
                               / st[f"sig_{i}"].to_numpy()[pos][sel])
                    d, v = _sum_by_dst(dst_all[sel], contrib)
                outs.append(pd.DataFrame(
                    {"dst": d, "sidx": np.int64(i),
                     "dval": np.int64(layer), "val": v}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "sidx": pd.Series([], dtype=np.int64),
                                 "dval": pd.Series([], dtype=np.int64),
                                 "val": pd.Series([], dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        phase = global_vals.get("phase", "fwd")
        sid = state["id"].to_numpy()
        out = state.copy()
        if phase == "fwd":
            changed = 0
            for i in range(self.k):
                new_col = np.zeros(len(sid), np.int8)
                if len(msgs):
                    mi = msgs[msgs["sidx"] == i]
                    if len(mi):
                        d, v = _sum_by_dst(mi["dst"].to_numpy(),
                                           mi["val"].to_numpy())
                        # dval is uniform (one BFS layer per round); take it
                        layer = int(mi["dval"].iloc[0])
                        pos = np.searchsorted(sid, d)
                        unreached = out[f"dist_{i}"].to_numpy()[pos] == -1
                        tp = pos[unreached]
                        dist = out[f"dist_{i}"].to_numpy()
                        sig = out[f"sig_{i}"].to_numpy()
                        dist[tp] = layer
                        sig[tp] = v[unreached]
                        new_col[tp] = 1
                        out[f"dist_{i}"] = dist
                        out[f"sig_{i}"] = sig
                        changed += int(unreached.sum())
                out[f"new_{i}"] = new_col
            mx = max(int(out[f"dist_{i}"].max()) for i in range(self.k))
            return out, {"f_changed": changed, "max_dist": mx, "n": len(out)}
        # backward
        t = global_vals["blayer"]
        if len(msgs):
            for i in range(self.k):
                mi = msgs[(msgs["sidx"] == i)]
                if not len(mi):
                    continue
                d, v = _sum_by_dst(mi["dst"].to_numpy(), mi["val"].to_numpy())
                pos = np.searchsorted(sid, d)
                # accept only shortest-path-dag edges: sender layer (== t,
                # uniform this round) must be the receiver's dist + 1
                ok = out[f"dist_{i}"].to_numpy()[pos] == t - 1
                dlt = out[f"dlt_{i}"].to_numpy()
                sig = out[f"sig_{i}"].to_numpy()
                tp = pos[ok]
                dlt[tp] += sig[tp] * v[ok]
                out[f"dlt_{i}"] = dlt
        return out, {"blayer_done": t, "n": len(out)}


def betweenness_sampled(
    edges: Dataset,
    seeds,
    workdir: str,
    max_iters: int = 200,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, bc) Dataset — raw pair-dependency sum over the sampled
    sources, excluding each source's own row contribution — , run info).
    Pass a DISTINCT edge set for simple-graph semantics (parallel edge
    rows each count as a path)."""
    from .hits import doubled_edges
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        dbl = doubled_edges(edges).map_batches(
            lambda t: pa.table({
                "src": t["src"], "dst": t["dst"],
                # dir=0 rows are the original orientation (forward BFS);
                # dir=1 rows are reversed (backward accumulation)
                "fwd": pa.array(
                    (1 - t["dir"].to_numpy(zero_copy_only=False)).astype(np.int8)),
            }),
            batch_format="pyarrow",
        )
        info = build_graph_partitions(dbl, workdir, num_parts,
                                      edge_attrs=("fwd",))
    prog = BrandesProgram(seeds)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)

    seeds_arr = np.asarray(sorted(int(s) for s in seeds), np.int64)
    k = len(seeds_arr)
    cols = ["id"] + [f"dlt_{i}" for i in range(k)]

    def fold(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        bc = np.zeros(len(ids))
        for i, s in enumerate(prog.seeds):
            d = t[f"dlt_{i}"].to_numpy(zero_copy_only=False)
            bc += np.where(ids == s, 0.0, d)
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "bc": pa.array(bc, pa.float64())})

    out = final_state(workdir).select_columns(
        ["id"] + [f"dlt_{i}" for i in range(k)]
    ).map_batches(fold, batch_format="pyarrow")
    return out, {**run, **info}
