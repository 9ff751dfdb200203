"""Single-source (multi-seed) weighted shortest paths as a frontier
Bellman-Ford superstep program — the weighted generalization of
engine/bfs.py (public algorithm; the frontier form is the standard Pregel
SSSP).

Every superstep, vertices whose distance IMPROVED in the previous round
offer dist+w over their out-edges; receivers keep the minimum. Converges
when no vertex improves — #supersteps bounded by the hop count of the
longest shortest path (negative weights are rejected: they could demand
|V|-1 rounds and break the frontier optimization's early-exit reasoning
only under negative cycles, which have no shortest paths at all).

Edge weights ride in the CSR blocks as an edge attribute, so no
per-superstep join. Per-(block, dst) min combiners bound message volume
like BFS. Unreached vertices hold the sentinel -1 in the output.

Parity: exact against a python Dijkstra replica (integer weights in the
tests make distances exact; with float weights both sides compute the
same candidate sums, so min agrees).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps

_INF = np.float64(np.inf)


class SsspProgram(VertexProgram):
    name = "sssp"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("dist", pa.float64())]
    )

    def __init__(self, seeds):
        self.params = {"seeds": sorted(int(s) for s in seeds)}

    def init_state(self, ids, out_degree, in_degree, n_total):
        seeds = np.asarray(self.params["seeds"], np.int64)
        is_seed = np.isin(ids, seeds)
        return pd.DataFrame({
            "id": ids,
            "dist": np.where(is_seed, 0.0, _INF),
            "improved": is_seed.astype(np.int8),
        })

    def init_metrics(self, state):
        return {"changed": int(state["improved"].sum())}

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            frontier = st["improved"].to_numpy()[pos] == 1
            if not frontier.any():
                continue
            offer = (st["dist"].to_numpy()[pos][frontier]
                     + edges["w"].to_numpy()[m][frontier])
            dst = edges["dst"].to_numpy()[m][frontier]
            order = np.argsort(dst, kind="stable")
            d, of = dst[order], offer[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            outs.append(pd.DataFrame(
                {"dst": d[starts], "dist": np.minimum.reduceat(of, starts)}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.float64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        dist = state["dist"].to_numpy().copy()
        improved = np.zeros(len(sid), np.int8)
        if len(msgs):
            d = msgs["dst"].to_numpy()
            dm = msgs["dist"].to_numpy()
            order = np.argsort(d, kind="stable")
            dd, dmm = d[order], dm[order]
            starts = np.flatnonzero(np.concatenate([[True], dd[1:] != dd[:-1]]))
            pos = np.searchsorted(sid, dd[starts])
            offers = np.minimum.reduceat(dmm, starts)
            better = offers < dist[pos]
            dist[pos[better]] = offers[better]
            improved[pos[better]] = 1
        out = state.copy()
        out["dist"] = dist
        out["improved"] = improved
        return out, {"changed": int(improved.sum()), "n": len(out)}


def sssp(
    edges: Dataset, seeds, workdir: str, weight_col: str = "w",
    max_iters: int = 256, num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, dist) with -1 for unreached, run info). Weights must be
    >= 0."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        def prep(t: pa.Table) -> pa.Table:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if (w < 0).any():
                raise ValueError("sssp requires non-negative weights")
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        ew = edges.select_columns(["src", "dst", weight_col]).map_batches(
            prep, batch_format="pyarrow"
        )
        info = build_graph_partitions(ew, workdir, num_parts,
                                      edge_attrs=("w",))
    prog = SsspProgram(seeds)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)

    def fin(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": t["id"],
            "dist": pa.array(np.where(np.isinf(d), -1.0, d), pa.float64()),
        })

    out = final_state(workdir).select_columns(["id", "dist"]).map_batches(
        fin, batch_format="pyarrow"
    )
    return out, {**run, **info}


class SsspPathProgram(SsspProgram):
    """SSSP carrying PARENT pointers: every offer ships its source vertex;
    the min combiner keeps the (dist, parent)-lexicographic minimum, so
    the recorded parent is deterministic. Strictly-better offers update;
    ties keep the incumbent — the final (dist, parent) pair satisfies
    dist[v] == dist[parent] + w(parent, v) with a cycle-free chain to a
    seed (contract asserted by the pytest; which valid parent wins is the
    documented lexicographic rule, not Dijkstra's visit order)."""

    name = "sssp_path"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("dist", pa.float64()), ("parent", pa.int64())]
    )

    def init_state(self, ids, out_degree, in_degree, n_total):
        st = super().init_state(ids, out_degree, in_degree, n_total)
        st["parent"] = np.where(st["improved"].to_numpy() == 1,
                                st["id"].to_numpy(), -1)
        return st

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            src = edges["src"].to_numpy()[m]
            pos = np.searchsorted(sid, src)
            frontier = st["improved"].to_numpy()[pos] == 1
            if not frontier.any():
                continue
            offer = (st["dist"].to_numpy()[pos][frontier]
                     + edges["w"].to_numpy()[m][frontier])
            par = src[frontier]
            dst = edges["dst"].to_numpy()[m][frontier]
            order = np.lexsort((par, offer, dst))
            d, of, pr = dst[order], offer[order], par[order]
            starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
            outs.append(pd.DataFrame(
                {"dst": d[starts], "dist": of[starts],
                 "parent": pr[starts]}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.float64),
                                 "parent": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        dist = state["dist"].to_numpy().copy()
        parent = state["parent"].to_numpy().copy()
        improved = np.zeros(len(sid), np.int8)
        if len(msgs):
            d = msgs["dst"].to_numpy()
            dm = msgs["dist"].to_numpy()
            pm = msgs["parent"].to_numpy()
            order = np.lexsort((pm, dm, d))
            dd, dmm, pmm = d[order], dm[order], pm[order]
            starts = np.flatnonzero(np.concatenate([[True], dd[1:] != dd[:-1]]))
            pos = np.searchsorted(sid, dd[starts])
            offers = dmm[starts]
            pars = pmm[starts]
            better = offers < dist[pos]
            dist[pos[better]] = offers[better]
            parent[pos[better]] = pars[better]
            improved[pos[better]] = 1
        out = state.copy()
        out["dist"] = dist
        out["parent"] = parent
        out["improved"] = improved
        return out, {"changed": int(improved.sum()), "n": len(out)}


def sssp_with_parents(
    edges: Dataset, seeds, workdir: str, weight_col: str = "w",
    max_iters: int = 256, num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, dist, parent), run info). dist -1 / parent -1 = unreached;
    seeds carry parent == id."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        def prep(t: pa.Table) -> pa.Table:
            w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            if (w < 0).any():
                raise ValueError("sssp requires non-negative weights")
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        ew = edges.select_columns(["src", "dst", weight_col]).map_batches(
            prep, batch_format="pyarrow")
        info = build_graph_partitions(ew, workdir, num_parts,
                                      edge_attrs=("w",))
    prog = SsspPathProgram(seeds)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)

    def fin(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": t["id"],
            "dist": pa.array(np.where(np.isinf(d), -1.0, d), pa.float64()),
            "parent": t["parent"],
        })

    out = final_state(workdir).select_columns(
        ["id", "dist", "parent"]).map_batches(fin, batch_format="pyarrow")
    return out, {**run, **info}


def extract_path(workdir: str, target: int, num_parts: int,
                 max_hops: int = 100_000) -> list[int]:
    """Walk parent pointers target → seed by DIRECT state-shard reads
    (one read_part per NEW partition touched, cached — never the whole
    vertex table on the driver; a path of length L costs at most
    min(L, P) shard reads)."""
    from ..functions.hashing import part_of
    from ..state import checkpoint as ckpt

    it = ckpt.latest_complete_iteration(workdir)
    cache: dict[int, pa.Table] = {}
    path = [int(target)]
    cur = int(target)
    for _ in range(max_hops):
        p = int(part_of(np.array([cur], np.int64), num_parts)[0])
        if p not in cache:
            cache[p] = ckpt.read_part(workdir, it, p)
        t = cache[p]
        ids = t["id"].to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(ids, cur))
        if i >= len(ids) or ids[i] != cur:
            return []  # unreachable / unknown vertex
        par = int(t["parent"].to_numpy(zero_copy_only=False)[i])
        if par == -1:
            return []  # unreached
        if par == cur:
            return path[::-1]  # seed
        path.append(par)
        cur = par
    raise RuntimeError("parent chain exceeded max_hops (cycle?)")
