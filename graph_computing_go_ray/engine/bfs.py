"""[north-rule] Multi-source BFS hop distances on the superstep engine.

Min-plus propagation: seeds start at dist 0, every superstep each reached
vertex offers dist+1 to its out-neighbors, unreached vertices hold the
sentinel -1. Per-(part, dst) min combiners bound message volume exactly
like connected components (engine/components.py); converges when no
vertex improves — #supersteps = eccentricity of the seed set.

Output keeps ONLY reached vertices (dist >= 0), matching the recursive
frontier-expansion SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


class MinHopProgram(VertexProgram):
    name = "bfs"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("dist", pa.int64())]
    )

    def __init__(self, seeds):
        self.params = {"seeds": sorted(int(s) for s in seeds)}

    def init_state(self, ids, out_degree, in_degree, n_total):
        seeds = np.asarray(self.params["seeds"], np.int64)
        dist = np.where(np.isin(ids, seeds), 0, -1).astype(np.int64)
        return pd.DataFrame({"id": ids, "dist": dist})

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            d = st["dist"].to_numpy()[pos]
            reached = d >= 0
            if not reached.any():
                continue
            dst = edges["dst"].to_numpy()[m][reached]
            offer = d[reached] + 1
            order = np.argsort(dst, kind="stable")
            ds_, of = dst[order], offer[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            outs.append(pd.DataFrame(
                {"dst": ds_[starts], "dist": np.minimum.reduceat(of, starts)}
            ))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        old = state["dist"].to_numpy()
        new = old.copy()
        if len(msgs):
            dst = msgs["dst"].to_numpy()
            dm = msgs["dist"].to_numpy()
            order = np.argsort(dst, kind="stable")
            ds_, dm_ = dst[order], dm[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            pos = np.searchsorted(sid, ds_[starts])
            offers = np.minimum.reduceat(dm_, starts)
            cur = new[pos]
            new[pos] = np.where(cur < 0, offers, np.minimum(cur, offers))
        changed = int((new != old).sum())
        out = state.copy()
        out["dist"] = new
        return out, {"changed": changed, "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}  # force at least one superstep

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0


def _local_bfs(df: pd.DataFrame, seeds, symmetrize: bool,
               max_iters: int) -> tuple[pd.DataFrame, bool]:
    """Whole-graph multi-seed BFS in one process — the local-cutoff leg
    (same hybrid as scc/louvain). Level-synchronous edge scans replicate
    the superstep semantics exactly: seeds at 0, min-hop labels, stop at
    max_iters levels, only reached vertices output."""
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    if symmetrize:
        src, dst = (np.concatenate([src, dst]),
                    np.concatenate([dst, src]))
    ids = np.unique(np.concatenate([src, dst])) if len(src) else \
        np.array([], np.int64)
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    dist = np.full(len(ids), -1, np.int64)
    sd = np.asarray(sorted(set(int(s) for s in seeds)), np.int64)
    pos = np.searchsorted(ids, sd)
    ok = (pos < len(ids))
    ok[ok] = ids[pos[ok]] == sd[ok]
    dist[pos[ok]] = 0
    # converged mirrors the distributed MinHopProgram flag: True only when
    # the frontier emptied (break), False when max_iters truncated a
    # still-expanding frontier
    converged = True
    for hop in range(1, max_iters + 1):
        reach = dist[si] == hop - 1
        cand = di[reach]
        cand = cand[dist[cand] < 0]
        if not len(cand):
            break
        dist[np.unique(cand)] = hop
    else:
        reach = dist[si] == max_iters
        cand = di[reach]
        converged = not len(cand[dist[cand] < 0])
    keep = dist >= 0
    return pd.DataFrame({"id": ids[keep], "dist": dist[keep]}), converged


def bfs_depths(
    edges: Dataset, seeds, workdir: str, max_iters: int = 64,
    num_parts: int = 8, symmetrize: bool = True, resume: bool = True,
    local_cutoff: int = 200_000,
) -> tuple[Dataset, dict]:
    """(id, dist) for every vertex reachable from the seed set.

    local_cutoff: an edge table of at most this many rows runs the whole
    BFS in one Ray task (_local_bfs) — identical output (parity pytest
    in tests/test_triangles_bfs.py); 0 disables."""
    from .superstep import _load_graph_meta, load_edge_blocks

    if local_cutoff:
        import ray as _ray
        import ray.data as rd

        ed = edges.materialize()
        n_e = ed.count()
        if n_e <= local_cutoff:
            run_local = _ray.remote(num_cpus=1)(_local_bfs)
            out_df, conv = _ray.get(run_local.remote(
                ed.to_pandas(), list(seeds), symmetrize, max_iters))
            out = rd.from_arrow(pa.Table.from_pandas(
                out_df, preserve_index=False).cast(
                    pa.schema([("id", pa.int64()), ("dist", pa.int64())])))
            return out, {"local": True, "n_edges": int(n_e),
                         "converged": bool(conv),
                         "iterations": int(out_df["dist"].max())
                         if len(out_df) else 0}
        edges = ed

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=symmetrize)
    prog = MinHopProgram(seeds)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).filter(expr="dist >= 0").select_columns(["id", "dist"])
    return out, {**run, **info}
