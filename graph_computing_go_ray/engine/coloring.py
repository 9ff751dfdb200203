"""Distributed greedy graph coloring (Jones & Plassmann 1993, public
algorithm) as a superstep program — the classic follow-up to Luby MIS:
every vertex draws ONE fixed deterministic priority; each round, an
uncolored vertex whose (priority, id) is the strict maximum among its
UNCOLORED neighbors takes the smallest color unused by its already-colored
neighbors. Adjacent vertices can never win the same round, so the coloring
is proper by construction; rounds are O(log n) in expectation.

Message shape per round: uncolored vertices send (pri, id); colored
vertices (re)send their color — receivers therefore always see the full
colored-neighbor palette and the uncolored-neighbor maximum in ONE round's
messages, keeping state a single int per vertex (no growing palette lists
in the checkpoints). The mex (minimum excluded color) of every winner is
computed in one vectorized dedup + reduceat pass — no per-vertex Python.

Parity: exact color-per-vertex equality against a single-process python
replica of the same rounds/priorities (tests/test_graph_extras.py), plus
structural properness and the maxdeg+1 bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import splitmix64
from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps

_PRI_SALT = np.uint64(0x8F1BBCDCBFA53E0B)

UNCOLORED = np.int64(-1)


def color_priority(ids: np.ndarray) -> np.ndarray:
    """Fixed deterministic per-vertex priority, positive int64."""
    u = np.asarray(ids, np.int64).view(np.uint64)
    return (splitmix64(u ^ _PRI_SALT) >> np.uint64(1)).astype(np.int64)


def _mex_per_group(d: np.ndarray, c: np.ndarray,
                   targets: np.ndarray) -> np.ndarray:
    """mex of the color multiset per dst, aligned to `targets` (sorted
    unique dst ids; dsts absent from (d, c) get mex 0). Vectorized:
    sort + dedup, then the first position where color != rank."""
    out = np.zeros(len(targets), np.int64)
    if not len(d):
        return out
    order = np.lexsort((c, d))
    ds, cs = d[order], c[order]
    keep = np.concatenate([[True], (ds[1:] != ds[:-1]) | (cs[1:] != cs[:-1])])
    ds, cs = ds[keep], cs[keep]
    starts = np.flatnonzero(np.concatenate([[True], ds[1:] != ds[:-1]]))
    counts = np.diff(np.concatenate([starts, [len(ds)]]))
    rank = np.arange(len(ds)) - np.repeat(starts, counts)
    BIG = np.int64(1) << np.int64(60)
    gap = np.where(cs != rank, rank, BIG)
    first_gap = np.minimum.reduceat(gap, starts)
    mex = np.minimum(first_gap, counts)  # no gap -> palette is 0..k-1
    pos = np.searchsorted(targets, ds[starts])
    out[pos] = mex
    return out


class JonesPlassmannProgram(VertexProgram):
    name = "jp_coloring"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("pri", pa.int64()), ("sid", pa.int64()), ("color", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({
            "id": ids,
            "color": np.full(len(ids), UNCOLORED, np.int64),
        })

    def init_metrics(self, state):
        return {"uncolored": int((state["color"] == UNCOLORED).sum())}

    def converged(self, metrics):
        return ("uncolored" in metrics.columns
                and int(metrics["uncolored"].sum()) == 0)

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            src = edges["src"].to_numpy()[m]
            dst = edges["dst"].to_numpy()[m]
            pos = np.searchsorted(sid, src)
            col = st["color"].to_numpy()[pos]
            unc = col == UNCOLORED
            if unc.any():
                s = src[unc]
                d = dst[unc]
                pri = color_priority(s)
                # combiner: max (pri, sid) per dst
                order = np.lexsort((s, pri, d))
                dd, pp, ss = d[order], pri[order], s[order]
                last = np.flatnonzero(np.concatenate(
                    [dd[1:] != dd[:-1], [True]]))
                outs.append(pd.DataFrame(
                    {"dst": dd[last], "pri": pp[last], "sid": ss[last],
                     "color": np.int64(UNCOLORED)}))
            if (~unc).any():
                # colored palette rows, distinct (dst, color) per block
                d = dst[~unc]
                c = col[~unc]
                order = np.lexsort((c, d))
                dd, cc = d[order], c[order]
                keep = np.concatenate(
                    [[True], (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])])
                outs.append(pd.DataFrame(
                    {"dst": dd[keep], "pri": np.int64(-1),
                     "sid": np.int64(-1), "color": cc[keep]}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "pri": pd.Series([], dtype=np.int64),
                                 "sid": pd.Series([], dtype=np.int64),
                                 "color": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        color = state["color"].to_numpy().copy()
        unc = color == UNCOLORED
        if unc.any():
            max_pri = np.full(len(sid), np.int64(-1))
            max_sid = np.full(len(sid), np.int64(-1))
            pal_d = np.array([], np.int64)
            pal_c = np.array([], np.int64)
            if len(msgs):
                mu = msgs[msgs["color"] == UNCOLORED]
                if len(mu):
                    d = mu["dst"].to_numpy()
                    pp = mu["pri"].to_numpy()
                    ss = mu["sid"].to_numpy()
                    order = np.lexsort((ss, pp, d))
                    dd, pp, ss = d[order], pp[order], ss[order]
                    last = np.flatnonzero(np.concatenate(
                        [dd[1:] != dd[:-1], [True]]))
                    pos = np.searchsorted(sid, dd[last])
                    max_pri[pos] = pp[last]
                    max_sid[pos] = ss[last]
                mc = msgs[msgs["color"] != UNCOLORED]
                if len(mc):
                    pal_d = mc["dst"].to_numpy()
                    pal_c = mc["color"].to_numpy()
            own = color_priority(sid)
            wins = unc & ((own > max_pri)
                          | ((own == max_pri) & (sid > max_sid)))
            if wins.any():
                targets = sid[wins]  # sid is sorted per state contract
                if len(pal_d):
                    sel = np.isin(pal_d, targets)
                    pal_d, pal_c = pal_d[sel], pal_c[sel]
                color[wins] = _mex_per_group(pal_d, pal_c, targets)
        out = state.copy()
        out["color"] = color
        return out, {"uncolored": int((color == UNCOLORED).sum()),
                     "n": len(out)}


def jones_plassmann_coloring(
    edges: Dataset, workdir: str, max_iters: int = 200,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, color) for every vertex, run info). Edges are symmetrized at
    partition build; self-loops must be absent (a vertex adjacent to
    itself could never color properly)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=True)
    prog = JonesPlassmannProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).select_columns(["id", "color"])
    return out, {**run, **info}


def python_coloring_replica(edge_pairs, ids) -> dict:
    """Single-process replica of the same rounds/priorities (oracle)."""
    adj: dict[int, set] = {int(i): set() for i in ids}
    for s, d in edge_pairs:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    pri = {int(v): int(color_priority(np.array([v]))[0]) for v in ids}
    color = {int(v): -1 for v in ids}
    while any(c == -1 for c in color.values()):
        winners = []
        for v, c in color.items():
            if c != -1:
                continue
            blockers = [(pri[u], u) for u in adj[v] if color[u] == -1
                        and u != v]
            if not blockers or (pri[v], v) > max(blockers):
                winners.append(v)
        # simultaneous: palettes read the PREVIOUS round's colors
        snapshot = dict(color)
        for v in winners:
            used = {snapshot[u] for u in adj[v] if snapshot[u] != -1}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color
