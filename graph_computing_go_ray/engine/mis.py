"""Maximal independent set by Luby's algorithm (Luby 1986, public) as a
two-phase-per-round superstep program — the classic symmetry-breaking
primitive (scheduling, graph coloring seeds, landmark selection).

Each round r:
- **select** — every UNDECIDED vertex draws a deterministic priority
  pri(v, r) (counter-based splitmix64, reproducible across runs and
  processes, same trick as engine/walks.py) and sends (pri, id) to its
  neighbors; an undecided vertex joins the MIS when its own (pri, id) is
  strictly smallest among itself and all undecided neighbors (messages
  come only from undecided senders, so excluded neighbors never block);
  a vertex with no undecided neighbors joins unconditionally.
- **exclude** — fresh MIS members notify neighbors, which become EXCLUDED.

Terminates in O(log n) rounds in expectation; converged when no vertex is
undecided. Messages carry per-(dst) lexicographic-min (pri, id) block
combiners, so hot vertices receive <= #blocks rows.

Parity: exact set equality against a single-process python replica of the
same rounds/hash (tests/test_graph_extras.py), plus independence +
maximality asserted structurally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import splitmix64
from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps

_ROUND_SALT = np.uint64(0xA24BAED4963EE407)

UNDECIDED, IN_MIS, EXCLUDED = 0, 1, 2


def mis_priority(ids: np.ndarray, rnd: int) -> np.ndarray:
    """Deterministic per-(vertex, round) priority, positive int64."""
    u = np.asarray(ids, np.int64).view(np.uint64)
    mixed = splitmix64(u ^ (np.uint64(rnd) * _ROUND_SALT))
    return (mixed >> np.uint64(1)).astype(np.int64)


class LubyMISProgram(VertexProgram):
    name = "luby_mis"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("pri", pa.int64()), ("sid", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({
            "id": ids,
            "status": np.full(len(ids), UNDECIDED, np.int8),
            "fresh": np.zeros(len(ids), np.int8),
        })

    def init_metrics(self, state):
        return {"undecided": int((state["status"] == UNDECIDED).sum()),
                "phase_done": "init", "round": -1}

    def globals_from_metrics(self, metrics, n_total):
        ph = metrics["phase_done"].iloc[0]
        rnd = int(metrics["round"].max())
        if ph in ("init", "exclude"):
            return {"phase": "select", "round": rnd + 1}
        return {"phase": "exclude", "round": rnd}

    def converged(self, metrics):
        return ("undecided" in metrics.columns
                and int(metrics["undecided"].sum()) == 0
                and metrics["phase_done"].iloc[0] == "exclude")

    def gather(self, edges, state_of, global_vals):
        phase = global_vals["phase"]
        rnd = global_vals["round"]
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            src = edges["src"].to_numpy()[m]
            dst = edges["dst"].to_numpy()[m]
            pos = np.searchsorted(sid, src)
            if phase == "select":
                sel = st["status"].to_numpy()[pos] == UNDECIDED
                if not sel.any():
                    continue
                s, d = src[sel], dst[sel]
                pri = mis_priority(s, rnd)
                # block combiner: lexicographic min (pri, sid) per dst
                order = np.lexsort((s, pri, d))
                dd, pp, ss = d[order], pri[order], s[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], dd[1:] != dd[:-1]]))
                outs.append(pd.DataFrame(
                    {"dst": dd[starts], "pri": pp[starts], "sid": ss[starts]}))
            else:  # exclude: fresh MIS members notify neighbors
                sel = st["fresh"].to_numpy()[pos] == 1
                if not sel.any():
                    continue
                d = np.unique(dst[sel])
                outs.append(pd.DataFrame(
                    {"dst": d, "pri": np.int64(-1), "sid": np.int64(-1)}))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "pri": pd.Series([], dtype=np.int64),
                                 "sid": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        phase = global_vals["phase"]
        rnd = global_vals["round"]
        sid = state["id"].to_numpy()
        status = state["status"].to_numpy().copy()
        fresh = np.zeros(len(sid), np.int8)
        if phase == "select":
            und = status == UNDECIDED
            min_pri = np.full(len(sid), np.iinfo(np.int64).max, np.int64)
            min_sid = np.full(len(sid), np.iinfo(np.int64).max, np.int64)
            if len(msgs):
                d = msgs["dst"].to_numpy()
                pp = msgs["pri"].to_numpy()
                ss = msgs["sid"].to_numpy()
                order = np.lexsort((ss, pp, d))
                dd, pp, ss = d[order], pp[order], ss[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], dd[1:] != dd[:-1]]))
                pos = np.searchsorted(sid, dd[starts])
                min_pri[pos] = pp[starts]
                min_sid[pos] = ss[starts]
            own = mis_priority(sid, rnd)
            wins = und & ((own < min_pri)
                          | ((own == min_pri) & (sid < min_sid)))
            status[wins] = IN_MIS
            fresh[wins] = 1
        else:  # exclude
            if len(msgs):
                pos = np.searchsorted(sid, np.unique(msgs["dst"].to_numpy()))
                hit = status[pos] == UNDECIDED
                status[pos[hit]] = EXCLUDED
        out = state.copy()
        out["status"] = status
        out["fresh"] = fresh
        return out, {"undecided": int((status == UNDECIDED).sum()),
                     "phase_done": phase, "round": rnd, "n": len(out)}


def maximal_independent_set(
    edges: Dataset, workdir: str, max_iters: int = 120,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, in_mis:int8) for every vertex, run info). Edges are
    symmetrized at partition build; self-loops should be absent (a
    self-loop would make its vertex its own blocker)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=True)
    prog = LubyMISProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).map_batches(
        lambda t: pa.table({
            "id": t["id"],
            "in_mis": pa.array(
                (t["status"].to_numpy(zero_copy_only=False) == IN_MIS)
                .astype(np.int8)),
        }),
        batch_format="pyarrow",
    )
    return out, {**run, **info}


def python_mis_replica(edge_pairs, ids) -> set:
    """Single-process replica of the same rounds/priorities (oracle)."""
    adj: dict[int, set] = {int(i): set() for i in ids}
    for s, d in edge_pairs:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    status = {int(i): UNDECIDED for i in ids}
    rnd = 0
    while any(v == UNDECIDED for v in status.values()):
        pri = {v: int(mis_priority(np.array([v]), rnd)[0])
               for v in status if status[v] == UNDECIDED}
        joined = []
        for v, p in pri.items():
            blockers = [(pri[u], u) for u in adj[v] if status[u] == UNDECIDED]
            if not blockers or (p, v) < min(blockers):
                joined.append(v)
        for v in joined:
            status[v] = IN_MIS
            for u in adj[v]:
                if status[u] == UNDECIDED:
                    status[u] = EXCLUDED
        rnd += 1
    return {v for v, s in status.items() if s == IN_MIS}
