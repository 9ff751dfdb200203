"""Distributed maximal matching as a two-phase-per-round superstep program
(the classic propose/accept symmetry-breaking scheme, cf. Israeli-Itai
1986, public) — the pairing primitive behind graph coarsening and
multilevel partitioning.

Each round r over the symmetrized edge set:
- **propose** — every UNMATCHED vertex draws the deterministic
  counter-based priority pri(v, r) (engine/mis.py's splitmix64 scheme) and
  sends (pri, id) to its neighbors; an unmatched receiver picks the
  lexicographic-min (pri, id) sender as its proposal target.
- **accept** — every unmatched vertex u with a target sends its id ALONG
  THE EDGE POINTING AT THE TARGET only (the gather filters on
  prop == dst, so acceptance costs one message per proposing vertex, not
  per degree); a receiver v whose own target proposed back (mutual
  choice) sets match = target. Mutuality is symmetric, so both endpoints
  record the pair in the same accept step.

Progress: the globally min-priority unmatched vertex and its chosen
neighbor always choose each other, so every round matches at least one
pair per active component; converged when a propose phase finds no
unmatched vertex with an unmatched neighbor (candidates == 0). Messages
carry per-dst lexicographic-min block combiners, so hot vertices receive
<= #blocks rows.

Parity: exact match-table equality against a single-process python
replica of the same rounds/priorities (tests/test_graph_extras.py), plus
symmetry / edge-validity / maximality asserted structurally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .mis import mis_priority
from .superstep import (
    VertexProgram,
    build_graph_partitions,
    final_state,
    run_supersteps,
)


class MatchingProgram(VertexProgram):
    name = "maximal_matching"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("pri", pa.int64()), ("sid", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({
            "id": ids,
            "match": np.full(len(ids), -1, np.int64),
            "prop": np.full(len(ids), -1, np.int64),
        })

    def init_metrics(self, state):
        return {"unmatched": int((state["match"] == -1).sum()),
                "candidates": -1, "phase_done": "init", "round": -1}

    def globals_from_metrics(self, metrics, n_total):
        ph = metrics["phase_done"].iloc[0]
        rnd = int(metrics["round"].max())
        if ph in ("init", "accept"):
            return {"phase": "propose", "round": rnd + 1}
        return {"phase": "accept", "round": rnd}

    def converged(self, metrics):
        return ("candidates" in metrics.columns
                and metrics["phase_done"].iloc[0] == "propose"
                and int(metrics["candidates"].sum()) == 0)

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
            unmatched = st["match"].to_numpy()[pos] == -1
            if phase == "propose":
                if not unmatched.any():
                    continue
                s, d = src[unmatched], dst[unmatched]
                pri = mis_priority(s, rnd)
                order = np.lexsort((s, pri, d))
                dd, pp, ss = d[order], pri[order], s[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], dd[1:] != dd[:-1]]))
                outs.append(pd.DataFrame(
                    {"dst": dd[starts], "pri": pp[starts], "sid": ss[starts]}))
            else:  # accept: a proposer notifies ONLY its target edge
                prop = st["prop"].to_numpy()[pos]
                sel = unmatched & (prop != -1) & (prop == dst)
                if not sel.any():
                    continue
                pairs = pd.DataFrame(
                    {"dst": dst[sel], "sid": src[sel]}).drop_duplicates()
                pairs["pri"] = np.int64(-1)
                outs.append(pairs[["dst", "pri", "sid"]])
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "pri": pd.Series([], dtype=np.int64),
                                 "sid": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        phase = global_vals["phase"]
        rnd = global_vals["round"]
        sid = state["id"].to_numpy()
        match = state["match"].to_numpy().copy()
        prop = np.full(len(sid), -1, np.int64)
        candidates = -1
        if phase == "propose":
            if len(msgs):
                d = msgs["dst"].to_numpy()
                pp = msgs["pri"].to_numpy()
                ss = msgs["sid"].to_numpy()
                order = np.lexsort((ss, pp, d))
                dd, pp, ss = d[order], pp[order], ss[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], dd[1:] != dd[:-1]]))
                pos = np.searchsorted(sid, dd[starts])
                ok = match[pos] == -1
                prop[pos[ok]] = ss[starts][ok]
            candidates = int((prop != -1).sum())
        else:  # accept: mutual choice -> matched
            old_prop = state["prop"].to_numpy()
            if len(msgs):
                # received (sid=u) means u proposed to THIS dst; match when
                # dst's own proposal points back at u
                df = pd.DataFrame({"dst": msgs["dst"].to_numpy(),
                                   "sid": msgs["sid"].to_numpy()})
                pos = np.searchsorted(sid, df["dst"].to_numpy())
                mutual = (match[pos] == -1) & (old_prop[pos] == df["sid"].to_numpy())
                pos_m = pos[mutual]
                match[pos_m] = df["sid"].to_numpy()[mutual]
        out = state.copy()
        out["match"] = match
        out["prop"] = prop
        return out, {"unmatched": int((match == -1).sum()),
                     "candidates": candidates,
                     "phase_done": phase, "round": rnd, "n": len(out)}


def maximal_matching(
    edges: Dataset, workdir: str, max_iters: int = 160,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, match) for every vertex, -1 = unmatched; run info). Edges are
    symmetrized at partition build; self-loops must be absent."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=True)
    prog = MatchingProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).select_columns(["id", "match"])
    return out, {**run, **info}


def python_matching_replica(edge_pairs, ids) -> dict:
    """Single-process replica of the same rounds/priorities (oracle)."""
    adj: dict[int, set] = {int(i): set() for i in ids}
    for s, d in edge_pairs:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    match = {int(i): -1 for i in ids}
    rnd = 0
    while True:
        pri = {v: int(mis_priority(np.array([v]), rnd)[0])
               for v in match if match[v] == -1}
        prop = {}
        for v in pri:
            nb = [(pri[u], u) for u in adj[v] if match[u] == -1]
            if nb:
                prop[v] = min(nb)[1]
        if not prop:
            break
        for v, t in prop.items():
            if prop.get(t) == v:
                match[v] = t
        rnd += 1
    return match


def coarsen_by_matching(
    edges: Dataset, match: Dataset, num_buckets: int = 8,
) -> Dataset:
    """Multilevel coarsening step: contract every matched pair to one
    coarse vertex (min of the pair; unmatched vertices keep their id) and
    aggregate parallel edges into (csrc, cdst, weight). Self-edges of a
    contracted pair are dropped — the standard matching-based coarsening
    round of multilevel partitioners.

    Scale shape: the id→coarse map is vertex-scale, so BOTH endpoint hops
    are bucketed joins (never a broadcast); the aggregation is per-batch
    partials + one bucketed sum keyed on the coarse source."""
    from .join import bucket_grouped_sum, bucket_join, rename

    def cmap_fn(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        m = t["match"].to_numpy(zero_copy_only=False)
        cid = np.where(m == -1, ids, np.minimum(ids, m))
        return pa.table({"vid": pa.array(ids, pa.int64()),
                         "cid": pa.array(cid.astype(np.int64))})

    cmap = match.map_batches(cmap_fn, batch_format="pyarrow").materialize()
    e1 = rename(
        bucket_join(edges.select_columns(["src", "dst"]), cmap, on="src",
                    right_on="vid", how="inner", num_buckets=num_buckets),
        {"cid": "csrc"},
    )
    e2 = rename(
        bucket_join(e1, cmap, on="dst", right_on="vid", how="inner",
                    num_buckets=num_buckets),
        {"cid": "cdst"},
    )

    def partial(t: pa.Table) -> pa.Table:
        cs = t["csrc"].to_numpy(zero_copy_only=False)
        cd = t["cdst"].to_numpy(zero_copy_only=False)
        keep = cs != cd
        df = pd.DataFrame({"csrc": cs[keep], "cdst": cd[keep]})
        out = df.groupby(["csrc", "cdst"], as_index=False).size()
        return pa.Table.from_pandas(out.rename(columns={"size": "weight"}),
                                    preserve_index=False)

    agg = bucket_grouped_sum(
        e2.map_batches(partial, batch_format="pyarrow"),
        ["csrc", "cdst"], ["weight"], num_buckets=num_buckets,
    )
    return agg.map_batches(
        lambda t: t.cast(pa.schema([("csrc", pa.int64()),
                                    ("cdst", pa.int64()),
                                    ("weight", pa.int64())])),
        batch_format="pyarrow",
    )
