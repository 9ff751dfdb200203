"""[north-rule] 1-dimensional Weisfeiler-Leman color refinement on the
superstep engine — the canonical graph-isomorphism invariant / structural
fingerprint (Weisfeiler & Leman 1968; Shervashidze et al., JMLR 2011).

Per round every vertex rehashes (own color, multiset of neighbor colors).
The multiset is encoded ORDER-INVARIANTLY as (sum of splitmix64(color),
count) over uint64 wraparound arithmetic, so it pre-aggregates per
destination inside each edge block — the same block-level combiner that
bounds hot-vertex fan-in for PageRank bounds it here (a hot dst receives
at most #edge-blocks partial rows). That is what makes WL a one-exchange-
per-round operator at 10^12 edges instead of a neighbor-list gather.

Colors are raw 64-bit hashes: two vertices share a color at round k iff
their depth-k neighborhood trees are identical (up to hash collisions,
~2^-64 per pair per round). Runs a FIXED number of rounds (the stable-
partition detection needs a global distinct-count; callers that want it
compare class counts across rounds on the returned state).

No counterpart in /root/reference (beyond-reference operator); verified by
an exact in-process numpy replica (tests/test_graph_extras.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import splitmix64
from .superstep import (
    VertexProgram,
    build_graph_partitions,
    final_state,
    local_col,
    run_supersteps,
)

_POS63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def _mix_color(color_i64: np.ndarray) -> np.ndarray:
    """uint64 per-element hash of the current colors (message payload)."""
    return splitmix64(color_i64.astype(np.int64).view(np.uint64))


def _next_color(own_i64: np.ndarray, hsum_u64: np.ndarray,
                cnt_i64: np.ndarray) -> np.ndarray:
    """New color = positive-int64 hash of (own color, multiset digest).

    All three inputs fold through one more splitmix64 round each so that
    (sum, count) pairs that collide additively still separate."""
    z = splitmix64(own_i64.astype(np.int64).view(np.uint64))
    z = z + splitmix64(hsum_u64.astype(np.uint64))
    z = z + splitmix64(cnt_i64.astype(np.int64).view(np.uint64))
    return (splitmix64(z) & _POS63).astype(np.int64)


class WLProgram(VertexProgram):
    name = "wl_refinement"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()),
         ("hsum", pa.int64()), ("cnt", pa.int64())]
    )

    def __init__(self, rounds: int):
        self.rounds = rounds
        self.params = {"rounds": rounds}

    def init_state(self, ids, out_degree, in_degree, n_total):
        # round-0 color: the (in, out) degree pair — the classic WL-0
        # partition, and already order-invariant
        c = _next_color(in_degree.astype(np.int64),
                        splitmix64(out_degree.astype(np.int64).view(np.uint64)),
                        np.zeros(len(ids), np.int64))
        return pd.DataFrame({"id": ids, "color": c,
                             "round": np.zeros(len(ids), np.int64)})

    def gather_arrow(self, t, state_of, global_vals):
        part_arr = local_col(t, "part")
        src = local_col(t, "src")
        dst_all = local_col(t, "dst")
        out_d, out_h, out_c = [], [], []
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, src[m])
            h = _mix_color(st["color"].to_numpy()[pos])
            dst = dst_all[m]
            order = np.argsort(dst, kind="stable")
            ds_, hs = dst[order], h[order]
            new = np.concatenate([[True], ds_[1:] != ds_[:-1]])
            starts = np.flatnonzero(new)
            ends = np.concatenate([starts[1:], [len(ds_)]])
            # wraparound segment sums of the uint64 hashes
            csum = np.cumsum(hs, dtype=np.uint64)
            seg = csum[ends - 1] - np.where(starts > 0, csum[starts - 1],
                                            np.uint64(0))
            out_d.append(ds_[starts])
            out_h.append(seg.view(np.int64))
            out_c.append(ends - starts)
        if not out_d:
            z = np.array([], np.int64)
            return {"dst": z, "hsum": z, "cnt": z}
        return {"dst": np.concatenate(out_d),
                "hsum": np.concatenate(out_h),
                "cnt": np.concatenate(out_c)}

    def gather(self, edges, state_of, global_vals):
        t = pa.table({"part": pa.array(edges["part"].to_numpy()),
                      "src": pa.array(edges["src"].to_numpy()),
                      "dst": pa.array(edges["dst"].to_numpy())})
        out = self.gather_arrow(t, state_of, global_vals)
        return pd.DataFrame(out)

    def reduce_apply(self, state, msgs, global_vals):
        rnd = int(state["round"].iloc[0]) if len(state) else 0
        sid = state["id"].to_numpy()
        hsum = np.zeros(len(sid), np.uint64)
        cnt = np.zeros(len(sid), np.int64)
        if len(msgs):
            d = msgs["dst"].to_numpy()
            h = msgs["hsum"].to_numpy().view(np.uint64)
            c = msgs["cnt"].to_numpy()
            order = np.argsort(d, kind="stable")
            d, h, c = d[order], h[order], c[order]
            new = np.concatenate([[True], d[1:] != d[:-1]])
            starts = np.flatnonzero(new)
            ends = np.concatenate([starts[1:], [len(d)]])
            csum_h = np.cumsum(h, dtype=np.uint64)
            csum_c = np.cumsum(c, dtype=np.int64)
            seg_h = csum_h[ends - 1] - np.where(starts > 0,
                                                csum_h[starts - 1],
                                                np.uint64(0))
            seg_c = csum_c[ends - 1] - np.where(starts > 0,
                                                csum_c[starts - 1], 0)
            pos = np.searchsorted(sid, d[starts])
            hsum[pos] = seg_h
            cnt[pos] = seg_c
        out = state.copy()
        out["color"] = _next_color(state["color"].to_numpy(), hsum, cnt)
        out["round"] = rnd + 1
        return out, {"n": len(out), "done_round": rnd + 1}

    def converged(self, metrics):
        return ("done_round" in metrics.columns
                and int(metrics["done_round"].max()) >= self.rounds)


def wl_colors(
    edges: Dataset, workdir: str, rounds: int = 3,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """((id, color) after `rounds` WL rounds on the SYMMETRIZED edge set,
    run info). Isolated vertices keep their degree-pair color."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=True)
    prog = WLProgram(rounds)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog,
                         info, max_iters=rounds, resume=resume)
    colors = final_state(workdir).select_columns(["id", "color"])
    return colors, {**run, **info}


def wl_replica(src: np.ndarray, dst: np.ndarray, ids: np.ndarray,
               rounds: int = 3) -> np.ndarray:
    """Exact single-process replica of wl_colors (the pytest oracle):
    same symmetrization, same init, same multiset digest, same rounds."""
    # symmetrize by doubling, exactly like build_graph_partitions
    # (multigraph semantics: parallel edges count in the multiset)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ids = np.sort(ids)
    outd = np.zeros(len(ids), np.int64)
    ind = np.zeros(len(ids), np.int64)
    np.add.at(outd, np.searchsorted(ids, s), 1)
    np.add.at(ind, np.searchsorted(ids, d), 1)
    color = _next_color(ind, splitmix64(outd.view(np.uint64)),
                        np.zeros(len(ids), np.int64))
    spos = np.searchsorted(ids, s)
    dpos = np.searchsorted(ids, d)
    for _ in range(rounds):
        h = _mix_color(color[spos])
        hsum = np.zeros(len(ids), np.uint64)
        cnt = np.zeros(len(ids), np.int64)
        np.add.at(hsum, dpos, h)
        np.add.at(cnt, dpos, 1)
        color = _next_color(color, hsum, cnt)
    return color
