"""[north-rule] Personalized PageRank — PageRank with the teleport vector
concentrated on a seed set (public algorithm; the standard random-walk-with-
restart ranking used for seed-relative relevance on link graphs).

    r_{k+1}(v) = (1-d)*p(v) + d * ( sum_{u->v} r_k(u)/outdeg(u) + D_k*p(v) )
with p(v) = 1/|S| for v in the seed set S, else 0; dangling mass D_k also
restarts at the seeds. Reuses the PageRank gather (messages are identical);
only the restart/apply step differs. Convergence: L1 delta below tol; parity
oracle is a numpy power iteration of the same formulation
(tests/test_superstep.py), allclose 1e-6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from .pagerank import PageRankProgram
from .superstep import build_graph_partitions, final_state, run_supersteps


class PersonalizedPageRankProgram(PageRankProgram):
    name = "personalized_pagerank"

    def __init__(self, seed_ids: np.ndarray, damping: float = 0.85,
                 tol: float = 1e-9):
        super().__init__(damping, tol)
        self.seeds = np.sort(np.asarray(seed_ids, dtype=np.int64))
        if len(self.seeds) == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")
        self.params = {"damping": damping, "tol": tol,
                       "n_seeds": int(len(self.seeds))}

    def _p(self, ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.seeds, ids)
        pos = np.clip(pos, 0, len(self.seeds) - 1)
        member = self.seeds[pos] == ids
        return member.astype(np.float64) / len(self.seeds)

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame(
            {"id": ids, "rank": self._p(ids), "out_degree": out_degree}
        )

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        sums = np.zeros(len(sid))
        if len(msgs):
            u, inv = np.unique(msgs["dst"].to_numpy(), return_inverse=True)
            agg = np.bincount(inv, weights=msgs["contrib"].to_numpy())
            sums[np.searchsorted(sid, u)] = agg
        d = self.damping
        p = self._p(sid)
        dang = global_vals["dangling_mass"]
        new_rank = (1.0 - d) * p + d * (sums + dang * p)
        old = state["rank"].to_numpy()
        out = state.copy()
        out["rank"] = new_rank
        dangling = state["out_degree"].to_numpy() == 0
        return out, {
            "delta": float(np.abs(new_rank - old).sum()),
            "dangling_next": float(new_rank[dangling].sum()),
            "rank_sum": float(new_rank.sum()),
            "n": len(out),
        }


def personalized_pagerank(
    edges: Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
    num_parts: int = 8,
    resume: bool = True,
) -> tuple[Dataset, dict]:
    """Run PPR from `seed_ids` to convergence; returns ((id, rank), info).
    Use a distinct workdir per (program, seed set): iteration state and
    lineage manifests live directly under the workdir root."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts)
    prog = PersonalizedPageRankProgram(seed_ids, damping, tol)
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    ranks = final_state(workdir).select_columns(["id", "rank"])
    return ranks, {**run, **info}
