"""k-truss decomposition (fixed k): the maximal subgraph in which every
edge participates in at least k-2 triangles. The classic cohesive-subgraph
refinement of triangle counting (Cohen, "Trusses: cohesive subgraphs for
social network analysis", 2008 — public formulation).

Algorithm: support peeling to fixpoint. Each round computes per-edge
triangle support with the wedge-closing kernel (engine/linkpred.py
common_neighbor_edges — each triangle adds 1 to each of its 3 edges via
the wedge centered at the opposite vertex) and drops edges with
support < k-2. Deleting an edge can only lower other edges' supports, so
supports are recomputed on the shrunk graph until no edge is dropped.

Scale shape: every round is the same bucketed wedge-generation +
edge-closure exchange as triangle_count — no per-round state beyond the
current edge set, which is checkpoint-free (the surviving set IS the
state and is re-derivable from any round's output). Rounds are bounded by
the peel depth (small in practice; max_rounds guards pathological
inputs). The broadcast fast path / tagged-union fallback choice is
inherited from the wedge kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .linkpred import common_neighbor_edges
from .triangles import undirected_distinct


def ktruss_edges(
    edges: Dataset,
    k: int,
    num_buckets: int | None = None,
    max_rounds: int = 64,
    broadcast_max_edges: int = 20_000_000,
) -> tuple[Dataset, dict]:
    """Surviving (u, v) edges of the k-truss, plus {'rounds': r,
    'n_edges': per-round edge counts}. k >= 2; k=2 returns the distinct
    undirected graph unchanged (support >= 0 always holds)."""
    import ray.data as rd

    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    need = k - 2
    cur = undirected_distinct(edges).materialize()
    counts = [cur.count()]
    rounds = 0
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    for _ in range(max_rounds):
        if need == 0 or counts[-1] == 0:
            break
        rounds += 1
        scored = common_neighbor_edges(
            cur, num_buckets=num_buckets,
            broadcast_max_edges=broadcast_max_edges,
            assume_canonical=True,  # cur is (u=min, v=max) distinct
        )
        # edges with ZERO common neighbors never reach `scored` (the wedge
        # kernel only emits closed wedges) — filtering scored rows by
        # cn >= need therefore drops them implicitly, which is correct:
        # support 0 < need for any k > 2.
        survivors = scored.filter(
            expr=f"cn >= {need}"
        ).select_columns(["u", "v"]).materialize()
        n = survivors.count()
        if n == counts[-1]:
            counts.append(n)
            break
        counts.append(n)
        if n == 0:
            cur = rd.from_arrow(empty)
            break
        cur = survivors
    return cur, {"rounds": rounds, "n_edges": counts}
