"""[north-rule] SALSA — Stochastic Approach for Link-Structure Analysis
(Lempel & Moran, WWW 2000; public algorithm). The random-walk alternative
to HITS: the authority score of v is the stationary probability of the
two-step Markov chain authority→(back along an in-link to a hub)→(forward
along one of that hub's out-links); hubs symmetrically.

The paper's Theorem (§3.2) gives the closed form this module computes
distributedly instead of power-iterating: within each connected component
of the bipartite support graph the stationary authority weight is
in-degree / (component in-degree sum), and with the standard
disconnected-graph convention each component carries mass proportional to
its share of the side's vertices:

    a(v) = (n_auth(C(v)) / n_auth_total) * indeg(v) / indeg(C(v))
    h(u) = (n_hub(C(u))  / n_hub_total)  * outdeg(u) / outdeg(C(u))

(degrees count link multiplicity — the walk picks a uniformly random
incident LINK). That turns an iterative eigenproblem into: one
multiplicity pre-aggregation, one hash-min connected-components run over
side-encoded vertices (2u / 2v+1 so hub and authority id spaces can't
collide), two bucketed degree sums, one component-level sum, and two
size-adaptive joins back — no per-iteration shuffles at all, which is the
whole point at 10^12 edges.

Parity: a pure-python union-find replica of the same closed form AND a
lazy power iteration of the actual SALSA chain (the lazy chain keeps the
same stationary distribution and kills periodicity) agree with the
pipeline at 1e-9 / 1e-6 (tests/test_graph_extras.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .join import (
    adaptive_map_join,
    bucket_grouped_sum,
    default_num_buckets,
    rename_cols,
)


def salsa(
    edges: Dataset,
    workdir: str,
    num_parts: int = 8,
    num_buckets: int | None = None,
) -> Dataset:
    """SALSA over a directed (src=hub, dst=authority) edge table with
    multi-edges kept. Returns (id, side, score) where side is 'hub' or
    'auth' (an id may appear on both sides; ids are reported in their
    original space)."""
    from .components import connected_components

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "w": pa.array(np.ones(t.num_rows, np.int64)),
        })

    ew = bucket_grouped_sum(
        edges.select_columns(["src", "dst"]).map_batches(
            ones, batch_format="pyarrow"),
        ["src", "dst"], ["w"], num_buckets=num_buckets,
    ).materialize()

    def enc(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": 2 * s, "dst": 2 * d + 1})

    labels, _ = connected_components(
        ew.map_batches(enc, batch_format="pyarrow"),
        f"{workdir}/cc", num_parts=num_parts,
    )
    labels = labels.materialize()

    def side_scores(deg: Dataset, parity: int, side: str) -> Dataset:
        """deg = (id, deg) one side's multiplicity degree table."""
        def encode(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "id": t["id"], "deg": t["deg"], "eid": 2 * i + parity,
            })

        dl = adaptive_map_join(
            deg.map_batches(encode, batch_format="pyarrow"), labels,
            on="eid", key_col="id", val_cols=["label"],
            num_buckets=num_buckets,
        ).materialize()
        n_total = dl.count()

        def one_col(t: pa.Table) -> pa.Table:
            return pa.table({
                "label": t["label"], "degsum": t["deg"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            })

        comp = bucket_grouped_sum(
            dl.map_batches(one_col, batch_format="pyarrow"),
            ["label"], ["degsum", "n"], num_buckets=num_buckets,
        )
        out = adaptive_map_join(
            dl, comp, on="label", key_col="label",
            val_cols=["degsum", "n"], num_buckets=num_buckets,
        )

        def score(t: pa.Table) -> pa.Table:
            d = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            ds_ = t["degsum"].to_numpy(zero_copy_only=False).astype(np.float64)
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            val = (n / float(n_total)) * (d / ds_)
            return pa.table({
                "id": t["id"],
                "side": pa.array(np.full(t.num_rows, side, object), pa.string()),
                "score": pa.array(np.round(val, 9)),
            })

        return out.map_batches(score, batch_format="pyarrow")

    outdeg = rename_cols(
        bucket_grouped_sum(ew.select_columns(["src", "w"]), ["src"], ["w"],
                           num_buckets=num_buckets),
        {"src": "id", "w": "deg"},
    )
    indeg = rename_cols(
        bucket_grouped_sum(ew.select_columns(["dst", "w"]), ["dst"], ["w"],
                           num_buckets=num_buckets),
        {"dst": "id", "w": "deg"},
    )
    hubs = side_scores(outdeg, 0, "hub")
    auths = side_scores(indeg, 1, "auth")
    return hubs.union(auths)
