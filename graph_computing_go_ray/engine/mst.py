"""Borůvka minimum spanning forest (Borůvka 1926, public) composed from
the repo's distributed primitives — the classic log-round MST scheme that
parallelizes where Kruskal's sequential sort does not.

Each round over the current component assignment:
- map both edge endpoints to their component (two bucketed joins against
  the vertex→component table), drop intra-component edges;
- every component selects its minimum incident edge under the STRICT
  total order (w, min(u,v), max(u,v)) — a doubled directed view + one
  bucketed per-component min, so ties can never create cycles and the
  resulting forest equals Kruskal's under the same order;
- the selected component graph (≤ one edge per component) is contracted
  with the hash-min connected-components superstep, and the vertex table
  re-labels through one bucketed join.

Component count at least halves per round ⇒ ≤ log2(V) rounds; each round
is a handful of bucketed exchanges plus one CC run on a geometrically
shrinking component graph. The driver holds only per-round counts (the
iterative contraction loop is driver-coordinated like bpe_train's merge
loop — each round depends on the last).

Parity: exact edge-set equality against a Kruskal union-find replica
under the same total order (tests/test_graph_extras.py) — the strict
order makes the MSF unique, so set equality is the right oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def _coalesce_int(a, b) -> pa.Array:
    import pyarrow.compute as pc

    return pc.coalesce(a, b).combine_chunks().cast(pa.int64())


def boruvka_msf(
    edges: Dataset, workdir: str, weight_col: str = "w",
    num_buckets: int = 8, max_rounds: int = 40,
    local_cutoff: int = 500_000,
) -> tuple[Dataset, dict]:
    """((u, v, w) MSF edge Dataset with u < v, run info). ``edges`` is an
    undirected edge list (each edge once, either orientation; self-loops
    ignored). Weights must be numeric; ties are broken by endpoint ids."""
    from .components import connected_components
    from .join import bucket_grouped, bucket_join

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table({
            "u": pa.array(np.minimum(s, d), pa.int64()),
            "v": pa.array(np.maximum(s, d), pa.int64()),
            "w": pa.array(w, pa.float64()),
        })

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()

    # whole-graph fast path: below the cutoff a single in-process Kruskal
    # beats ~log2(V) rounds of distributed fixed costs outright (the
    # triangles/scc small-input precedent); the distributed loop is the
    # scale path and stays regression-pinned via local_cutoff=0
    if e.count() <= local_cutoff:
        pdf = e.to_pandas()
        msf = python_kruskal_replica(
            zip(pdf["u"], pdf["v"], pdf["w"]))
        # parallel edges: the tree uses the MIN weight of the pair
        wmin = pdf.groupby(["u", "v"])["w"].min()
        wmap = {(int(u), int(v)): float(w) for (u, v), w in wmin.items()}
        rows = sorted(msf)
        out = rd.from_arrow(pa.table({
            "u": pa.array([u for u, _ in rows], pa.int64()),
            "v": pa.array([v for _, v in rows], pa.int64()),
            "w": pa.array([wmap[r] for r in rows], pa.float64()),
        }))
        return out, {"rounds": 0, "local": True}

    def vid_rows(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"vid": pa.array(ids, pa.int64())})

    comp = bucket_grouped(
        e.map_batches(vid_rows, batch_format="pyarrow"), ["vid"],
        lambda g: g[["vid"]].drop_duplicates(),
        out_schema=pa.schema([("vid", pa.int64())]),
        num_buckets=num_buckets,
    ).map_batches(
        lambda t: t.append_column("comp", t["vid"]), batch_format="pyarrow"
    ).materialize()

    msf_parts: list[Dataset] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        ec = bucket_join(e, comp.rename_columns({"vid": "u_", "comp": "cu"}),
                         on="u", right_on="u_", how="inner",
                         num_buckets=num_buckets)
        ec = bucket_join(ec, comp.rename_columns({"vid": "v_", "comp": "cv"}),
                         on="v", right_on="v_", how="inner",
                         num_buckets=num_buckets)

        def inter(t: pa.Table) -> pa.Table:
            cu = t["cu"].to_numpy(zero_copy_only=False)
            cv = t["cv"].to_numpy(zero_copy_only=False)
            keep = cu != cv
            cu, cv = cu[keep], cv[keep]
            u = t["u"].to_numpy(zero_copy_only=False)[keep]
            v = t["v"].to_numpy(zero_copy_only=False)[keep]
            w = t["w"].to_numpy(zero_copy_only=False)[keep]
            # doubled directed view: each component sees its incident edges
            return pa.table({
                "comp": pa.array(np.concatenate([cu, cv]), pa.int64()),
                "ocomp": pa.array(np.concatenate([cv, cu]), pa.int64()),
                "u": pa.array(np.concatenate([u, u]), pa.int64()),
                "v": pa.array(np.concatenate([v, v]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.float64()),
            })

        cand = ec.map_batches(inter, batch_format="pyarrow").materialize()
        if cand.count() == 0:
            break

        def pick_min(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["comp", "w", "u", "v"])
            return g.groupby("comp", as_index=False).first()[
                ["comp", "ocomp", "u", "v", "w"]]

        sel = bucket_grouped(
            cand, ["comp"], pick_min,
            out_schema=pa.schema([("comp", pa.int64()), ("ocomp", pa.int64()),
                                  ("u", pa.int64()), ("v", pa.int64()),
                                  ("w", pa.float64())]),
            num_buckets=num_buckets,
        ).materialize()

        # an edge may be chosen by both endpoint components — dedup
        chosen = bucket_grouped(
            sel.select_columns(["u", "v", "w"]), ["u"],
            lambda g: g.drop_duplicates(["u", "v"])[["u", "v", "w"]],
            out_schema=pa.schema([("u", pa.int64()), ("v", pa.int64()),
                                  ("w", pa.float64())]),
            num_buckets=num_buckets,
        ).materialize()
        msf_parts.append(chosen)

        # contract: CC over the selected component graph. The selection
        # graph has <= one edge per component, so it is comp-count-sized;
        # below `local_cutoff` edges one in-process union-find beats the
        # per-round fixed superstep cost (the engine/scc.py local_cutoff
        # pattern; labels = min comp id, matching hash-min semantics).
        # local_cutoff=0 pins the all-distributed path (regression test).
        sel_edges = sel.select_columns(["comp", "ocomp"])
        if sel_edges.count() <= local_cutoff:
            pdf = sel_edges.to_pandas()
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(pdf["comp"].to_numpy(), pdf["ocomp"].to_numpy()):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            lab = pd.DataFrame({"id": list(parent)})
            lab["label"] = [find(int(x)) for x in lab["id"]]
            labels = rd.from_arrow(
                pa.Table.from_pandas(lab, preserve_index=False).cast(
                    pa.schema([("id", pa.int64()), ("label", pa.int64())])))
        else:
            cc_dir = os.path.join(workdir, f"round-{rounds:02d}")
            labels, _ = connected_components(
                sel_edges.rename_columns({"comp": "src", "ocomp": "dst"}),
                cc_dir, num_parts=num_buckets,
            )
        comp = bucket_join(
            comp, labels.rename_columns({"id": "c_", "label": "newc"}),
            on="comp", right_on="c_", how="left", num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table({
                "vid": t["vid"],
                # comps with no inter-comp edge this round are absent from
                # the CC labels (left-join null) — they keep their label
                "comp": _coalesce_int(t["newc"], t["comp"]),
            }),
            batch_format="pyarrow",
        ).materialize()

    out = msf_parts[0] if msf_parts else rd.from_arrow(pa.table(
        {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
         "w": pa.array([], pa.float64())}))
    for p in msf_parts[1:]:
        out = out.union(p)
    return out.materialize(), {"rounds": rounds}


def python_kruskal_replica(edge_rows) -> set:
    """Kruskal union-find under the same (w, u, v) total order; returns
    the unique MSF as a set of (u, v) with u < v."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    msf = set()
    rows = sorted(
        (float(w), int(min(s, d)), int(max(s, d)))
        for s, d, w in edge_rows if s != d
    )
    for w, u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            msf.add((u, v))
    return msf
