"""Longest-path layering on a DAG via max-plus supersteps — the citation-
depth analysis (how deep a work's longest reference chain runs), the DAG
dual of engine/bfs.py's min-plus hop distances.

Messages flow along edges (src = referenced work, dst = citing work):
every vertex starts at depth 0, offers depth+1 to its dsts, and receivers
keep the max. The delta optimization gates offers on a ``fresh`` flag —
after the first round only vertices whose depth GREW re-offer, so message
volume decays with the frontier instead of rescanning every edge's state
change-free. Converges in exactly longest-chain-length rounds; on a DAG
the fixpoint is the exact longest path ending at each vertex.

Cycles would never converge (depth grows forever); callers must orient
edges acyclically first (citation_depth drops forward citations — edges
are kept only when referenced < citing under the fixture's year-sorted id
order, pipelines/citations.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .superstep import VertexProgram, build_graph_partitions, final_state, run_supersteps


class MaxDepthProgram(VertexProgram):
    name = "dagdepth"
    message_schema = pa.schema(
        [("part_dst", pa.int64()), ("dst", pa.int64()), ("depth", pa.int64())]
    )

    def __init__(self):
        self.params = {}

    def init_state(self, ids, out_degree, in_degree, n_total):
        return pd.DataFrame({
            "id": ids,
            "depth": np.zeros(len(ids), np.int64),
            "fresh": np.ones(len(ids), np.int64),
        })

    def gather(self, edges, state_of, global_vals):
        outs = []
        part_arr = edges["part"].to_numpy()
        for p in np.unique(part_arr):
            m = part_arr == p
            st = state_of[int(p)]
            sid = st["id"].to_numpy()
            pos = np.searchsorted(sid, edges["src"].to_numpy()[m])
            fresh = st["fresh"].to_numpy()[pos] != 0
            if not fresh.any():
                continue
            d = st["depth"].to_numpy()[pos][fresh]
            dst = edges["dst"].to_numpy()[m][fresh]
            offer = d + 1
            order = np.argsort(dst, kind="stable")
            ds_, of = dst[order], offer[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            outs.append(pd.DataFrame(
                {"dst": ds_[starts], "depth": np.maximum.reduceat(of, starts)}
            ))
        if not outs:
            return pd.DataFrame({"dst": pd.Series([], dtype=np.int64),
                                 "depth": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_apply(self, state, msgs, global_vals):
        sid = state["id"].to_numpy()
        old = state["depth"].to_numpy()
        new = old.copy()
        if len(msgs):
            dst = msgs["dst"].to_numpy()
            dm = msgs["depth"].to_numpy()
            order = np.argsort(dst, kind="stable")
            ds_, dm_ = dst[order], dm[order]
            starts = np.flatnonzero(np.concatenate([[True], ds_[1:] != ds_[:-1]]))
            pos = np.searchsorted(sid, ds_[starts])
            offers = np.maximum.reduceat(dm_, starts)
            new[pos] = np.maximum(new[pos], offers)
        changed = new != old
        out = state.copy()
        out["depth"] = new
        out["fresh"] = changed.astype(np.int64)
        return out, {"changed": int(changed.sum()), "n": len(out)}

    def init_metrics(self, state):
        return {"changed": len(state)}  # round 1: everyone offers

    def converged(self, metrics):
        return "changed" in metrics.columns and int(metrics["changed"].sum()) == 0


def dag_depths(
    edges: Dataset, workdir: str, max_iters: int = 512,
    num_parts: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """(id, depth) per vertex: length of the longest path ENDING at id
    (sources/leaves = 0). ``edges`` must be acyclic (src -> dst).

    Rounds = longest-chain length — right for shallow DAGs (real citation
    graphs run tens of generations deep); for deep chains relative to the
    partition count use :func:`dag_depths_striped` (rounds = num_stripes
    regardless of depth)."""
    from .superstep import _load_graph_meta, load_edge_blocks

    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts,
                                      symmetrize=False)
    prog = MaxDepthProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    run = run_supersteps(edges_ds, workdir, prog, info,
                         max_iters=max_iters, resume=resume)
    out = final_state(workdir).select_columns(["id", "depth"])
    return out, {**run, **info}


_DEPTH_SCHEMA = pa.schema([("id", pa.int64()), ("depth", pa.int64())])
_OFFER_SCHEMA = pa.schema([("dst", pa.int64()), ("cand", pa.int64())])


def _stripe_of(arr: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    return np.searchsorted(bounds, arr, side="right") - 1


def _dp_stripe(intra_path, offers_path, vertex_path, out_path):
    """One-task exact DP over a stripe: ids inside a stripe are processed
    in ascending (= topological) order, seeded by the cross-stripe offers.
    Runs as a Ray task so stripe-sized bytes never touch the driver."""
    import pyarrow.parquet as pq

    depth: dict[int, int] = {}
    if offers_path is not None:
        ot = pq.read_table(offers_path)
        for v, c in zip(ot["dst"].to_numpy(), ot["cand"].to_numpy()):
            depth[int(v)] = int(c)
    if intra_path is not None:
        it = pq.read_table(intra_path, columns=["src", "dst"])
        src = it["src"].to_numpy()
        dst = it["dst"].to_numpy()
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(
            np.concatenate([[True], dst[1:] != dst[:-1]]))
        ends = np.append(starts[1:], len(dst))
        for a, b in zip(starts, ends):  # dst ascending = topological sweep
            d = int(dst[a])
            best = depth.get(d, 0)
            for s_ in src[a:b]:
                c = depth.get(int(s_), 0) + 1
                if c > best:
                    best = c
            depth[d] = best
    vt = pq.read_table(vertex_path, columns=["id"])
    ids = np.unique(vt["id"].to_numpy())
    out = pa.table({
        "id": pa.array(ids, pa.int64()),
        "depth": pa.array([depth.get(int(v), 0) for v in ids], pa.int64()),
    })
    from ..state import checkpoint as ckpt

    ckpt.write_table_at(out_path, out)
    return len(ids)


def dag_depths_striped(
    edges: Dataset, workdir: str, num_stripes: int = 8,
    join_buckets: int = 8, resume: bool = True,
) -> tuple[Dataset, dict]:
    """Exact longest-path depth on an id-topologically-ordered DAG (every
    edge has src < dst) in O(num_stripes) Ray stages, independent of chain
    depth — the wavefront dual of the max-plus superstep, which needs one
    shuffle round PER depth level (a 260-deep citation fixture costs 260
    rounds there vs 8 here).

    Shape: ids are cut into ``num_stripes`` contiguous ranges; stripes run
    in ascending order. Cross-stripe in-edges of stripe s join (bucketed,
    never broadcast) against the already-final depths of stripes < s and
    reduce to per-dst max offers; one Ray task then sweeps the stripe's
    intra edges in ascending-dst order (every intra predecessor is final by
    the time its successor is reached). Each stripe's (id, depth) shard is
    written to ``workdir`` before the next stripe starts, so a killed run
    resumes at the first unwritten stripe.

    Partitioning assumptions, stated: (1) equal-WIDTH id stripes assume
    roughly uniform id density (true for sequential document/work ids;
    skewed id spaces should pick bounds from sampled quantiles); (2) one
    stripe's vertex set + intra edges fit one worker's heap — num_stripes
    is the knob, and the per-stripe sequential sweep is the inherent
    serial frontier of longest-path, not an implementation shortcut."""
    import os

    import ray
    import ray.data as rd

    from ..state import checkpoint as ckpt
    from .join import bucket_grouped, bucket_join

    depths_dir = ckpt.join(workdir, "depths")
    edges_dir = ckpt.join(workdir, "sedges")
    verts_dir = ckpt.join(workdir, "sverts")
    meta_path = ckpt.join(workdir, "stripes.json")

    def _depth_file(s: int) -> str:
        return ckpt.join(depths_dir, f"stripe-{s:05d}.parquet")

    if not (resume and ckpt.exists(meta_path)):
        # pass 1: id range (tiny per-block partials)
        def mm(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy()
            d = t["dst"].to_numpy()
            lo = min(s.min(), d.min()) if len(s) else np.iinfo(np.int64).max
            hi = max(s.max(), d.max()) if len(s) else np.iinfo(np.int64).min
            return pa.table({"lo": pa.array([int(lo)], pa.int64()),
                             "hi": pa.array([int(hi)], pa.int64())})

        edges = edges.materialize()
        ext = edges.map_batches(mm, batch_format="pyarrow").to_pandas()
        lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
        bounds = np.unique(
            np.linspace(lo, hi + 1, num_stripes + 1).astype(np.int64))
        ns = len(bounds) - 1

        # pass 2: tag edges by dst stripe, split cross/intra, hive-write
        def tag(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy()
            d = t["dst"].to_numpy()
            ss = _stripe_of(s, bounds)
            ds_ = _stripe_of(d, bounds)
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "rel": pa.array(np.where(ss < ds_, "cross", "intra")),
                "dstripe": pa.array(ds_, pa.int64()),
            })

        edges.map_batches(tag, batch_format="pyarrow").write_parquet(
            edges_dir, partition_cols=["rel", "dstripe"], mode="overwrite")

        # pass 3: per-stripe vertex universe (block-deduped)
        def verts(t: pa.Table) -> pa.Table:
            ids = np.unique(np.concatenate(
                [t["src"].to_numpy(), t["dst"].to_numpy()]))
            return pa.table({"id": pa.array(ids, pa.int64()),
                             "stripe": pa.array(_stripe_of(ids, bounds),
                                                pa.int64())})

        edges.map_batches(verts, batch_format="pyarrow").write_parquet(
            verts_dir, partition_cols=["stripe"], mode="overwrite")
        import json

        fs, p = ckpt.get_fs(meta_path)
        with fs.open_output_stream(p) as f:
            f.write(json.dumps(
                {"bounds": [int(b) for b in bounds], "ns": ns}
            ).encode())
    else:
        import json

        fs, p = ckpt.get_fs(meta_path)
        with fs.open_input_stream(p) as f:
            meta = json.loads(f.read().decode())
        bounds = np.asarray(meta["bounds"], np.int64)
        ns = meta["ns"]

    ckpt.ensure_dir(depths_dir)
    dp_task = ray.remote(num_cpus=1)(_dp_stripe)
    done_files: list[str] = []
    ran = 0
    for s in range(ns):
        df = _depth_file(s)
        vpath = os.path.join(verts_dir, f"stripe={s}")
        if not os.path.isdir(vpath):
            continue  # empty stripe
        if resume and ckpt.exists(df):
            done_files.append(df)
            continue
        cross_path = os.path.join(edges_dir, "rel=cross", f"dstripe={s}")
        offers_path = None
        if os.path.isdir(cross_path) and done_files:
            cross = rd.read_parquet(cross_path, columns=["src", "dst"])
            joined = bucket_join(
                cross, rd.read_parquet(done_files),
                on="src", right_on="id", how="left",
                num_buckets=join_buckets,
            )

            def to_cand(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                cand = pc.add(pc.fill_null(t["depth"].cast(pa.int64()), 0), 1)
                return pa.table({"dst": t["dst"], "cand": cand})

            def fmax(g: "pd.DataFrame") -> "pd.DataFrame":
                return g.groupby("dst", as_index=False)["cand"].max()

            offers = bucket_grouped(
                joined.map_batches(to_cand, batch_format="pyarrow"),
                ["dst"], fmax, num_buckets=join_buckets,
                out_schema=_OFFER_SCHEMA,
            )
            offers_path = ckpt.join(workdir, f"offers-{s:05d}")
            from .join import write_parquet_safe

            write_parquet_safe(offers, offers_path, _OFFER_SCHEMA)
        intra_path = os.path.join(edges_dir, "rel=intra", f"dstripe={s}")
        if not os.path.isdir(intra_path):
            intra_path = None
        ray.get(dp_task.remote(intra_path, offers_path, vpath, df))
        done_files.append(df)
        ran += 1

    out = rd.read_parquet(done_files) if done_files else rd.from_arrow(
        _DEPTH_SCHEMA.empty_table())
    return out, {"num_stripes": ns, "stripes_run": ran,
                 "bounds": [int(b) for b in bounds]}
