"""OpenAlex-style citation-graph analyses — the Ray rebuild of `oae -t
total` (SURVEY §3.3, /root/reference/internal/openAlexEntropy/
openAlexEntropy.go:136-311): per-year iterative fold with shrink, dual
rankings, percent slices and entropy reports.

Fold semantics (ST3): snapshot_y = shrink(snapshot_{y+1} ∩ year<=y) —
each year is ONE filter over the previous year's checkpointed edge set,
never a recompute from scratch; per-year Parquet checkpoints make the fold
resumable mid-sequence (the north rule's resume surface for this pipeline).

Per year (openAlexEntropy.go:255-306):
- M7 load filter: drop works with links_in_works==0 AND no refs (:215-218)
- A3 shrink: drop edges whose endpoint left the snapshot; recompute
  current in-degree (:341-363)
- T4: keep vertices with current in-degree >= 2 (:365-374)
- T2×2: rank by current in-degree and by global links_in_works (:261-271)
- T3: percent slices {10..100} × both rankings → J4 induced subgraph →
  A4/A5 entropy reports (rank ties broken by id — deterministic deviation)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..engine import entropy as ent_k

PERCENT_PLANS = [(0, e) for e in (10, 20, 40, 60, 80, 100)]


def load_works_graph(works_dir: str) -> tuple[Dataset, Dataset]:
    """(vertices, edges): M7-filtered works + exploded reference edges.
    Edge sources/targets are both restricted to surviving vertices lazily
    (the year filters handle the rest)."""
    w = rd.read_parquet(
        os.path.join(works_dir, "works.parquet"),
        columns=["id", "publication_year", "referenced_works", "links_in_works"],
    )

    def vfilter(t: pa.Table) -> pa.Table:
        useless = pc.and_(
            pc.equal(t["links_in_works"], 0),
            pc.equal(pc.list_value_length(t["referenced_works"]), 0),
        )
        f = t.filter(pc.invert(useless))
        return f.select(["id", "publication_year", "links_in_works"])

    vertices = w.map_batches(vfilter, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        useless = pc.and_(
            pc.equal(t["links_in_works"], 0),
            pc.equal(pc.list_value_length(t["referenced_works"]), 0),
        )
        f = t.filter(pc.invert(useless))
        lens = pc.list_value_length(f["referenced_works"]).to_numpy(zero_copy_only=False)
        src = np.repeat(f["id"].to_numpy(zero_copy_only=False), lens)
        sy = np.repeat(
            f["publication_year"].to_numpy(zero_copy_only=False), lens
        )
        dst = pc.list_flatten(f["referenced_works"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
             "src_year": pa.array(sy, pa.int32())}
        )

    edges = w.map_batches(explode, batch_format="pyarrow")
    return vertices, edges


def _attach_dst_year(edges: Dataset, vertices: Dataset, num_buckets: int = 4) -> Dataset:
    from ..engine.join import bucket_join, rename

    vy = vertices.select_columns(["id", "publication_year"])
    return bucket_join(
        edges, rename(vy, {"id": "did", "publication_year": "dst_year"}),
        on="dst", right_on="did", how="inner", num_buckets=num_buckets,
    )


def yearly_fold(
    works_dir: str, out_root: str,
    years: list[int], percent_plans=None, num_buckets: int = 4,
) -> pd.DataFrame:
    """Run the fold newest→oldest over `years` (must be descending).
    Returns the per-(year, rank_type, slice) entropy report frame; per-year
    edge snapshots are checkpointed under out_root/year=Y/ for resume."""
    percent_plans = percent_plans or PERCENT_PLANS
    vertices, edges0 = load_works_graph(works_dir)
    vertices = vertices.materialize()
    # dst_year attached once; the per-year shrink is then a pure filter
    edges_all = _attach_dst_year(edges0, vertices, num_buckets)

    from ..engine.join import bucket_join, rename
    from ..engine.rank import percent_slice_boundaries, slice_member_mask

    reports = []
    prev_edges: Dataset | None = None
    for year in years:
        ydir = os.path.join(out_root, f"year={year}")
        epath = os.path.join(ydir, "edges")
        if os.path.exists(os.path.join(ydir, "_SUCCESS")):
            snap = rd.read_parquet(epath, columns=["src", "dst", "src_year", "dst_year"])
        else:
            base = prev_edges if prev_edges is not None else edges_all
            snap = base.map_batches(
                lambda t, _y=year: t.filter(
                    pc.and_(pc.less_equal(t["src_year"], _y),
                            pc.less_equal(t["dst_year"], _y))
                ),
                batch_format="pyarrow",
            )
            os.makedirs(ydir, exist_ok=True)
            from ..engine.join import write_parquet_safe

            write_parquet_safe(snap, epath, pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()),
                 ("src_year", pa.int32()), ("dst_year", pa.int32())]))
            with open(os.path.join(ydir, "_SUCCESS"), "w") as f:
                f.write("ok")
            snap = rd.read_parquet(epath, columns=["src", "dst", "src_year", "dst_year"])
        snap = snap.materialize()
        prev_edges = snap

        # A3: current in-degree of the shrunk graph — kept DISTRIBUTED
        # (VERDICT r1 #5: no vertex-scale to_pandas on the driver)
        from ..engine.join import bucket_grouped_count

        cur = bucket_grouped_count(snap, ["dst"], "cur_in",
                                   num_buckets=num_buckets)
        vy = vertices.filter(expr=f"publication_year <= {year}")
        vy = bucket_join(
            vy.select_columns(["id", "links_in_works"]),
            rename(cur, {"dst": "cid"}),
            on="id", right_on="cid", how="left", num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table(
                {"id": t["id"], "links_in_works": t["links_in_works"],
                 "cur_in": t["cur_in"].fill_null(0)}
            ),
            batch_format="pyarrow",
        # T4 threshold (openAlexEntropy.go:365-374)
        ).filter(expr="cur_in >= 2").materialize()
        n_total = vy.count()
        if n_total == 0:
            continue

        # both endpoint (cur_in, links_in_works) attached ONCE per year;
        # every (rank_type, slice) is then a vectorized predicate filter
        e1 = bucket_join(
            snap.select_columns(["src", "dst"]),
            rename(vy, {"id": "sid", "cur_in": "s_cur", "links_in_works": "s_liw"}),
            on="src", right_on="sid", how="inner", num_buckets=num_buckets,
        )
        e2 = bucket_join(
            e1, rename(vy, {"id": "did", "cur_in": "d_cur", "links_in_works": "d_liw"}),
            on="dst", right_on="did", how="inner", num_buckets=num_buckets,
        ).materialize()

        for rank_type, key, scol, dcol in (
            ("current", "cur_in", "s_cur", "d_cur"),
            ("total", "links_in_works", "s_liw", "d_liw"),
        ):
            bounds = percent_slice_boundaries(
                vy.select_columns(["id", key]), key, "id",
                [e for _, e in percent_plans], n_total,
            )
            for start, end in percent_plans:
                b = bounds[end]

                def in_slice(t: pa.Table, _b=b, _s=scol, _d=dcol) -> pa.Table:
                    s = t["src"].to_numpy(zero_copy_only=False)
                    d = t["dst"].to_numpy(zero_copy_only=False)
                    sd = t[_s].to_numpy(zero_copy_only=False)
                    dd = t[_d].to_numpy(zero_copy_only=False)
                    m = slice_member_mask(sd, s, _b) & slice_member_mask(dd, d, _b)
                    return pa.table(
                        {"src": t["src"].filter(pa.array(m)),
                         "dst": t["dst"].filter(pa.array(m))}
                    )

                sub = e2.map_batches(in_slice, batch_format="pyarrow").materialize()
                n_edges = sub.count()
                if n_edges == 0:
                    continue
                rep = ent_k.entropy_report(sub)
                reports.append({
                    "year": year, "rank_type": rank_type,
                    "start_percent": start, "end_percent": end,
                    "graph_size": rep["node_count"], "edge_count": n_edges,
                    **{k: v for k, v in rep.items()},
                })
    return pd.DataFrame(reports)
