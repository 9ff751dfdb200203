"""Per-year snapshot analyses over the web-pages link graph — the Ray
rebuild of the reference's yearly pipelines (SURVEY §3.2):

- wikiEntropy Main (wikiEntropy.go:58-114): per year, resolve the year's
  pages (J1-J3), rank non-redirect vertices by in-degree, take the 6
  percent slices {10,20,40,60,80,100}, build each slice's induced subgraph
  (J4) and report degree-distribution + structural entropies (A4/A5).
- GraphDegreeStats (degreeStats.go:12-47): per-year histograms with the
  reference's naming QUIRK replicated: `links_in` is keyed by RESOLVED
  out-degree (len(PageLinksOutIDs)) and `links_out` by the RAW link count
  (len(PageLinksOut)) — SURVEY §7.6 deviations ledger.
- wikipediaInDegree (wikipediaInDegree.go:23-85): per-vertex in-degree
  export rows (K9), id = "pageID-year".

A web page has one revision, so a page belongs to the snapshot year of its
warc_ts (the reference's M2 revision selection / forward-fill is a
revision-level concern; its per-group selection kernel is exercised by the
order_year_snapshot query instead). Resolution runs PER YEAR over that
year's pages, exactly like pageLinkHandle on a year's cursor."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..engine import entropy as ent_k
from ..stages.resolve import (
    resolve_edges,
    resolve_redirect_ids,
    vertices_from_extracted,
    write_resolution_buckets,
)

PERCENT_PLANS = [(0, e) for e in (10, 20, 40, 60, 80, 100)]  # wikiEntropy.go:43-56


def partition_extracted_by_year(extracted_dir: str, out_root: str) -> str:
    """ONE pass over the extracted table writing a hive-partitioned copy
    (year=Y subdirs) so every per-year stage reads only its partition —
    round 1 rescanned the full table once per year (VERDICT r1 #7).
    Idempotent via a marker; returns the partition root."""
    part_root = os.path.join(out_root, "extracted_by_year")
    marker = os.path.join(part_root, "_SUCCESS")
    if os.path.exists(marker):
        return part_root
    ext = rd.read_parquet(
        extracted_dir,
        columns=["url", "warc_ts", "links_out", "redirect", "core_subject_tag"],
    )

    def add_year(t: pa.Table) -> pa.Table:
        return t.append_column(
            "year", pc.cast(pc.year(t["warc_ts"]), pa.int32())
        )

    ext.map_batches(add_year, batch_format="pyarrow").write_parquet(
        part_root, partition_cols=["year"], mode="overwrite"
    )
    with open(marker, "w") as f:
        f.write("ok")
    return part_root


def read_year_pages(part_root: str, year: int,
                    columns: list[str] | None = None) -> Dataset | None:
    """Pruned read of one year partition; None when the year has no pages."""
    ydir = os.path.join(part_root, f"year={year}")
    if not os.path.isdir(ydir):
        return None
    return rd.read_parquet(ydir, columns=columns)


def build_yearly_graphs(
    extracted_dir: str, out_root: str, num_buckets: int = 4,
    years: list[int] | None = None,
) -> dict[int, dict[str, str]]:
    """Per-year resolution over the year's pages; returns year → paths
    (vertices, edges). Re-runs skip years whose marker exists. Reads are
    pruned to the year's hive partition (no full-table rescan per year)."""
    part_root = partition_extracted_by_year(extracted_dir, out_root)
    if years is None:
        years = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(part_root)
            if d.startswith("year=")
        )

    out: dict[int, dict[str, str]] = {}
    for year in years:
        ydir = os.path.join(out_root, f"year={year}")
        paths = {"vertices": os.path.join(ydir, "vertices"),
                 "edges": os.path.join(ydir, "edges")}
        out[year] = paths
        marker = os.path.join(ydir, "_SUCCESS")
        if os.path.exists(marker):
            continue
        ypages = read_year_pages(
            part_root, year, columns=["url", "links_out", "redirect"]
        )
        if ypages is None:
            ypages = rd.from_arrow(pa.table(
                {"url": pa.array([], pa.large_string()),
                 "links_out": pa.array([], pa.large_list(pa.large_string())),
                 "redirect": pa.array([], pa.large_string())}
            ))
        vertices = vertices_from_extracted(ypages).materialize()
        origin_dir, norm_dir = write_resolution_buckets(vertices, ydir, num_buckets)
        red = resolve_redirect_ids(vertices, origin_dir, norm_dir, num_buckets)
        from ..engine.join import bucket_join

        vert_out = bucket_join(
            vertices.select_columns(["id", "url", "redirect", "links_out"]),
            red, on="id", right_on="id", how="left", num_buckets=num_buckets,
        )
        from ..engine.join import write_parquet_safe

        write_parquet_safe(
            vert_out, paths["vertices"],
            pa.schema([("id", pa.int64()), ("url", pa.large_string()),
                       ("redirect", pa.large_string()),
                       ("links_out", pa.large_list(pa.large_string())),
                       ("redirect_id", pa.int64())]),
        )
        write_parquet_safe(
            resolve_edges(vertices, origin_dir, norm_dir, num_buckets),
            paths["edges"],
            pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _non_redirect_edges(paths: dict[str, str], num_buckets: int = 4) -> Dataset:
    """Edges from non-redirect sources (wikiEntropy.go:77-79)."""
    from ..engine.join import bucket_join

    verts = rd.read_parquet(paths["vertices"], columns=["id", "redirect"])
    keep = verts.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"])).select(["id"]),
        batch_format="pyarrow",
    ).rename_columns({"id": "vid"})
    e = rd.read_parquet(paths["edges"], columns=["src", "dst"])
    return bucket_join(e, keep, on="src", right_on="vid", how="inner",
                       num_buckets=num_buckets).select_columns(["src", "dst"])


def degree_stats(paths: dict[str, str], year: int) -> pd.DataFrame:
    """A2 with the reference quirk: rows (year, kind, degree, n_vertices),
    kind ∈ {links_in (resolved out-degree!), links_out (raw link count),
    links (sum)}; non-redirect vertices only (degreeStats.go:28-40)."""
    verts = rd.read_parquet(paths["vertices"], columns=["id", "redirect", "links_out"])
    nonred = verts.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"])),
        batch_format="pyarrow",
    )
    edges = rd.read_parquet(paths["edges"], columns=["src"])
    resolved_out = edges.groupby("src").aggregate(
        ray.data.aggregate.Count(alias_name="resolved_out")
    )
    from ..engine.join import bucket_join, rename

    j = bucket_join(
        nonred.map_batches(
            lambda t: pa.table(
                {"id": t["id"],
                 "raw_links": pc.cast(pc.list_value_length(t["links_out"]), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        rename(resolved_out, {"src": "rid"}),
        on="id", right_on="rid", how="left", num_buckets=4,
    )

    def hist(t: pa.Table) -> pa.Table:
        raw = t["raw_links"].to_numpy(zero_copy_only=False)
        res = t["resolved_out"].to_numpy(zero_copy_only=False)
        res = np.where(np.isnan(res.astype(np.float64)), 0, res).astype(np.int64)
        rows = []
        for kind, vals in (("links_in", res), ("links_out", raw),
                           ("links", res + raw)):
            v, c = np.unique(vals, return_counts=True)
            rows.append(pd.DataFrame(
                {"kind": kind, "degree": v.astype(np.int64),
                 "n_vertices": c.astype(np.int64)}
            ))
        return pa.Table.from_pandas(pd.concat(rows, ignore_index=True),
                                    preserve_index=False)

    h = j.map_batches(hist, batch_format="pyarrow").groupby(
        ["kind", "degree"]
    ).aggregate(Sum("n_vertices", alias_name="n_vertices")).to_pandas()
    h.insert(0, "year", year)
    return h


def entropy_slices(
    paths: dict[str, str], year: int, plans=None, num_buckets: int = 8,
) -> pd.DataFrame:
    """wikiEntropy Main per-year: rank by in-degree (-deg, id), 6 percent
    slices, induced-subgraph entropy reports (rows: one per slice).

    Fully distributed (VERDICT r1 #4): the rank is never materialized —
    each slice is a boundary (deg_t, id_t) from the degree-value histogram
    (engine/rank.py percent_slice_boundaries), edges carry both endpoint
    degrees via two bucketed joins done ONCE, and every slice is a
    vectorized predicate filter."""
    from ..engine.join import bucket_join, rename
    from ..engine.rank import percent_slice_boundaries, slice_member_mask

    edges = _non_redirect_edges(paths, num_buckets=num_buckets).materialize()
    verts = rd.read_parquet(paths["vertices"], columns=["id", "redirect"])
    nonred = verts.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"])).select(["id"]),
        batch_format="pyarrow",
    )
    from ..engine.join import bucket_grouped_count

    indeg = bucket_grouped_count(edges, ["dst"], "deg", num_buckets=num_buckets)
    deg_full = bucket_join(
        nonred, rename(indeg, {"dst": "did"}),
        on="id", right_on="did", how="left", num_buckets=num_buckets,
    ).map_batches(
        lambda t: pa.table({"id": t["id"], "deg": t["deg"].fill_null(0)}),
        batch_format="pyarrow",
    ).materialize()
    n_total = deg_full.count()
    if n_total == 0:
        return pd.DataFrame([])

    plans = plans or PERCENT_PLANS
    bounds = percent_slice_boundaries(
        deg_full, "deg", "id", [e for _, e in plans], n_total
    )

    # both endpoint degrees attached once; every slice is then a filter
    e1 = bucket_join(
        edges, rename(deg_full, {"id": "sid", "deg": "src_deg"}),
        on="src", right_on="sid", how="inner", num_buckets=num_buckets,
    )
    e2 = bucket_join(
        e1, rename(deg_full, {"id": "did2", "deg": "dst_deg"}),
        on="dst", right_on="did2", how="inner", num_buckets=num_buckets,
    ).materialize()

    rows = []
    for start, end in plans:
        b = bounds[end]

        def in_slice(t: pa.Table, _b=b) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            sd = t["src_deg"].to_numpy(zero_copy_only=False)
            dd = t["dst_deg"].to_numpy(zero_copy_only=False)
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
        rows.append({
            "year": year, "start_percent": start, "end_percent": end,
            "graph_size": rep["node_count"], "edge_count": n_edges, **rep,
        })
    return pd.DataFrame(rows)


def google_distance_year(
    paths: dict[str, str], year: int, top_k_core: int = 50
) -> pd.DataFrame:
    """A9 per-year NGD over the pages graph. The reference's core set is the
    CoreSubjectTag pages (wikipediaGoogleDistance.go:66-68); the web analog
    takes the top-k in-degree vertices (documented deviation). total =
    all of the year's pages including redirects (:94)."""
    from ..engine.ngd import google_distance
    from ..engine.rank import rank_desc

    edges = _non_redirect_edges(paths).materialize()
    indeg = edges.groupby("dst").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    )
    # distributed T2 top-k: only top_k_core rows ever reach the driver
    core = (
        rank_desc(indeg, "n", "dst").limit(top_k_core)
        .to_pandas()["dst"].to_numpy()
    )
    total = rd.read_parquet(paths["vertices"], columns=["id"]).count()
    out = google_distance(edges, core, total).to_pandas()
    if out.empty:  # tiny years can have no co-in-linked core pairs
        out = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                            "b": pd.Series([], dtype=np.int64),
                            "distance": pd.Series([], dtype=np.float64)})
    out["year"] = np.int32(year)
    return out


def in_degree_export(paths: dict[str, str], year: int) -> Dataset:
    """K9 rows: (id 'pageID-year', page_id, count, year)
    (wikipediaInDegree.go:62-78; id format :66)."""
    edges = _non_redirect_edges(paths)
    indeg = edges.groupby("dst").aggregate(
        ray.data.aggregate.Count(alias_name="count")
    )

    def fmt(t: pa.Table) -> pa.Table:
        pid = t["dst"].to_numpy(zero_copy_only=False)
        ids = [f"{p}-{year}" for p in pid]
        return pa.table(
            {"id": pa.array(ids), "page_id": pa.array(pid, pa.int64()),
             "count": t["count"], "year": pa.array(np.full(len(pid), year, np.int32))}
        )

    return indeg.map_batches(fmt, batch_format="pyarrow")
