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


def build_yearly_graphs(
    extracted_dir: str, out_root: str, num_buckets: int = 4,
    years: list[int] | None = None,
) -> dict[int, dict[str, str]]:
    """Per-year resolution over the year's pages; returns year → paths
    (vertices, edges). Re-runs skip years whose marker exists."""
    ext = rd.read_parquet(
        extracted_dir, columns=["url", "warc_ts", "links_out", "redirect"]
    )
    if years is None:
        yr = ext.map_batches(
            lambda t: pa.table({"y": pc.year(t["warc_ts"])}), batch_format="pyarrow"
        ).unique("y")
        years = sorted(int(y) for y in yr)

    out: dict[int, dict[str, str]] = {}
    for year in years:
        ydir = os.path.join(out_root, f"year={year}")
        paths = {"vertices": os.path.join(ydir, "vertices"),
                 "edges": os.path.join(ydir, "edges")}
        out[year] = paths
        marker = os.path.join(ydir, "_SUCCESS")
        if os.path.exists(marker):
            continue
        ypages = ext.map_batches(
            lambda t, _y=year: t.filter(pc.equal(pc.year(t["warc_ts"]), _y))
            .select(["url", "links_out", "redirect"]),
            batch_format="pyarrow",
        )
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


def entropy_slices(paths: dict[str, str], year: int, plans=None) -> pd.DataFrame:
    """wikiEntropy Main per-year: rank by in-degree (-deg, id), 6 percent
    slices, induced-subgraph entropy reports (rows: one per slice)."""
    edges = _non_redirect_edges(paths).materialize()
    verts = rd.read_parquet(paths["vertices"], columns=["id", "redirect"])
    nonred_ids = verts.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"])).select(["id"]),
        batch_format="pyarrow",
    ).to_pandas()["id"].to_numpy()

    indeg = edges.groupby("dst").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    ).to_pandas()
    deg_map = dict(zip(indeg["dst"], indeg["n"]))
    ranked = sorted(nonred_ids, key=lambda i: (-deg_map.get(i, 0), i))

    rows = []
    for start, end in (plans or PERCENT_PLANS):
        end_pos = math.ceil(len(ranked) * end / 100)
        slice_ids = np.sort(np.array(ranked[:end_pos], dtype=np.int64))
        ref = ray.put(slice_ids)

        def in_slice(t: pa.Table, _r=ref) -> pa.Table:
            ks = ray.get(_r)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            m = np.isin(s, ks) & np.isin(d, ks)
            return t.filter(pa.array(m))

        sub = edges.map_batches(in_slice, batch_format="pyarrow").materialize()
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

    edges = _non_redirect_edges(paths).materialize()
    indeg = edges.groupby("dst").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    ).to_pandas()
    core = (
        indeg.sort_values(["n", "dst"], ascending=[False, True])
        .head(top_k_core)["dst"].to_numpy()
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
