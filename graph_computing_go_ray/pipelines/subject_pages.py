"""Pages-side subject-tag analyses — the Ray rebuild of the reference's
wiki subject entry points (SURVEY §3.2, VERDICT r1 'missing' #1-2):

- S4 source: pages by `core_subject_tag` membership
  (Get_pages_subject_cats, /root/reference/internal/extractWikipediadump/
  mongoClient.go:139-161) — a vectorized list-intersection filter on the
  extracted table's own tag column (no join, no broadcast of page ids).
- per-subject / academic-circle pages entropy (wikiSubjectEntropy.go:14-107):
  resolution (J1-J3) runs WITHIN the filtered page set, exactly like
  pageLinkHandle over the filtered cursor; degree + structural entropies
  over the non-redirect subgraph.
- multilayer subject entropy (wikiMultilayersSubjectEntropy.go:15-100):
  per-node categories = parse_subject_tags at the level, layer-graph KQI.
- J7 academic-circle distance complexity
  (wikiAcademicCircleDistanceComplexity.go:17-81): per-year NGD edge table
  (core = tagged non-redirect pages, wikipediaGoogleDistance.go:56-68;
  total = ALL year pages incl. redirects :94), both-endpoint semi-join onto
  the (year, level) tag set, tag-derived categories, A7/A8 distance
  complexity.

Multi-category nodes are exploded to one (id, cat) row per category — the
reference's clone nodes share the clone's distance map by reference and are
never exercised by its tests (documented deviation, engine/distance.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..engine import entropy as ent_k
from ..functions.text import parse_subject_tags
from ..sources.pages_gen import SUBJECT_LIST
from ..stages.resolve import (
    resolve_edges,
    vertices_from_extracted,
    write_resolution_buckets,
)


def level_tags(level: int, year: int, subjects: list[str] | None = None) -> list[str]:
    """The reference's tag spelling 'lv{L}-{Subject}-{year}'
    (wikiSubjectEntropy.go:30)."""
    return [f"lv{level}-{s}-{year}" for s in (subjects or SUBJECT_LIST)]


def _read_extracted(extracted_dir: str, year: int | None = None) -> Dataset:
    """Extracted pages, PRUNED to the year's hive partition when
    `extracted_dir` is a partition_extracted_by_year root (year=Y subdirs)
    — otherwise the flat layout is scanned and filtered downstream."""
    if year is not None:
        ydir = os.path.join(extracted_dir, f"year={year}")
        if os.path.isdir(ydir):
            return rd.read_parquet(
                ydir,
                columns=["url", "warc_ts", "links_out", "redirect",
                         "core_subject_tag"],
            )
    return rd.read_parquet(
        extracted_dir,
        columns=["url", "warc_ts", "links_out", "redirect", "core_subject_tag"],
    )


def pages_by_subject_tags(ext: Dataset, tags: list[str], year: int | None = None) -> Dataset:
    """S4: keep pages whose core_subject_tag intersects `tags` (and whose
    snapshot year matches, when given). The filter is a flat membership
    test over the exploded list column — fully vectorized, streams."""
    tag_arr = np.sort(np.array(tags, dtype=object))

    def fn(t: pa.Table) -> pa.Table:
        if year is not None:
            t = t.filter(pc.equal(pc.year(t["warc_ts"]), year))
        if t.num_rows == 0:
            return t
        col = t["core_subject_tag"]
        lens = pc.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)
        flat = np.asarray(pc.list_flatten(col).to_pylist(), dtype=object)
        hit = np.isin(flat, tag_arr)
        row_hit = np.zeros(t.num_rows, dtype=bool)
        if len(flat):
            row_idx = np.repeat(np.arange(t.num_rows), lens)
            np.logical_or.at(row_hit, row_idx, hit)
        return t.filter(pa.array(row_hit))

    return ext.map_batches(fn, batch_format="pyarrow")


def subject_snapshot(
    extracted_dir: str, workdir: str, tags: list[str], year: int,
    num_buckets: int = 4,
) -> tuple[Dataset, Dataset]:
    """Filter (year, tags) pages, then run J1-J3 resolution WITHIN the
    subset (pageLinkHandle over the filtered cursor,
    wikiSubjectEntropy.go:31-50). Returns (vertices incl. tags, edges)."""
    sel = pages_by_subject_tags(_read_extracted(extracted_dir, year), tags, year)
    vertices = vertices_from_extracted(sel).materialize()
    os.makedirs(workdir, exist_ok=True)
    origin_dir, norm_dir = write_resolution_buckets(vertices, workdir, num_buckets)
    edges = resolve_edges(vertices, origin_dir, norm_dir, num_buckets)
    return vertices, edges


def _nonred_edges(vertices: Dataset, edges: Dataset) -> Dataset:
    """Edges from non-redirect sources (the totalWikiItemSlice filter,
    wikiSubjectEntropy.go:38-44). Resolution never targets a redirect id
    (the chase resolves through them), so only the src side needs the
    filter. Membership runs through engine.bloom.exact_semi_join: the id
    set is broadcast while snapshot-sized, Bloom + exact bucketed join
    above the cutover (VERDICT r2 #7)."""
    from ..engine.bloom import exact_semi_join

    ids = vertices.map_batches(
        lambda t: pa.table({"id": t.filter(pc.is_null(t["redirect"]))["id"]}),
        batch_format="pyarrow",
    )
    return exact_semi_join(edges, ids, on="src", key_col="id")


def page_subject_entropy(
    extracted_dir: str, workdir: str, year: int, level: int, subject: str,
    num_buckets: int = 4,
) -> dict:
    """One (year, level, subject) entropy row: degree + structural entropies
    over the subject subgraph (InsertSubjectEntropy fields,
    wikiSubjectEntropy.go:52-58)."""
    tags = level_tags(level, year, [subject])
    vertices, edges = subject_snapshot(
        extracted_dir, os.path.join(workdir, f"s-{level}-{year}-{subject}"),
        tags, year, num_buckets,
    )
    e = _nonred_edges(vertices, edges).materialize()
    n_edges = e.count()
    rep = ent_k.entropy_report(e) if n_edges else {}
    return {
        "year": year, "level": level, "subject": subject,
        "graph_size": int(rep.get("node_count", 0)), "edge_count": int(n_edges),
        **rep,
    }


def academic_circle_pages_entropy(
    extracted_dir: str, workdir: str, year: int, level: int,
    subjects: list[str] | None = None, num_buckets: int = 4,
) -> dict:
    """D3 union of the level's subject streams → one 'academic circle'
    entropy row (wikiSubjectEntropy.go:66-107)."""
    tags = level_tags(level, year, subjects)
    vertices, edges = subject_snapshot(
        extracted_dir, os.path.join(workdir, f"circle-{level}-{year}"),
        tags, year, num_buckets,
    )
    e = _nonred_edges(vertices, edges).materialize()
    n_edges = e.count()
    rep = ent_k.entropy_report(e) if n_edges else {}
    return {
        "year": year, "level": level, "subject": "academic circle",
        "graph_size": int(rep.get("node_count", 0)), "edge_count": int(n_edges),
        **rep,
    }


def _vertex_cats(vertices: Dataset, level: int,
                 subjects: list[str] | None = None) -> Dataset:
    """(id, cats list) for non-redirect vertices: M9 tag parse at `level`
    validated against the subject list
    (wikiMultilayersSubjectEntropy.go:47-63)."""
    sset = set(subjects or SUBJECT_LIST)

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["redirect"]))
        cats = [
            parse_subject_tags(tags or [], level, sset)
            for tags in t["core_subject_tag"].to_pylist()
        ]
        return pa.table(
            {"id": t["id"],
             "cats": pa.array(cats, pa.large_list(pa.large_string()))}
        )

    return vertices.map_batches(fn, batch_format="pyarrow")


def pages_multilayer_subject_entropy(
    extracted_dir: str, workdir: str, year: int, level: int,
    subjects: list[str] | None = None, num_buckets: int = 4,
) -> dict:
    """Wiki-side multilayer KQI: tagged pages of (year, level), categories
    from parsed tags, layer-graph structural entropy
    (wikiMultilayersSubjectEntropy.go:15-100)."""
    from ..engine.multilayer import multilayer_entropy

    tags = level_tags(level, year, subjects)
    vertices, edges = subject_snapshot(
        extracted_dir, os.path.join(workdir, f"ml-{level}-{year}"),
        tags, year, num_buckets,
    )
    vcats = _vertex_cats(vertices, level, subjects)
    e = _nonred_edges(vertices, edges)
    return multilayer_entropy(vcats, e)


def academic_circle_distance_complexity(
    extracted_dir: str, yearly_paths: dict[str, str], workdir: str,
    year: int, level: int, subjects: list[str] | None = None,
    num_buckets: int = 4,
) -> dict:
    """J7 (wikiAcademicCircleDistanceComplexity.go:17-81): per-year NGD
    edges (core = ALL tagged non-redirect year pages, total = all year
    pages incl. redirects — wikipediaGoogleDistance.go:56-94), keep rows
    with BOTH endpoints in the (year, level) tag set, categories from the
    level's parsed tags, A7 big + A8 modular distance complexity.

    `yearly_paths` is one year's entry from
    snapshots.build_yearly_graphs (whole-year resolved graph)."""
    from ..engine.distance import distance_complexity
    from ..engine.ngd import google_distance

    ext = _read_extracted(extracted_dir, year)

    def year_tagged(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t["warc_ts"]), year))
        n_tags = pc.list_value_length(t["core_subject_tag"]).fill_null(0)
        t = t.filter(pc.greater(n_tags, 0))
        return t.select(["url", "redirect", "core_subject_tag"])

    tagged = ext.map_batches(year_tagged, batch_format="pyarrow")
    tagged = vertices_from_extracted(tagged).materialize()

    # core set for NGD: tagged, non-redirect (wikipediaGoogleDistance.go:60-68)
    nonred = tagged.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"]))
        .select(["id", "core_subject_tag"]),
        batch_format="pyarrow",
    ).materialize()
    core_ids = np.sort(nonred.select_columns(["id"]).to_pandas()["id"].to_numpy())

    from ..pipelines.snapshots import _non_redirect_edges

    year_edges = _non_redirect_edges(yearly_paths, num_buckets=num_buckets)
    total = rd.read_parquet(yearly_paths["vertices"], columns=["id"]).count()
    ngd = google_distance(year_edges, core_ids, total, num_buckets=num_buckets)

    # (year, level) node set + per-node categories from parsed tags
    lvl_prefix_subjects = set(subjects or SUBJECT_LIST)

    def cats_rows(t: pa.Table) -> pa.Table:
        ids_, cats_ = [], []
        for i, tags in zip(
            t["id"].to_numpy(zero_copy_only=False),
            t["core_subject_tag"].to_pylist(),
        ):
            for c in parse_subject_tags(tags or [], level, lvl_prefix_subjects):
                ids_.append(int(i))
                cats_.append(c)
        return pa.table(
            {"id": pa.array(ids_, pa.int64()),
             "cat": pa.array(cats_, pa.large_string())}
        )

    cats = nonred.map_batches(cats_rows, batch_format="pyarrow").materialize()

    # both-endpoint membership in the tagged node set — two adaptive
    # semi-joins (broadcast below the cutover, Bloom + bucketed join above;
    # VERDICT r2 #7) instead of shipping the whole id array to every task
    from ..engine.bloom import exact_semi_join
    from ..engine.degrees import distinct_pairs
    from ..engine.join import typed_seed

    node_ids = typed_seed(distinct_pairs(cats, ["id"]),
                          pa.schema([("id", pa.int64())])).materialize()
    n_nodes_tagged = node_ids.count()

    kept = exact_semi_join(
        exact_semi_join(ngd, node_ids, on="a", key_col="id",
                        n_keys=n_nodes_tagged),
        node_ids, on="b", key_col="id", n_keys=n_nodes_tagged,
    )
    dist_edges = typed_seed(
        kept.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "w": t["distance"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("w", pa.float64())]),
    )
    out = distance_complexity(dist_edges, cats, num_buckets=num_buckets)
    out.update({"year": year, "level": level,
                "n_nodes_tagged": int(n_nodes_tagged)})
    return out
