"""Subject-partitioned analyses — the Ray rebuild of the reference's
subject entry points:

- per-subject entropy (openAlexSubjectEntropy.go:27-221 / S7): filter works
  to one lv0 concept, shrink, entropy report;
- multilayer "academic circle" KQI (openAlexMultilayerSubjectEntropy.go:
  24-200 / D3 + A6): union the per-subject vertex sets, partition by lv0
  concept, run the layer-graph structural entropy;
- top-discipline distance complexity (openAlexTopDsiplineDistanceComplexity
  .go:53-150 / J5+J6): concept-hierarchy maps broadcast; each weighted
  concept edge is kept for every lv0 discipline in the intersection of its
  endpoints' lv0 sets (emits edge × discipline rows);
- lv2 TSV distance complexity (openAlexLv2DistanceComplexity.go:30-181 /
  S9+M10+M11): tab-separated (year, c1, c2, distance) records, malformed
  rows and |d|<1e-9 dropped, concept names interned to dense ids, A7/A8.

M9 tag parsing (lv{L}-{Subject}-{year}) lives in functions/text.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from ..engine import entropy as ent_k
from ..engine.multilayer import multilayer_entropy
from ..sources.works_gen import SUBJECTS


def _works(works_dir: str) -> Dataset:
    return rd.read_parquet(
        os.path.join(works_dir, "works.parquet"),
        columns=["id", "publication_year", "referenced_works", "links_in_works",
                 "concepts_lv0"],
    )


def _subject_filter(ds: Dataset, subjects: list[str]) -> Dataset:
    """S7/S4: keep works whose concepts_lv0 intersects `subjects`
    (list-membership via flattened match, vectorized)."""
    sset = set(subjects)

    def fn(t: pa.Table) -> pa.Table:
        cats = t["concepts_lv0"].to_pylist()
        mask = np.array([bool(sset.intersection(c)) for c in cats])
        return t.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def _edges_within(ds: Dataset) -> Dataset:
    """Edges restricted to the filtered vertex set (J4). src comes from the
    filtered table itself, so only dst needs the membership test — done via
    :func:`engine.bloom.exact_semi_join`, which broadcasts the sorted id
    array while the subject set is broadcast-sized and switches to a Bloom
    prefilter + exact bucketed join above the cutover (VERDICT r2 #7: the
    per-subject-sets-are-small assumption no longer bakes a broadcast in)."""
    from ..engine.bloom import exact_semi_join

    def flatten(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t["referenced_works"]).to_numpy(zero_copy_only=False)
        src = np.repeat(t["id"].to_numpy(zero_copy_only=False), lens)
        dst = pc.list_flatten(t["referenced_works"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = ds.map_batches(flatten, batch_format="pyarrow")
    return exact_semi_join(edges, ds.select_columns(["id"]), on="dst",
                           key_col="id")


def subject_entropy(works_dir: str, subject: str, year: int | None = None) -> dict:
    """Entropy report for one lv0 subject's citation subgraph."""
    w = _works(works_dir)
    if year is not None:
        w = w.filter(expr=f"publication_year <= {year}")
    sub = _subject_filter(w, [subject]).materialize()
    edges = _edges_within(sub)
    rep = ent_k.entropy_report(edges)
    rep["subject"] = subject
    return rep


def academic_circle_multilayer(works_dir: str, subjects: list[str] | None = None,
                               year: int | None = None) -> dict:
    """D3 union of subject streams → A6 layer-graph KQI. A work's category
    list = its lv0 concepts ∩ the subject list (multi-category works become
    clones, entropy.go:46-65)."""
    subjects = subjects or SUBJECTS
    sset = set(subjects)
    w = _works(works_dir)
    if year is not None:
        w = w.filter(expr=f"publication_year <= {year}")
    circle = _subject_filter(w, subjects).materialize()

    def vcats(t: pa.Table) -> pa.Table:
        cats = [[c for c in cs if c in sset] for cs in t["concepts_lv0"].to_pylist()]
        return pa.table(
            {"id": t["id"], "cats": pa.array(cats, pa.large_list(pa.large_string()))}
        )

    vertices = circle.map_batches(vcats, batch_format="pyarrow")
    edges = _edges_within(circle)
    return multilayer_entropy(vertices, edges)


def concept_hierarchy_maps(concepts: pd.DataFrame) -> dict[str, dict]:
    """J5: lv0↔lv1↔lv2 maps from the concept table's ancestors
    (openAlexTopDsiplineDistanceComplexity.go:53-90). concepts columns:
    display_name, level, ancestors (list of {display_name, level})."""
    lv_maps: dict[str, dict] = {"lv1_to_lv0": {}, "lv2_to_lv0": {}, "lv2_to_lv1": {}}
    for r in concepts.itertuples():
        anc = {a["level"]: a["display_name"] for a in (r.ancestors or [])}
        if r.level == 1 and 0 in anc:
            lv_maps["lv1_to_lv0"].setdefault(r.display_name, set()).add(anc[0])
        if r.level == 2:
            if 0 in anc:
                lv_maps["lv2_to_lv0"].setdefault(r.display_name, set()).add(anc[0])
            if 1 in anc:
                lv_maps["lv2_to_lv1"].setdefault(r.display_name, set()).add(anc[1])
    return lv_maps


def discipline_distance_complexity(
    weighted_edges: Dataset, lv2_to_lv0: dict[str, set], discipline_of_node=None,
) -> dict[str, dict]:
    """J6 + A7/A8: each weighted concept edge (a, b, w) joins every lv0
    discipline in Intersection(lv0s(a), lv0s(b)) (broadcast dict, emits
    edge × discipline rows); per-discipline distance complexity."""
    ref = ray.put({k: frozenset(v) for k, v in lv2_to_lv0.items()})

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        w = t["w"].to_numpy(zero_copy_only=False)
        ra, rb, rw, rd_ = [], [], [], []
        for x, y, wt in zip(a, b, w):
            inter = m.get(str(x), frozenset()) & m.get(str(y), frozenset())
            for d in sorted(inter):
                ra.append(x)
                rb.append(y)
                rw.append(wt)
                rd_.append(d)
        return pa.table(
            {"a": pa.array(ra), "b": pa.array(rb),
             "w": pa.array(rw, pa.float64()), "disc": pa.array(rd_)}
        )

    tagged = weighted_edges.map_batches(tag, batch_format="pyarrow").materialize()
    discs = sorted(set(tagged.unique("disc")))
    from ..engine.distance import distance_complexity_1d

    out = {}
    for d in discs:
        ed = tagged.filter(expr=f"disc == '{d}'").map_batches(
            _intern, batch_format="pyarrow"
        )
        out[d] = {"big_complexity": distance_complexity_1d(ed)}
    return out


def _intern(t: pa.Table) -> pa.Table:
    """M10: concept-name → stable dense-ish int64 id (hash interning —
    deterministic without a global counter; documented deviation from the
    reference's arrival-order map, openAlexLv2DistanceComplexity.go:154-181)."""
    from ..functions.hashing import hash_strings

    a = hash_strings(np.array(t["a"].to_pylist(), dtype=object))
    b = hash_strings(np.array(t["b"].to_pylist(), dtype=object))
    return pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
         "w": t["w"]}
    )


def read_nis_tsv(path: str) -> Dataset:
    """S9: tab-separated (year, c1, c2, distance); malformed rows and
    |distance| < 1e-9 dropped (openAlexLv2DistanceComplexity.go:30-109,
    zero guard :26-28 M11)."""
    txt = rd.read_text(path)

    def parse(batch: dict) -> pa.Table:
        years, c1s, c2s, ds = [], [], [], []
        for line in batch["text"]:
            parts = line.split("\t")
            if len(parts) != 4:
                continue
            try:
                y = int(parts[0])
                d = float(parts[3])
            except ValueError:
                continue
            if abs(d) < 1e-9:
                continue
            years.append(y)
            c1s.append(parts[1])
            c2s.append(parts[2])
            ds.append(d)
        return pa.table(
            {"year": pa.array(years, pa.int32()), "a": pa.array(c1s),
             "b": pa.array(c2s), "w": pa.array(ds, pa.float64())}
        )

    return txt.map_batches(parse, batch_format="numpy")


def lv2_distance_complexity(tsv_path: str, year: int) -> dict:
    """S9 → M10 interning → A7 1-dim distance complexity for one year."""
    recs = read_nis_tsv(tsv_path).filter(expr=f"year == {year}")
    edges = recs.map_batches(_intern, batch_format="pyarrow")
    from ..engine.distance import distance_complexity_1d

    return {"year": year, "big_complexity": distance_complexity_1d(edges)}
