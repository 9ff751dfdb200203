"""T2/T3: rank vertices by in-degree and take percent slices.

Reference: rankWikiItemSlices + sliceWikiItemByPercent
(/root/reference/internal/wikiEntropy/wikiEntropy.go:281-310). The reference
sort is unstable with arbitrary tie order; we impose the total order
(-degree, id) so slices are deterministic and testable (SURVEY.md §7.4.2,
documented deviation).

All active reference percent plans have start=0 (wikiEntropy.go:43-56), so a
slice is `sort + limit(ceil(N*end/100))` — limit short-circuits the sort's
output consumption; no global row-number pass is needed.
"""

from __future__ import annotations

import math

import numpy as np

from ray.data import Dataset


def rank_desc(ds: Dataset, degree_col: str, id_col: str) -> Dataset:
    """Global sort by (-degree, id). A range-partitioned shuffle."""
    return ds.sort([degree_col, id_col], descending=[True, False])


def percent_slice_boundaries(
    deg_ds: Dataset, degree_col: str, id_col: str, ends: list[int], total: int,
) -> dict[int, tuple[int, int] | None]:
    """Distributed T3: for each `end` percent, the boundary (deg_t, id_t) of
    rank position ceil(total*end/100) under the (-degree, id) total order.

    Membership of a vertex in the slice is then the pure predicate
        degree > deg_t  OR  (degree == deg_t AND id <= id_t)
    so slices become vectorized filters — no ranked id list ever reaches
    the driver (VERDICT r1 'What's wrong' #4/#5). `None` means the slice
    covers everything; ("empty",) means it selects nothing.

    Cost: ONE degree-value histogram (tiny — O(#distinct degrees) rows) +
    per non-trivial plan a filter/sort/limit over the single boundary tie
    group. Caller should pass a materialized deg_ds."""
    from .join import bucket_grouped_count

    hist = bucket_grouped_count(deg_ds, [degree_col], "__cnt").to_pandas()
    hist = hist.sort_values(degree_col, ascending=False, ignore_index=True)
    cum = hist["__cnt"].cumsum().to_numpy()
    degs = hist[degree_col].to_numpy()
    cnts = hist["__cnt"].to_numpy()

    out: dict[int, tuple[int, int] | None] = {}
    for end in ends:
        end_pos = int(math.ceil(total * end / 100))
        if end_pos >= total:
            out[end] = None
            continue
        if end_pos <= 0:
            out[end] = ("empty",)  # type: ignore[assignment]
            continue
        j = int(np.searchsorted(cum, end_pos))
        deg_t = int(degs[j])
        prev = int(cum[j - 1]) if j > 0 else 0
        k = end_pos - prev
        if k == int(cnts[j]):
            # whole tie group is in: id_t = max id at deg_t
            id_t = deg_ds.filter(expr=f"{degree_col} == {deg_t}").max(id_col)
        else:
            id_t = (
                deg_ds.filter(expr=f"{degree_col} == {deg_t}")
                .sort(id_col).limit(k).max(id_col)
            )
        out[end] = (deg_t, int(id_t))
    return out


def slice_member_mask(deg: np.ndarray, ids: np.ndarray, boundary) -> np.ndarray:
    """Vectorized membership for a percent_slice_boundaries boundary."""
    if boundary is None:
        return np.ones(len(deg), dtype=bool)
    if boundary == ("empty",):
        return np.zeros(len(deg), dtype=bool)
    deg_t, id_t = boundary
    return (deg > deg_t) | ((deg == deg_t) & (ids <= id_t))


def percent_slice(
    ds: Dataset, degree_col: str, id_col: str, start: int, end: int,
    total: int | None = None,
) -> Dataset:
    """Rows at rank positions [ceil(N*start/100), ceil(N*end/100)).

    Matches sliceWikiItemByPercent (wikiEntropy.go:297-310) including its
    ceil-based index arithmetic. start == 0 short-circuits to sort+limit;
    the general slice is fully distributed: both slice edges become
    (degree, id) boundary predicates (percent_slice_boundaries) and
    membership is a vectorized filter — no single-concurrency offset
    walk, no ranked id list on the driver."""
    if start == 0 and end == 100:
        return ds
    n = total if total is not None else ds.count()
    end_pos = int(math.ceil(n * end / 100))
    ranked = rank_desc(ds, degree_col, id_col)
    if start <= 0:
        return ranked.limit(end_pos)
    import pyarrow as pa

    ds = ds.materialize()  # consumed by the histogram, tie probe, and filter
    if int(math.ceil(n * start / 100)) >= end_pos:  # empty slice: keep schema
        import ray.data as rd

        schema = ds.schema().base_schema
        return rd.from_arrow(pa.table(
            {f.name: pa.array([], f.type) for f in schema}
        ))
    bounds = percent_slice_boundaries(ds, degree_col, id_col, [start, end], n)
    b_start, b_end = bounds[start], bounds[end]

    def member(t: pa.Table) -> pa.Table:
        deg = t[degree_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = slice_member_mask(deg, ids, b_end) & ~slice_member_mask(
            deg, ids, b_start
        )
        return t.filter(pa.array(mask))

    from .join import typed_seed

    # seed BEFORE the sort: an all-empty filter output reaches the sort
    # schema-less otherwise and the slice loses its columns
    filtered = typed_seed(
        ds.map_batches(member, batch_format="pyarrow"), ds.schema().base_schema
    )
    return rank_desc(filtered, degree_col, id_col)
