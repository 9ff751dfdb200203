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

from ray.data import Dataset


def rank_desc(ds: Dataset, degree_col: str, id_col: str) -> Dataset:
    """Global sort by (-degree, id). A range-partitioned shuffle."""
    return ds.sort([degree_col, id_col], descending=[True, False])


def percent_slice(
    ds: Dataset, degree_col: str, id_col: str, start: int, end: int,
    total: int | None = None,
) -> Dataset:
    """Rows at rank positions [ceil(N*start/100), ceil(N*end/100)).

    Matches sliceWikiItemByPercent (wikiEntropy.go:297-310) including its
    ceil-based index arithmetic."""
    if start == 0 and end == 100:
        return ds
    n = total if total is not None else ds.count()
    start_pos = int(math.ceil(n * start / 100))
    end_pos = int(math.ceil(n * end / 100))
    ranked = rank_desc(ds, degree_col, id_col)
    if start_pos == 0:
        return ranked.limit(end_pos)
    # general slice: limit(end) then drop the first start rows blockwise via
    # a global offset computed from a count — rare path (no active plan uses it)
    import pyarrow as pa

    head = ranked.limit(end_pos)

    class _Skip:
        def __init__(self):
            self.seen = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            # NOTE: correct only with preserve_order + single concurrency;
            # used for parity tests only, never in the scale path.
            lo = max(0, start_pos - self.seen)
            self.seen += batch.num_rows
            return batch.slice(min(lo, batch.num_rows))

    return head.map_batches(_Skip, batch_format="pyarrow", concurrency=1)
