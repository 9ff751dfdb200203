"""Parquet readers for the driver's test tables and engine tables.

Always pass ``columns=`` — at 100 TB a read that loads all columns for a
2-column transform is wrong (SURVEY.md §2.1: partition-pruned reads replace
the reference's Mongo secondary-index cursors,
/root/reference/internal/extractWikipediadump/mongoClient.go:115-137).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns)


def lineitem_edges(sf_dir: str) -> Dataset:
    """Canonical bipartite edge table over the driver harness data:
    src = l_orderkey, dst = l_partkey (multi-edges kept).

    Stands in for the resolved link-graph edge table when exercising graph
    kernels against DuckDB oracles (FIXTURES.md F7)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return ds.rename_columns({"l_orderkey": "src", "l_partkey": "dst"})


def parse_ts_filter(
    ds: Dataset, ts_col: str, cutoff_year: int = 2000,
    fmt: str = "%Y-%m-%dT%H:%M:%SZ",
) -> Dataset:
    """M1 (extractWikipediaDump.go:136-150): parse string timestamps with
    the reference's fixed layout, DROP malformed rows (the reference logs a
    warning and the zero-value year then fails the cutoff) and rows with
    year < cutoff_year. Typed timestamp columns skip the parse and only get
    the cutoff filter."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.types as patypes

    def fn(t: pa.Table) -> pa.Table:
        col = t[ts_col]
        if patypes.is_string(col.type) or patypes.is_large_string(col.type):
            ts = pc.strptime(col, format=fmt, unit="us", error_is_null=True)
            t = t.set_column(t.schema.get_field_index(ts_col), ts_col, ts)
        else:
            ts = col
        keep = pc.and_kleene(
            pc.is_valid(ts), pc.greater_equal(pc.year(ts), cutoff_year)
        )
        return t.filter(pc.fill_null(keep, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def read_any(path: str, columns: list[str] | None = None) -> Dataset:
    """Format-dispatched source (S1 widened to the formats a web corpus
    actually arrives in): .parquet (column-pruned at the reader),
    .csv / .csv.gz (arrow CSV with include_columns pushdown so unneeded
    columns are never parsed), .jsonl / .json (newline-delimited JSON;
    JSON has no columnar projection, so pruning happens right after the
    decode). A directory scans all files of one format inside it."""
    p = path.rstrip("/")
    if os.path.isdir(p):
        names = sorted(os.listdir(p))
        exts = {n.rsplit(".", 1)[-1] for n in names if "." in n}
        ext = sorted(exts)[0] if exts else "parquet"
    else:
        ext = p.rsplit(".", 1)[-1]
        if ext == "gz":
            ext = p.rsplit(".", 2)[-2]
    if ext == "parquet":
        return rd.read_parquet(p, columns=columns)
    if ext == "csv":
        from pyarrow import csv as pacsv

        convert = pacsv.ConvertOptions(include_columns=columns) if columns else None
        return rd.read_csv(p, convert_options=convert,
                           file_extensions=["csv", "gz"])  # skip _SUCCESS markers
    if ext in ("jsonl", "json"):
        ds = rd.read_json(p, file_extensions=["json", "jsonl", "gz"])
        return ds.select_columns(columns) if columns else ds
    if ext == "orc":
        # Ray 2.49 has no read_orc: dispatch one decode task per file via
        # a path dataset; pyarrow's ORC reader prunes columns at the
        # stripe reader, so projection still happens before Arrow
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, n) for n in os.listdir(p) if n.endswith(".orc")
            )
        else:
            files = [p]
        paths = rd.from_items(files).repartition(max(1, len(files)))

        def load(t: pa.Table) -> pa.Table:
            from pyarrow import orc

            tabs = [orc.ORCFile(f).read(columns=columns)
                    for f in t["item"].to_pylist()]
            return pa.concat_tables(tabs) if tabs else pa.table({})

        return paths.map_batches(load, batch_format="pyarrow", batch_size=1)
    raise ValueError(f"unsupported source format: {ext} ({path})")


def export_table(ds: Dataset, out_dir: str, fmt: str = "parquet") -> str:
    """Partitioned, resumable sink (K1/K3 semantics for any format): skip
    if the directory's _SUCCESS marker exists, else write one file per
    block and mark. Never one giant file — a failed run re-runs only
    unmarked directories."""
    from ..state import checkpoint as ckpt

    marker = ckpt.join(out_dir, "_SUCCESS")
    if ckpt.exists(marker):
        return out_dir
    ckpt.ensure_dir(out_dir)
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt in ("jsonl", "json"):
        ds.write_json(out_dir)
    elif fmt == "orc":
        # one ORC file per block, uuid-named inside the writing task (the
        # same no-giant-file layout as the built-in writers)
        def write_block(t: pa.Table) -> pa.Table:
            import uuid

            from pyarrow import orc

            from ..state import checkpoint as _ckpt

            fp = _ckpt.join(out_dir, f"part-{uuid.uuid4().hex}.orc")
            f, p = _ckpt.get_fs(fp)
            with f.open_output_stream(p) as out:
                orc.write_table(t, out)
            return pa.table({"path": pa.array([fp], pa.string()),
                             "rows": pa.array([t.num_rows], pa.int64())})

        ds.map_batches(write_block, batch_format="pyarrow").materialize()
    else:
        raise ValueError(f"unsupported sink format: {fmt}")
    mf, mp = ckpt.get_fs(marker)
    with mf.open_output_stream(mp) as out:
        out.write(b"")
    return out_dir
