"""Multi-format source/sink round-trips: parquet -> csv/jsonl exports ->
read_any with column pruning gives back the same rows; export_table's
_SUCCESS marker makes re-runs no-ops."""

import os

import pandas as pd

from graph_computing_go_ray.sources.readers import export_table, read_any, read_table

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id", ignore_index=True)[["doc_id", "lang", "n_chars"]]


def test_roundtrip_csv_jsonl(tmp_path):
    src = read_table(SF, "documents", columns=["doc_id", "lang", "n_chars"])
    want = _canon(src.to_pandas())

    for fmt, ext in (("csv", "csv"), ("jsonl", "json")):
        out = str(tmp_path / fmt)
        export_table(src, out, fmt=fmt)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        got = _canon(read_any(out, columns=["doc_id", "lang", "n_chars"]).to_pandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_export_resumable_skip(tmp_path):
    src = read_table(SF, "region", columns=["r_regionkey"])
    out = str(tmp_path / "r")
    export_table(src, out, fmt="parquet")
    files_before = sorted(os.listdir(out))
    export_table(src, out, fmt="parquet")  # marker present: must be a no-op
    assert sorted(os.listdir(out)) == files_before


def test_read_any_single_file_dispatch(tmp_path):
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    p = str(tmp_path / "t.csv")
    df.to_csv(p, index=False)
    got = read_any(p, columns=["a"]).to_pandas()
    assert list(got.columns) == ["a"] and sorted(got["a"]) == [1, 2]


def test_roundtrip_orc(tmp_path):
    """ORC export -> read_any with column pruning round-trips exactly."""
    src = read_table(SF, "documents", columns=["doc_id", "lang", "n_chars"])
    want = _canon(src.to_pandas())
    out = str(tmp_path / "orc")
    export_table(src, out, fmt="orc")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    files = [n for n in os.listdir(out) if n.endswith(".orc")]
    assert files, "no ORC part files written"
    got = _canon(read_any(out, columns=["doc_id", "lang", "n_chars"]).to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # column pruning: a narrower projection returns only those columns
    narrow = read_any(out, columns=["doc_id"]).to_pandas()
    assert list(narrow.columns) == ["doc_id"]
