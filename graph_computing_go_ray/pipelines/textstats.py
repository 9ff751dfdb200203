"""Text-analysis operators over the documents table: token counting,
quality scoring, fingerprinting, language-ID (training-data pipeline ops;
each backs a queries() entry)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions import text as T
from ..sources.readers import read_table

ROUND = 6


def token_counts(sf_dir: str) -> Dataset:
    """(doc_id, n_tokens) — whitespace tokens, DuckDB regexp parity."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"\S+")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return docs.map_batches(fn, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> Dataset:
    """(doc_id, chars, tokens, punct_ratio, upper_ratio) quality signals."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        tokens = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        punct = pc.cast(pc.count_substring_regex(t["text"], r"[^\w\s]"), pa.float64())
        upper = pc.cast(pc.count_substring_regex(t["text"], r"[A-Z]"), pa.float64())
        denom = pc.max_element_wise(pc.cast(chars, pa.float64()), pa.scalar(1.0))
        return pa.table(
            {"doc_id": t["doc_id"], "chars": chars, "tokens": tokens,
             "punct_ratio": pc.round(pc.divide(punct, denom), ROUND),
             "upper_ratio": pc.round(pc.divide(upper, denom), ROUND)}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> Dataset:
    """(doc_id, fingerprint) — hex MD5 of the raw text (DuckDB md5 parity)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = T.md5_fingerprint(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return docs.map_batches(fn, batch_format="pyarrow")


def lang_id(sf_dir: str) -> Dataset:
    """(doc_id, lang_pred) stopword-marker heuristic (rows-only check;
    accuracy is asserted on a synthetic corpus in tests/test_textops.py)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        preds = T.lang_id(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "lang_pred": pa.array(preds)})

    return docs.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprints(sf_dir: str) -> Dataset:
    """(doc_id, rolling_fp) Karp-Rabin windowed min-hash fingerprint
    (locality-robust; rows-only check + determinism pytest)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = T.rolling_fingerprint(t["text"].to_pylist())
        return pa.table(
            {"doc_id": t["doc_id"], "rolling_fp": pa.array(fps, pa.int64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")
