"""Batched model-inference stage: a quality classifier as an actor pool.

The ST1 pattern (reference analogue: the per-worker gRPC parser client,
/root/reference/internal/extractWikipediadump/extractWikipediaDump.go:206-216):
model state is built ONCE per actor in ``__init__`` and every ``__call__``
scores a whole Arrow batch vectorized — the shape a real learned quality
filter (fastText/logreg over hashed n-grams) runs at 100 TB.

The "model" here is a deterministic linear scorer over hashed-unigram
buckets (b(w) = first 3 hex chars of md5(w); weight(b) = Knuth
multiplicative hash of b mapped to [-0.5, 0.5)), so the scores are exactly
replicable in SQL — the driver gets a value-checked oracle instead of a
rows-only smoke check, while the Ray-side plumbing (actor pool, once-per-
actor weight build, vectorized batch scoring) is the real pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

N_BUCKETS = 4096
_KNUTH = 2654435761


class QualityScorer:
    """Actor-pool stage: weights built once per actor; per-batch scoring is
    one tokenizer pass + vectorized bucket lookups + a sigmoid."""

    def __init__(self, n_buckets: int = N_BUCKETS):
        self.n_buckets = n_buckets
        b = np.arange(n_buckets, dtype=np.int64)
        self.w = ((b * _KNUTH) % (1 << 32)) / float(1 << 32) - 0.5
        # worker-lifetime memo: md5 bucket of each distinct token seen
        self._memo: dict[str, int] = {}

    def _bucket(self, uniques: np.ndarray) -> np.ndarray:
        memo = self._memo
        out = np.empty(len(uniques), np.int64)
        for i, w in enumerate(uniques):
            v = memo.get(w)
            if v is None:
                v = int(hashlib.md5(w.encode()).hexdigest()[:3], 16)
                memo[w] = v
            out[i] = v
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.text import batch_word_tokens

        tokens, doc_idx = batch_word_tokens(t["text"].to_pylist())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(tokens):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "q_score": pa.array([], pa.float64())})
        codes, uniques = pd.factorize(tokens)
        wv = self.w[self._bucket(uniques)[codes]]
        s = np.bincount(doc_idx, weights=wv, minlength=t.num_rows)
        n = np.bincount(doc_idx, minlength=t.num_rows)
        keep = n > 0
        mean = s[keep] / n[keep]
        score = 1.0 / (1.0 + np.exp(-mean))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "q_score": pa.array(np.round(score, 6), pa.float64()),
        })


def quality_classifier_scores(
    sf_dir: str, concurrency=(1, 4), batch_size: int = 256
) -> Dataset:
    """Driver query: (doc_id, q_score) for every doc with >= 1 token —
    sigmoid of the mean hashed-bucket weight of its token occurrences."""
    from ..sources.readers import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
