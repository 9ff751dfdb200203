"""bpe_train merge-list parity with a pure-python BPE replica (same
greedy left-to-right fuse, same (n desc, a, b) tie-break)."""

import collections

import pandas as pd

from graph_computing_go_ray.functions import text as T
from graph_computing_go_ray.pipelines.corpus import bpe_train

SF = "/root/testdata/sf0.001"


def _python_bpe(texts, n_merges):
    seqs = [T.word_tokens(t) for t in texts]
    merges = []
    for r in range(n_merges):
        counts = collections.Counter()
        for ws in seqs:
            counts.update(zip(ws[:-1], ws[1:]))
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((r, a, b, n))
        fused = []
        for ws in seqs:
            m, k = [], 0
            while k < len(ws):
                if k + 1 < len(ws) and ws[k] == a and ws[k + 1] == b:
                    m.append(ws[k] + " " + ws[k + 1])
                    k += 2
                else:
                    m.append(ws[k])
                    k += 1
            fused.append(m)
        seqs = fused
    return merges


def test_bpe_train_matches_python_replica():
    texts = pd.read_parquet(f"{SF}/documents.parquet")["text"].tolist()
    want = _python_bpe(texts, 5)
    got = bpe_train(SF, n_merges=5)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert len(want) == 5  # corpus is rich enough for all rounds


def test_bpe_apply_round_trip_parity():
    """bpe_apply's per-doc BPE token counts == a pure-python encode with
    the same merge list and fuse rule."""
    import numpy as np
    import pyarrow.parquet as pq

    from graph_computing_go_ray.functions.text import word_tokens
    from graph_computing_go_ray.pipelines.corpus import bpe_apply, bpe_train

    sf = "/root/testdata/sf0.001"
    merges = [(str(r["a"]), str(r["b"]))
              for _, r in bpe_train(sf, n_merges=3).iterrows()]
    got = bpe_apply(sf, n_merges=3).to_pandas().set_index("doc_id")

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = word_tokens(text)
        raw = len(ws)
        for a, b in merges:
            merged, k = [], 0
            while k < len(ws):
                if k + 1 < len(ws) and ws[k] == a and ws[k + 1] == b:
                    merged.append(ws[k] + " " + ws[k + 1])
                    k += 2
                else:
                    merged.append(ws[k])
                    k += 1
            ws = merged
        assert got.loc[did, "n_tokens_raw"] == raw
        assert got.loc[did, "n_tokens_bpe"] == len(ws)
        assert got.loc[did, "n_tokens_bpe"] <= raw
