"""Corpus-statistics operators over the documents table — the
training-data-pipeline layer above textstats.py: deterministic hash
sampling, per-source aggregates, BPE-style adjacent-pair counts, token
document-frequency, and TF-IDF term scoring. Each backs a queries()
entry with a DuckDB SQL oracle.

Scale notes (100 TB): every operator is a map_batches partial-aggregate
followed by one bucketed groupby on the natural key (token / source /
pair) — no driver-side materialization of anything corpus-sized; the
only driver-held tables are per-source / top-k results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..engine.join import (
    bucket_grouped_sum,
    bucket_join,
    default_num_buckets,
)
from ..functions import text as T
from ..sources.readers import read_table

ROUND = 6


# ---------------------------------------------------------------- sampling
def hash_sample(sf_dir: str, hex_digits: str = "0123") -> Dataset:
    """Deterministic content-hash sample of documents: keep docs whose
    md5(text) starts with one of ``hex_digits`` (default = 4/16 = 25%).

    The canonical reproducible-sampling pattern for training-data splits:
    membership is a pure function of content, so reruns / backfills of
    disjoint shards select the same rows with no coordination or RNG
    state. Embarrassingly parallel (a pure filter per batch)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    wanted = frozenset(hex_digits)

    def fn(t: pa.Table) -> pa.Table:
        fps = T.md5_fingerprint(t["text"].to_pylist())
        mask = np.fromiter((f[0] in wanted for f in fps), bool, count=len(fps))
        return t.filter(pa.array(mask)).select(["doc_id", "lang"])

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------- per-source
def source_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, sum_chars, n_langs) — the per-domain roll-up of a
    web corpus (source ≙ crawl domain). Exact int64 sums via per-batch
    partial aggregation; distinct langs via a distinct-pair pass. The
    final frame is #sources-sized (tiny) so the combine is driver-side."""
    docs = read_table(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    totals = (
        bucket_grouped_sum(
            docs.map_batches(partial, batch_format="pyarrow"),
            ["source"], ["n_docs", "sum_chars"], num_buckets=default_num_buckets(),
        )
        .to_pandas()
    )

    def lang_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["source", "lang"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_langs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["source", "lang"]].drop_duplicates()
        return d.groupby("source", as_index=False).agg(n_langs=("lang", "size"))

    from ..engine.join import bucket_grouped

    langs = bucket_grouped(
        docs.map_batches(lang_pairs, batch_format="pyarrow"),
        ["source"], count_langs, num_buckets=default_num_buckets(),
    ).to_pandas()

    out = totals.merge(langs, on="source")
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["sum_chars"] = out["sum_chars"].astype(np.int64)
    out["n_langs"] = out["n_langs"].astype(np.int64)
    return out[["source", "n_docs", "sum_chars", "n_langs"]]


# ---------------------------------------------------------------- BPE pairs
def bpe_pair_counts(sf_dir: str, k: int = 20) -> Dataset:
    """Top-k most frequent adjacent lowercase-token pairs — the inner
    counting step of one BPE merge round, run corpus-wide.

    Per-batch partial counts (a Counter-equivalent pandas groupby) shrink
    the shuffle to the batch-local vocabulary of pairs before the bucketed
    global sum; top-k is a distributed sort + limit. Ties broken by pair
    text ascending for determinism."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        a, b = T.batch_adjacent_pairs(t["text"].to_pylist())
        if not len(a):
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = (pd.DataFrame({"a": a, "b": b})
               .groupby(["a", "b"], as_index=False, sort=False).size())
        # build the "a b" string only for the counted uniques (far fewer)
        pair = out["a"].str.cat(out["b"], sep=" ")
        return pa.table({"pair": pa.array(pair.to_numpy(object), pa.string()),
                         "n": pa.array(out["size"].to_numpy(np.int64))})

    partials = docs.map_batches(partial, batch_format="pyarrow")
    totals = bucket_grouped_sum(
        partials, ["pair"], ["n"], num_buckets=default_num_buckets()
    )
    top = totals.sort(["n", "pair"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: t.cast(pa.schema([("pair", pa.string()), ("n", pa.int64())])),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- token DF
def _tf_rows(t: pa.Table) -> pa.Table:
    """(doc_id, token, tf) term frequencies; one row per distinct
    (doc, token). Docs never span batches (one row per doc). One
    factorize-based groupby per BATCH (not one value_counts per doc)."""
    tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
    if not len(tokens):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "token": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    ids = t["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
    out = (
        pd.DataFrame({"doc_id": ids, "token": tokens})
        .groupby(["doc_id", "token"], as_index=False, sort=False)
        .size()
    )
    return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                     "token": pa.array(out["token"].to_numpy(object), pa.string()),
                     "tf": pa.array(out["size"].to_numpy(np.int64))})


def token_df(sf_dir: str, min_df: int = 5) -> Dataset:
    """(token, df, cf) vocabulary statistics: document frequency and
    collection frequency, restricted to df >= min_df (the long singleton
    tail is noise for tokenizer training and would dominate the result).

    Shuffle ships only per-batch (token, df_partial, cf_partial) partials —
    never raw token streams."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        tf = _tf_rows(t).to_pandas()
        if not len(tf):
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "cf": pa.array([], pa.int64())})
        out = tf.groupby("token", as_index=False).agg(
            df=("doc_id", "size"), cf=("tf", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow")
    totals = bucket_grouped_sum(
        partials, ["token"], ["df", "cf"], num_buckets=default_num_buckets()
    )

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.cast(pa.schema([("token", pa.string()), ("df", pa.int64()),
                              ("cf", pa.int64())]))
        return t.filter(pc.greater_equal(t["df"], min_df))

    return totals.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------- TF-IDF
def tfidf_top_terms(sf_dir: str, k: int = 3) -> Dataset:
    """Per-doc top-k tokens by tf-idf, score = tf * log2(N/df); ties by
    token ascending. Output (doc_id, token, score round 6).

    Fully join-based: the (token, df) table is shuffled onto the
    (doc, token, tf) rows by token-hash bucket (bucket_join) — the df map
    is NEVER broadcast (a web-scale vocabulary doesn't fit one task), and
    the per-doc top-k runs as one vectorized pass per doc-hash bucket."""
    from ..engine.join import bucket_grouped

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    tf = docs.map_batches(_tf_rows, batch_format="pyarrow")
    df = bucket_grouped_sum(
        tf.map_batches(
            lambda t: pa.table({"token": t["token"],
                                "df": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow",
        ),
        ["token"], ["df"], num_buckets=default_num_buckets(),
    ).map_batches(
        lambda t: t.cast(pa.schema([("token", pa.string()), ("df", pa.int64())])),
        batch_format="pyarrow",
    )

    scored = bucket_join(tf, df, on="token", right_on="token", how="inner",
                         num_buckets=default_num_buckets())

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        score = g["tf"].to_numpy(np.float64) * np.log2(
            float(n_docs) / g["df"].to_numpy(np.float64)
        )
        d = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                          "token": g["token"].to_numpy(object),
                          "score": score})
        d = d.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True])
        return d.groupby("doc_id", as_index=False).head(k)

    out = bucket_grouped(
        scored, ["doc_id"], topk,
        out_schema=pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                              ("score", pa.float64())]),
    )
    return out.map_batches(
        lambda t: t.set_column(
            2, "score",
            pa.array(np.round(t["score"].to_numpy(zero_copy_only=False), ROUND)),
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- decontamination
def benchmark_contamination(
    sf_dir: str, ngram: int = 8, bench_prefix: str = "f",
) -> Dataset:
    """Benchmark decontamination: flag corpus docs sharing >= 1 distinct
    word-``ngram`` shingle with any benchmark doc, reporting the count of
    shared distinct shingles. The benchmark set here is carved from the
    corpus deterministically (docs whose md5(text) starts with
    ``bench_prefix`` — no external data); in production it is the held-out
    eval suite.

    Scale shape: the benchmark side is TINY relative to the corpus, so its
    distinct shingle set is collected once and broadcast (ray.put) — the
    corpus side is a single vectorized membership pass (sorted-array
    searchsorted over hashed shingles), no shuffle at all. Benchmark docs
    themselves are excluded from the output."""
    import ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = T.md5_fingerprint(texts)
        marked = [x for fp, x in zip(fps, texts) if fp.startswith(bench_prefix)]
        _, gh = T.batch_gram_hashes(marked, ngram)
        return pa.table({"gram": pa.array(np.unique(gh), pa.int64())})

    bench = docs.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    bench_arr = np.unique(bench["gram"].to_numpy()) if len(bench) else np.array([], np.int64)
    bench_ref = ray.put(bench_arr)

    def scan(t: pa.Table) -> pa.Table:
        bg = ray.get(bench_ref)
        texts = t["text"].to_pylist()
        fps = T.md5_fingerprint(texts)
        # the benchmark itself is not "contaminated"
        keep = [(i, x) for i, fp, x in
                zip(t["doc_id"].to_pylist(), fps, texts)
                if not fp.startswith(bench_prefix)]
        if not keep or not len(bg):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        ids = np.fromiter((i for i, _ in keep), np.int64, count=len(keep))
        rows, gh = T.batch_gram_hashes([x for _, x in keep], ngram)
        if not len(gh):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        idx = np.searchsorted(bg, gh).clip(max=len(bg) - 1)
        hit = bg[idx] == gh
        n = np.bincount(rows[hit], minlength=len(ids)).astype(np.int64)
        pos = n > 0
        return pa.table({"doc_id": pa.array(ids[pos], pa.int64()),
                         "n_shared": pa.array(n[pos], pa.int64())})

    return docs.map_batches(scan, batch_format="pyarrow")


# ------------------------------------------------------- PMI collocations
def pmi_top_pairs(sf_dir: str, k: int = 30, min_count: int = 5) -> Dataset:
    """Top-k adjacent-token collocations by pointwise mutual information:
    pmi = log2( (c_pair / total_pairs) / ((c_a / total_toks) * (c_b / total_toks)) ),
    restricted to pairs with count >= min_count; ties by pair ascending.

    Two bucketed partial-aggregate passes (pair counts, unigram counts) —
    the unigram table is joined onto the pair table by token-hash bucket
    twice (left word, right word), never broadcast (web-scale vocab)."""
    from ..engine.join import bucket_grouped, bucket_join, rename

    docs = read_table(sf_dir, "documents", columns=["text"])

    def pair_partial(t: pa.Table) -> pa.Table:
        a, b = T.batch_adjacent_pairs(t["text"].to_pylist())
        if not len(a):
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = (pd.DataFrame({"a": a, "b": b})
               .groupby(["a", "b"], as_index=False, sort=False).size())
        return pa.table({"a": pa.array(out["a"].to_numpy(object), pa.string()),
                         "b": pa.array(out["b"].to_numpy(object), pa.string()),
                         "n": pa.array(out["size"].to_numpy(np.int64))})

    def uni_partial(t: pa.Table) -> pa.Table:
        tokens, _ = T.batch_word_tokens(t["text"].to_pylist())
        if not len(tokens):
            return pa.table({"token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        s = pd.Series(tokens).value_counts()
        return pa.table({"token": pa.array(s.index.to_numpy(dtype=object)),
                         "c": pa.array(s.to_numpy(np.int64))})

    nb = default_num_buckets()
    # pair counts keyed on the composite (a,b) via the left token's bucket;
    # materialized because both the grouped sum and the total consume it
    pair_parts = docs.map_batches(pair_partial, batch_format="pyarrow").materialize()

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["n"].sum()

    pair_counts = bucket_grouped(
        pair_parts, ["a", "b"], sum_pairs,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n", pa.int64())]),
        num_buckets=nb,
    ).filter(expr=f"n >= {min_count}").materialize()

    uni = bucket_grouped_sum(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["token"], ["c"], num_buckets=nb,
    ).map_batches(
        lambda t: t.cast(pa.schema([("token", pa.string()), ("c", pa.int64())])),
        batch_format="pyarrow",
    ).materialize()

    total_pairs = int(pd.DataFrame(
        pair_parts.map_batches(
            lambda t: pa.table({"s": pa.array([int(np.sum(t["n"].to_numpy()))
                                               if t.num_rows else 0], pa.int64())}),
            batch_format="pyarrow",
        ).to_pandas()
    )["s"].sum())
    total_toks = int(uni.map_batches(
        lambda t: pa.table({"s": pa.array([int(np.sum(t["c"].to_numpy()))
                                           if t.num_rows else 0], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()["s"].sum())

    j1 = bucket_join(pair_counts, rename(uni, {"token": "a", "c": "ca"}),
                     on="a", right_on="a", how="inner", num_buckets=nb)
    j2 = bucket_join(j1, rename(uni, {"token": "b", "c": "cb"}),
                     on="b", right_on="b", how="inner", num_buckets=nb)

    def score(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log2((n / total_pairs) / ((ca / total_toks) * (cb / total_toks)))
        pair = [f"{x} {y}" for x, y in
                zip(t["a"].to_pylist(), t["b"].to_pylist())]
        return pa.table({"pair": pa.array(pair, pa.string()),
                         "n": pa.array(n.astype(np.int64)),
                         "pmi": pa.array(np.round(pmi, ROUND), pa.float64())})

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi", "pair"], descending=[True, False]).limit(k)


# ------------------------------------------------------- stratified sample
def stratified_sample(sf_dir: str, per_source: int = 10) -> Dataset:
    """Deterministic stratified sample: the first ``per_source`` docs per
    source under the (md5(text), doc_id) order — a content-hash order, so
    the sample is reproducible across runs/backfills and unbiased by
    ingest order. The per-group head is one vectorized sort per source
    hash-bucket (bucket_grouped); only (doc_id, source, fp) rows shuffle."""
    from ..engine.join import bucket_grouped

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "fp": pa.array(T.md5_fingerprint(t["text"].to_pylist()),
                                        pa.string())})

    def head(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["source", "fp", "doc_id"])
        return d.groupby("source", as_index=False).head(per_source)[
            ["doc_id", "source"]
        ]

    return bucket_grouped(
        docs.map_batches(fp, batch_format="pyarrow"), ["source"], head,
        out_schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    )


# ------------------------------------------------------- training mix/shard
def training_mix(sf_dir: str) -> Dataset:
    """The final step of a training-data pipeline: weighted source mixing +
    deterministic hash-shuffle into shards. Sources with an even numeric
    suffix get weight 1.0, odd get 0.25; inclusion is decided by a
    content-hash threshold (md5(text) first hex digit < '4' keeps 25%), so
    the mix is reproducible with no RNG state and composes with backfills.
    Shard = md5 first hex digit (16 shards); pos = 1-based rank within the
    shard under the (md5, doc_id) order — hash order IS the shuffle, so
    the training stream is both shuffled and resumable per shard.

    Output (shard, pos, doc_id). Scale: one stateless pass for the
    weight/shard columns, then one bucketed per-shard rank (each shard
    sorts independently; at 100 TB raise the shard-digit count so a shard
    fits a task)."""
    from ..engine.join import bucket_grouped

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def assign(t: pa.Table) -> pa.Table:
        fps = T.md5_fingerprint(t["text"].to_pylist())
        src = t["source"].to_pylist()
        keep, shard, fp_out, ids = [], [], [], []
        for i, s, fp in zip(t["doc_id"].to_pylist(), src, fps):
            even = int(s[3:]) % 2 == 0
            if even or fp[0] < "4":
                ids.append(i)
                shard.append(fp[0])
                fp_out.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shard": pa.array(shard, pa.string()),
                         "fp": pa.array(fp_out, pa.string())})

    assigned = docs.map_batches(assign, batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["shard", "fp", "doc_id"]).reset_index(drop=True)
        d["pos"] = d.groupby("shard").cumcount() + 1
        return d[["shard", "pos", "doc_id"]]

    return bucket_grouped(
        assigned, ["shard"], rank,
        out_schema=pa.schema([("shard", pa.string()), ("pos", pa.int64()),
                              ("doc_id", pa.int64())]),
    )


# ------------------------------------------------------- per-source entropy
def token_entropy_per_source(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the token distribution within each source —
    the corpus-diagnostics analog of the reference's degree-distribution
    entropy (A4): low-entropy sources are templated/spammy. Exact from
    integer counts via H = log2(T) - sum(c*log2 c)/T; only per-source
    scalars reach the driver."""
    from ..engine.join import bucket_grouped

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        if not len(tokens):
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        src = np.asarray(t["source"].to_pylist(), object)[doc_idx]
        df = pd.DataFrame({"source": src, "token": tokens})
        out = df.groupby(["source", "token"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(
            out.rename(columns={"size": "c"}), preserve_index=False
        )

    counts = bucket_grouped_sum(
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        ["source", "token"], ["c"], num_buckets=default_num_buckets(),
    )

    def ent_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        c = df["c"].to_numpy(np.float64)
        df["sc"] = c * np.log2(c)
        out = df.groupby("source", as_index=False).agg(
            t=("c", "sum"), sc=("sc", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    s = (
        counts.map_batches(ent_partial, batch_format="pyarrow")
        .to_pandas().groupby("source", as_index=False)[["t", "sc"]].sum()
    )
    ent = np.log2(s["t"].to_numpy(np.float64)) - (
        s["sc"].to_numpy(np.float64) / s["t"].to_numpy(np.float64)
    )
    return pd.DataFrame({"source": s["source"],
                         "token_entropy": np.round(ent, ROUND)})


# ------------------------------------------------------- grouped quantiles
def chars_quantiles_per_source(sf_dir: str) -> Dataset:
    """Exact per-source n_chars quantiles (rank = ceil(q*n) ascending).
    Scales via the VALUE histogram: a (source, n_chars) count table is
    tiny relative to the docs even when a source has billions of rows, so
    the per-source rank resolution is a vectorized cumsum over distinct
    values — never a per-source row sort."""
    from ..engine.join import bucket_grouped, bucket_grouped_count

    QS = (0.25, 0.5, 0.75)
    docs = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    hist = bucket_grouped_count(docs, ["source", "n_chars"], "c")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, sub in g.groupby("source"):
            sub = sub.sort_values("n_chars")
            cum = sub["c"].cumsum().to_numpy()
            n = int(cum[-1])
            vals = sub["n_chars"].to_numpy()
            for q in QS:
                r = max(1, int(np.ceil(q * n)))
                rows.append({"source": src, "q": float(q),
                             "value": int(vals[np.searchsorted(cum, r)])})
        return pd.DataFrame(rows)

    return bucket_grouped(
        hist, ["source"], resolve,
        out_schema=pa.schema([("source", pa.string()), ("q", pa.float64()),
                              ("value", pa.int64())]),
    )


def chars_percentile_filter(sf_dir: str, q: float = 0.75) -> Dataset:
    """Per-source windowed filter: keep documents whose ``n_chars``
    percent_rank within their source is >= ``q``, reporting
    (doc_id, source, n_chars, pr) with pr = (rows strictly smaller)/(n-1)
    — exactly SQL ``percent_rank()`` (0 when the source has one row).

    Scale shape: the window function runs WITHOUT a per-source row sort —
    pass 1 builds the (source, n_chars) VALUE histogram (per-batch
    partials + one bucketed sum; tiny even when a source has billions of
    rows), a cumsum over distinct values resolves pr per value, and the
    histogram-sized pr table ships once via ray.put for a pure vectorized
    filter pass. Two scans of the input, zero row shuffles."""
    import ray

    from ..engine.join import bucket_grouped_count

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    hist = bucket_grouped_count(docs.select_columns(["source", "n_chars"]),
                                ["source", "n_chars"], "c").to_pandas()
    pr_map = {}
    for src, sub in hist.groupby("source"):
        sub = sub.sort_values("n_chars")
        c = sub["c"].to_numpy(np.int64)
        n = int(c.sum())
        smaller = np.concatenate([[0], np.cumsum(c)[:-1]])
        pr = smaller / (n - 1) if n > 1 else np.zeros(len(c))
        pr_map[src] = (sub["n_chars"].to_numpy(np.int64), np.round(pr, ROUND))
    ref = ray.put(pr_map)

    def flt(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        src = t["source"].to_pylist()
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(v))
        for s in set(src):
            vals, prs = m[s]
            mask = np.fromiter((x == s for x in src), bool, count=len(src))
            pr[mask] = prs[np.searchsorted(vals, v[mask])]
        keep = pr >= q
        t2 = t.filter(pa.array(keep))
        return t2.append_column("pr", pa.array(pr[keep], pa.float64()))

    return docs.map_batches(flt, batch_format="pyarrow")


# ------------------------------------------------------- BPE training loop
def bpe_train(sf_dir: str, n_merges: int = 5) -> pd.DataFrame:
    """Train ``n_merges`` BPE merge rounds corpus-wide: each round counts
    adjacent token pairs over the CURRENT sequences, picks the most
    frequent pair (ties by (a, b) ascending), and rewrites every sequence
    with the pair fused left-to-right non-overlapping — the real
    tokenizer-training loop, not just one count (bpe_pair_counts).
    Returns one row per round: (round, a, b, n).

    Iterative by nature (each round depends on the last merge), so there
    is no SQL oracle; tests/test_corpus_bpe.py asserts exact merge-list
    parity with a pure-python replica. Scale shape per round: per-batch
    partial pair counts -> bucketed sum -> top-1 via sort+limit (driver
    holds one row), then a stateless rewrite pass with the winning pair
    broadcast; sequences are re-materialized once per round so round k
    never recomputes rounds 1..k-1."""
    import ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def to_seqs(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "toks": pa.array([T.word_tokens(x) for x in t["text"].to_pylist()],
                             pa.large_list(pa.large_string())),
        })

    seqs = docs.map_batches(to_seqs, batch_format="pyarrow").materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        col = t["toks"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return pa.table({"a": pa.array([], pa.large_string()),
                             "b": pa.array([], pa.large_string()),
                             "n": pa.array([], pa.int64())})
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        mask = doc_idx[1:] == doc_idx[:-1]
        df = pd.DataFrame({"a": flat[:-1][mask], "b": flat[1:][mask]})
        if not len(df):
            return pa.table({"a": pa.array([], pa.large_string()),
                             "b": pa.array([], pa.large_string()),
                             "n": pa.array([], pa.int64())})
        out = df.groupby(["a", "b"], as_index=False, sort=False).size()
        return pa.table({"a": pa.array(out["a"].to_numpy(object), pa.large_string()),
                         "b": pa.array(out["b"].to_numpy(object), pa.large_string()),
                         "n": pa.array(out["size"].to_numpy(np.int64))})

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["n"].sum()

    from ..engine.join import bucket_grouped

    merges = []
    for r in range(n_merges):
        counts = bucket_grouped(
            seqs.map_batches(pair_partial, batch_format="pyarrow"),
            ["a", "b"], sum_pairs,
            out_schema=pa.schema([("a", pa.large_string()),
                                  ("b", pa.large_string()),
                                  ("n", pa.int64())]),
        )
        top = counts.sort(["n", "a", "b"], descending=[True, False, False]) \
                    .limit(1).to_pandas()
        if top.empty or int(top["n"].iloc[0]) < 2:
            break
        a, b, n = str(top["a"].iloc[0]), str(top["b"].iloc[0]), int(top["n"].iloc[0])
        merges.append({"round": r, "a": a, "b": b, "n": n})
        pair_ref = ray.put((a, b))

        def fuse(t: pa.Table) -> pa.Table:
            pa_, pb = ray.get(pair_ref)
            out = []
            for ws in t["toks"].to_pylist():
                merged, k = [], 0
                while k < len(ws):
                    if k + 1 < len(ws) and ws[k] == pa_ and ws[k + 1] == pb:
                        merged.append(ws[k] + " " + ws[k + 1])
                        k += 2
                    else:
                        merged.append(ws[k])
                        k += 1
                out.append(merged)
            return pa.table({"doc_id": t["doc_id"],
                             "toks": pa.array(out, pa.large_list(pa.large_string()))})

        seqs = seqs.map_batches(fuse, batch_format="pyarrow").materialize()

    out = pd.DataFrame(merges, columns=["round", "a", "b", "n"])
    out["round"] = out["round"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64) if len(out) else out["n"]
    return out


# ------------------------------------------------------- curation capstone
def curation_pipeline(sf_dir: str) -> Dataset:
    """End-to-end corpus curation — the composition a training-data team
    actually runs, as ONE dataflow: quality filter (n_chars >= 200, lang
    in {en, fr}) → exact-dup survivors (min doc_id per text, full-corpus
    semantics) → drop near-dup non-survivors (near_dup_clusters keep
    rule) → drop benchmark-contaminated docs → deterministic hash-shard
    with within-shard rank. Output (shard, pos, doc_id).

    Scale shape: the exact-dup survivor flag is a bucketed join of the
    per-text min back onto the docs (corpus-sized, never broadcast); the
    near-dup and contamination DROP sets are the small derived tables
    (paired/contaminated docs only) and ship via ray.put; the final rank
    is one vectorized pass per shard bucket."""
    import ray

    from ..engine.join import bucket_grouped, bucket_join, rename
    from ..functions.hashing import hash_strings
    from .dedup import _HASH_KEY_2

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang", "n_chars"])

    # --- quality filter (cheap, first)
    def qual(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.greater_equal(t["n_chars"], 200),
            pc.is_in(t["lang"], value_set=pa.array(["en", "fr"])),
        )
        return t.filter(keep).select(["doc_id", "text"])

    q = docs.map_batches(qual, batch_format="pyarrow").materialize()

    # --- exact-dup survivor flag (FULL corpus semantics, like the oracle's
    # window over all documents): min doc_id per (hash, hash2) joined back
    full = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "text_hash": pa.array(hash_strings(texts)),
            "h2": pa.array(hash_strings(texts, key=_HASH_KEY_2)),
            "doc_id": t["doc_id"],
        })

    hashed = full.map_batches(h, batch_format="pyarrow").materialize()

    def gmin(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["text_hash", "h2"], as_index=False)["doc_id"].min() \
                .rename(columns={"doc_id": "keep_id"})

    mins = bucket_grouped(
        hashed, ["text_hash"], gmin,
        out_schema=pa.schema([("text_hash", pa.int64()), ("h2", pa.int64()),
                              ("keep_id", pa.int64())]),
    )
    joined = bucket_join(
        hashed, rename(mins, {"h2": "h2_r"}),
        on="text_hash", right_on="text_hash", how="inner",
    )

    def survivors(t: pa.Table) -> pa.Table:
        ok = (
            (t["h2"].to_numpy(zero_copy_only=False)
             == t["h2_r"].to_numpy(zero_copy_only=False))
            & (t["doc_id"].to_numpy(zero_copy_only=False)
               == t["keep_id"].to_numpy(zero_copy_only=False))
        )
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(ok))})

    surv = joined.map_batches(survivors, batch_format="pyarrow")

    # --- small drop sets: near-dup non-survivors + contaminated docs
    from .dedup import near_dup_clusters

    nd = near_dup_clusters(sf_dir).to_pandas()
    nd_drop = (nd.loc[~nd["keep"], "doc_id"].to_numpy(np.int64)
               if len(nd) else np.array([], np.int64))
    cont = benchmark_contamination(sf_dir).to_pandas()
    cont_ids = (cont["doc_id"].to_numpy(np.int64)
                if len(cont) else np.array([], np.int64))
    drop_ref = ray.put(np.unique(np.concatenate([nd_drop, cont_ids])))

    # --- intersect: quality rows that survived exact dedup, minus drops
    kept = bucket_join(q, rename(surv, {"doc_id": "doc_id"}),
                       on="doc_id", right_on="doc_id", how="inner")

    def finish(t: pa.Table) -> pa.Table:
        drops = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(drops):
            idx = np.searchsorted(drops, ids).clip(max=len(drops) - 1)
            mask = drops[idx] != ids
        else:
            mask = np.ones(len(ids), bool)
        sub = t.filter(pa.array(mask))
        fps = T.md5_fingerprint(sub["text"].to_pylist())
        return pa.table({"doc_id": sub["doc_id"],
                         "shard": pa.array([f[0] for f in fps], pa.string()),
                         "fp": pa.array(fps, pa.string())})

    assigned = kept.map_batches(finish, batch_format="pyarrow")

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["shard", "fp", "doc_id"]).reset_index(drop=True)
        d["pos"] = d.groupby("shard").cumcount() + 1
        return d[["shard", "pos", "doc_id"]]

    return bucket_grouped(
        assigned, ["shard"], rank,
        out_schema=pa.schema([("shard", pa.string()), ("pos", pa.int64()),
                              ("doc_id", pa.int64())]),
    )


# ------------------------------------------------------- segment dedup
def segment_dedup(sf_dir: str, seg_tokens: int = 20) -> Dataset:
    """CCNet-style sub-document (paragraph-analog) dedup: split every
    document into fixed ``seg_tokens``-token segments, dedup segments
    EXACTLY across the corpus keeping the first occurrence in
    (doc_id, seg_idx) order, and report per-document retention
    (doc_id, n_segs, n_kept).

    The web-corpus workhorse for boilerplate removal (navigation bars,
    license footers repeat across pages while full documents differ —
    whole-doc exact dedup misses them; the reference-era analog is
    paragraph dedup over '\\n\\n' splits; the driver's synthetic documents
    are single-line token streams so the segment boundary is token count).

    Scale shape: segment rows carry only (md5, composite first-key,
    doc_id) — never the segment text; the keep rule is one bucketed
    groupby-min on the hash, joined back by hash (corpus-sized, never
    broadcast); per-doc counts are per-batch partials + one bucketed sum.
    Segment index fits 2^20 (docs are bounded; asserted), so the
    first-occurrence order key packs exactly into int64."""
    from ..engine.join import bucket_grouped, bucket_join, rename

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def seg_rows(t: pa.Table) -> pa.Table:
        # per-doc loop is the MEASURED-fastest form (BASELINE §6): at the
        # realistic ~80-token doc shape, batch-flattening the tokens costs
        # more than the whole loop (char-slice rewrite re-measured 1.9x
        # slower at probe shape this round); md5 is the irreducible cost.
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        doc, idx, segs = [], [], []
        for did, tx in zip(ids, texts):
            toks = T.word_tokens(tx)
            n = (len(toks) + seg_tokens - 1) // seg_tokens
            assert n < (1 << 20), "segment index would overflow the order key"
            for i in range(n):
                doc.append(did)
                idx.append(i)
                segs.append(" ".join(toks[i * seg_tokens:(i + 1) * seg_tokens]))
        h = T.md5_fingerprint(segs)
        doc_a = np.asarray(doc, np.int64)
        idx_a = np.asarray(idx, np.int64)
        return pa.table({
            "h": pa.array(h, pa.string()),
            "doc_id": pa.array(doc_a, pa.int64()),
            "ordkey": pa.array((doc_a << np.int64(20)) | idx_a, pa.int64()),
        })

    segs = docs.map_batches(seg_rows, batch_format="pyarrow").materialize()

    def gmin(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("h", as_index=False)["ordkey"].min()
                .rename(columns={"ordkey": "firstkey"}))

    firsts = bucket_grouped(
        segs.select_columns(["h", "ordkey"]), ["h"], gmin,
        out_schema=pa.schema([("h", pa.string()), ("firstkey", pa.int64())]),
    )
    joined = bucket_join(segs, firsts, on="h", right_on="h", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        kept = (t["ordkey"].to_numpy(zero_copy_only=False)
                == t["firstkey"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                           "n_segs": 1, "n_kept": kept.astype(np.int64)})
        out = df.groupby("doc_id", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = bucket_grouped_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["doc_id"], ["n_segs", "n_kept"], num_buckets=default_num_buckets(),
    )
    return out.map_batches(
        lambda t: t.cast(pa.schema([("doc_id", pa.int64()),
                                    ("n_segs", pa.int64()),
                                    ("n_kept", pa.int64())])),
        batch_format="pyarrow",
    )


# ------------------------------------------------- quality-weighted sample
def quality_weighted_sample(sf_dir: str) -> Dataset:
    """Importance sampling for training-data mixing: keep each document
    with probability rate(doc) = clip(n_chars / 400, 0.05, 1.0) — longer
    (higher-quality-proxy) docs kept at higher rates — decided by a pure
    function of content (md5), so reruns and disjoint shards agree with no
    RNG state (the weighted generalization of hash_sample).

    Membership test runs entirely in hex-string space: the first 8 md5 hex
    chars compared lexicographically against lpad(hex(floor(rate*2^32)))
    is EXACTLY the numeric u < rate test (fixed-width lowercase hex orders
    like the integers), which keeps the DuckDB oracle and the Ray side
    bit-identical with no platform float parsing. Embarrassingly parallel:
    a pure filter per batch."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        rate = np.clip(n / 400.0, 0.05, 1.0)
        thresh = np.minimum(np.floor(rate * 4294967296.0),
                            4294967295.0).astype(np.int64)
        fps = T.md5_fingerprint(t["text"].to_pylist())
        keep = np.fromiter(
            (f[:8] < format(th, "08x") for f, th in zip(fps, thresh)),
            bool, count=len(fps))
        kept = t.filter(pa.array(keep))
        kn = kept["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": kept["doc_id"],
            "source": kept["source"],
            "rate": pa.array(np.clip(kn / 400.0, 0.05, 1.0), pa.float64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------- bigram LM
def bigram_lm_top(sf_dir: str, k: int = 50, min_count: int = 5) -> Dataset:
    """Top-k next-token conditional probabilities P(b | a) =
    count(a,b) / count(a, *) over adjacent lowercase-token pairs — the
    counting core of an n-gram language model (and of the perplexity-proxy
    quality filters built from one). Pairs below ``min_count`` are cut.

    Shape: per-batch partial pair counts (batch-local vocabulary), then ONE
    bucketed exchange keyed on the left token — every (a, *) row
    co-locates, so the conditional denominator is computed inside the same
    bucket task as the numerator (no second shuffle, no vocab broadcast).
    Top-k = distributed sort + limit, ties broken by (a, b)."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        a, b = T.batch_adjacent_pairs(t["text"].to_pylist())
        if not len(a):
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = (pd.DataFrame({"a": a, "b": b})
               .groupby(["a", "b"], as_index=False, sort=False).size())
        return pa.table({"a": pa.array(out["a"].to_numpy(object), pa.string()),
                         "b": pa.array(out["b"].to_numpy(object), pa.string()),
                         "n": pa.array(out["size"].to_numpy(np.int64))})

    from ..engine.join import bucket_grouped

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        pc = g.groupby(["a", "b"], as_index=False)["n"].sum()
        na = pc.groupby("a")["n"].transform("sum")
        pc["p"] = np.round(pc["n"].to_numpy(np.float64)
                           / na.to_numpy(np.float64), ROUND)
        return pc[pc["n"] >= min_count][["a", "b", "n", "p"]]

    scored = bucket_grouped(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["a"], finish,
        out_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("n", pa.int64()), ("p", pa.float64())]),
        num_buckets=default_num_buckets(),
    )
    return scored.sort(["p", "a", "b"],
                       descending=[True, False, False]).limit(k)


def bpe_apply(sf_dir: str, n_merges: int = 5) -> Dataset:
    """Tokenizer APPLICATION: encode every document with the merge list
    learned by bpe_train (same corpus here; in production the merges come
    from a training run) and report per-doc (doc_id, n_tokens_raw,
    n_tokens_bpe) — the compression bookkeeping used to size training
    shards after tokenization.

    Scale shape: the merge list is tiny and broadcast once via ray.put;
    encoding is a stateless per-batch pass applying merges in training
    order, left-to-right non-overlapping (the exact fuse rule of
    bpe_train, so train->apply round-trips are consistent). Exact parity
    with a pure-python replica in tests/test_corpus_bpe.py."""
    import ray

    merges_df = bpe_train(sf_dir, n_merges=n_merges)
    merges = [(str(r["a"]), str(r["b"])) for _, r in merges_df.iterrows()]
    m_ref = ray.put(merges)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(t: pa.Table) -> pa.Table:
        # whole-batch integer-code merge passes instead of a per-doc
        # per-merge Python while-loop: factorize tokens once, then each
        # merge is vectorized pair-matching over the code array
        # (measured 2.7x at the ~80-token probe shape with 10 merges;
        # advantage grows with merge count — the per-doc form is
        # O(docs x merges x tokens) Python, this is O(merges) numpy
        # passes, BASELINE §6).
        # Left-to-right non-overlap greediness: overlapping matches only
        # arise as runs of CONSECUTIVE positions (requires a == b), and
        # the greedy scan keeps exactly the even offsets within each run.
        # Merged units get fresh codes keyed by their "a b" string — the
        # same identity the string-based reference fuse uses, so later
        # merges referencing earlier merged units resolve identically.
        ms = ray.get(m_ref)
        texts = t["text"].to_pylist()
        tokens, doc_idx = T.batch_word_tokens(texts)
        raw_n = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
        if len(tokens):
            codes, uniques = pd.factorize(tokens)
            codes = codes.astype(np.int64)
            vocab = {u: i for i, u in enumerate(uniques)}
        else:
            codes = np.array([], np.int64)
            vocab = {}
        for a, b in ms:
            unit = a + " " + b
            cm = vocab.setdefault(unit, len(vocab))
            ca, cb = vocab.get(a), vocab.get(b)
            if ca is None or cb is None or len(codes) < 2:
                continue
            p = np.flatnonzero((codes[:-1] == ca) & (codes[1:] == cb)
                               & (doc_idx[:-1] == doc_idx[1:]))
            if not len(p):
                continue
            run_start = np.concatenate([[True], np.diff(p) != 1])
            first = p[run_start][np.cumsum(run_start) - 1]
            keep = p[((p - first) % 2) == 0]
            codes[keep] = cm
            alive = np.ones(len(codes), bool)
            alive[keep + 1] = False
            codes = codes[alive]
            doc_idx = doc_idx[alive]
        bpe_n = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens_raw": pa.array(raw_n),
            "n_tokens_bpe": pa.array(bpe_n),
        })

    return docs.map_batches(encode, batch_format="pyarrow")


def zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law fit of the corpus token distribution: least-squares
    slope of ln(count) against ln(rank) over the full vocabulary (rank 1 =
    most frequent; ties broken by token ascending). One row:
    (vocab_size, zipf_slope) — the standard sanity probe that a scraped
    corpus has natural-language frequency structure (slope ≈ -1).

    Counts are distributed partials + one bucketed sum; only the
    VOCABULARY-sized count table reaches the driver for ranking and the
    closed-form slope (sums in float64, matching DuckDB's regr_slope)."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, _doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        toks, cnts = np.unique(flat, return_counts=True)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array(cnts.astype(np.int64))})

    counts = bucket_grouped_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token"], ["n"], num_buckets=default_num_buckets(),
    ).to_pandas()  # vocabulary-sized
    counts = counts.sort_values(["n", "token"],
                                ascending=[False, True], ignore_index=True)
    rank = np.arange(1, len(counts) + 1, dtype=np.float64)
    x = np.log(rank)
    y = np.log(counts["n"].to_numpy(np.float64))
    n = float(len(x))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame([{"vocab_size": np.int64(len(counts)),
                          "zipf_slope": round(float(slope), 6)}])


# --------------------------------------------------------- BM25 search
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("hash", "join"),
    1: ("fast", "scan", "filter"),
    2: ("window", "query", "group"),
}


def bm25_topk(sf_dir: str, k: int = 10, k1: float = 1.2,
              b: float = 0.75) -> Dataset:
    """Lucene-style BM25 top-k document search for a fixed query set:
    (query_id, doc_id, score), score rounded to 6, top-k per query ranked
    by (rounded score desc, doc_id asc).

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1); per-term contribution
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), dl = [a-z0-9]+
    token count, avgdl = sum(dl)/N over ALL documents.

    Scale shape: the query-term set is tiny and broadcast inside the batch
    fn; the corpus side is ONE vectorized tf pass emitting only rows for
    docs that contain a query term. df and the global (N, sum_dl) stats
    are bounded aggregates (#terms rows / 2 scalars) — never a vocabulary
    shuffle. Per-(query, doc) scores combine with one bucketed sum; top-k
    runs as per-block partial top-k (#blocks x k rows) before one final
    per-query pass — a full ranking never materializes."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = sorted({w for ts in BM25_QUERIES.values() for w in ts})
    t2i = {w: i for i, w in enumerate(terms)}

    # pass 1: (sum_dl, n_docs) — two exact integers
    def dl_partial(t: pa.Table) -> pa.Table:
        _, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        return pa.table({"sum_dl": pa.array([len(doc_idx)], pa.int64()),
                         "n_docs": pa.array([t.num_rows], pa.int64())})

    stats = (docs.map_batches(dl_partial, batch_format="pyarrow")
             .sum(["sum_dl", "n_docs"]))
    n_total = int(stats["sum(n_docs)"])
    avgdl = float(stats["sum(sum_dl)"]) / float(n_total)

    # pass 2: per-doc (term_idx, tf, dl) rows for query-term matches
    def tf_rows(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(tokens):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "ti": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        dl = np.bincount(doc_idx, minlength=t.num_rows)
        ti = np.array([t2i.get(w, -1) for w in tokens], np.int64)
        m = ti >= 0
        df_ = (pd.DataFrame({"d": doc_idx[m], "ti": ti[m]})
               .groupby(["d", "ti"], as_index=False, sort=False).size())
        d = df_["d"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[d], pa.int64()),
            "ti": pa.array(df_["ti"].to_numpy(np.int64)),
            "tf": pa.array(df_["size"].to_numpy(np.int64)),
            "dl": pa.array(dl[d].astype(np.int64)),
        })

    rows = docs.map_batches(tf_rows, batch_format="pyarrow").materialize()

    # df per term: bounded by len(terms) — driver-side is exact and tiny
    dfs = np.zeros(len(terms), np.int64)
    df_tbl = (rows.groupby("ti").count().to_pandas())
    for ti_, c in zip(df_tbl["ti"], df_tbl["count()"]):
        dfs[int(ti_)] = int(c)
    idf = np.log((n_total - dfs + 0.5) / (dfs + 0.5) + 1.0)

    # per-(query, doc) score partials; one bucketed sum
    def contrib(t: pa.Table) -> pa.Table:
        ti_ = t["ti"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        out_q, out_d, out_c = [], [], []
        c_all = idf[ti_] * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl))
        for qid, ts in BM25_QUERIES.items():
            want = np.isin(ti_, [t2i[w] for w in ts])
            if not want.any():
                continue
            out_q.append(np.full(int(want.sum()), qid, np.int64))
            out_d.append(did[want])
            out_c.append(c_all[want])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "score": pa.array(np.concatenate(out_c))})

    scored = bucket_grouped_sum(
        rows.map_batches(contrib, batch_format="pyarrow"),
        ["query_id", "doc_id"], ["score"], num_buckets=default_num_buckets(),
    )

    def part_topk(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        df_["score"] = np.round(df_["score"].to_numpy(np.float64), 6)
        df_ = df_.sort_values(["query_id", "score", "doc_id"],
                              ascending=[True, False, True])
        return pa.Table.from_pandas(df_.groupby("query_id").head(k),
                                    preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        return g.head(k)

    return (scored.map_batches(part_topk, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pandas"))


# -------------------------------------- DSIR-style importance weights
def dsir_weights(sf_dir: str, target_lang: str = "en",
                 n_buckets: int = 4096) -> Dataset:
    """Data-selection importance weights (DSIR-flavored, Xie et al. 2023
    'Data Selection for Language Models via Importance Resampling' —
    public method): hashed-unigram bucket distributions for the TARGET
    slice (lang == target_lang) and the RAW corpus, then per-document
    mean log-likelihood ratio over its token occurrences:
        weight(d) = mean_{w in d} ln( p_target(b(w)) / p_raw(b(w)) )
    with Laplace(+1) smoothing and b(w) = first 3 hex chars of md5(w)
    (replicable bit-for-bit in SQL). Output (doc_id, weight round 6),
    docs with >= 1 token.

    Scale shape: per-batch bucket histograms (<= n_buckets rows each) +
    one bucketed sum build the TWO distributions; the log-ratio table is
    n_buckets floats — bounded, broadcast into the second pass; the
    scoring pass is shuffle-free."""
    import hashlib

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"])

    def bucket_of(uniques: np.ndarray) -> np.ndarray:
        return np.array(
            [int(hashlib.md5(w.encode()).hexdigest()[:3], 16)
             for w in uniques], np.int64)

    def hist_partial(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        if not len(tokens):
            return pa.table({"b": pa.array([], pa.int64()),
                             "c_raw": pa.array([], pa.int64()),
                             "c_tgt": pa.array([], pa.int64())})
        codes, uniques = pd.factorize(tokens)
        buckets = bucket_of(uniques)[codes]
        is_tgt = (t["lang"].to_numpy(zero_copy_only=False)[doc_idx]
                  == target_lang)
        c_raw = np.bincount(buckets, minlength=n_buckets)
        c_tgt = np.bincount(buckets[is_tgt], minlength=n_buckets)
        nz = (c_raw > 0)
        return pa.table({"b": pa.array(np.flatnonzero(nz), pa.int64()),
                         "c_raw": pa.array(c_raw[nz].astype(np.int64)),
                         "c_tgt": pa.array(c_tgt[nz].astype(np.int64))})

    hist = bucket_grouped_sum(
        docs.map_batches(hist_partial, batch_format="pyarrow"),
        ["b"], ["c_raw", "c_tgt"], num_buckets=default_num_buckets(),
    ).to_pandas()  # <= n_buckets rows — bounded at any corpus scale
    c_raw = np.zeros(n_buckets, np.float64)
    c_tgt = np.zeros(n_buckets, np.float64)
    c_raw[hist["b"].to_numpy(np.int64)] = hist["c_raw"].to_numpy(np.float64)
    c_tgt[hist["b"].to_numpy(np.int64)] = hist["c_tgt"].to_numpy(np.float64)
    tn, rn = float(c_tgt.sum()), float(c_raw.sum())
    lr = np.log(((c_tgt + 1.0) / (tn + float(n_buckets)))
                / ((c_raw + 1.0) / (rn + float(n_buckets))))

    def score(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if not len(tokens):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        codes, uniques = pd.factorize(tokens)
        v = lr[bucket_of(uniques)[codes]]
        s = np.bincount(doc_idx, weights=v, minlength=t.num_rows)
        n = np.bincount(doc_idx, minlength=t.num_rows)
        keep = n > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "weight": pa.array(np.round(s[keep] / n[keep], 6), pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------- lexical richness
def lexical_richness(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical-richness profile: exact token count, type
    (distinct-token) count, hapax-legomenon count (collection frequency
    exactly 1 within the source), type-token ratio and hapax fraction —
    the corpus-quality screen a tokenizer-training pipeline runs before
    fitting a vocabulary.

    Dataflow: per-batch (source, token, cf) partial counts (the _tf_rows
    factorize kernel, token stream never leaves the task), ONE bucketed
    exchange keyed (source, token), then per-batch per-source integer
    partials — the driver sums a handful of source rows. Exact distinct
    counting at any scale: each (source, token) lands in exactly one
    bucket row after the exchange."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        tf = _tf_rows(t).to_pandas()
        if not len(tf):
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        src = pd.Series(
            t["source"].to_pandas().to_numpy(object),
            index=t["doc_id"].to_numpy(zero_copy_only=False),
        )
        tf["source"] = src.loc[tf["doc_id"]].to_numpy(object)
        out = tf.groupby(["source", "token"], as_index=False, sort=False)[
            "tf"
        ].sum()
        return pa.table({"source": pa.array(out["source"], pa.string()),
                         "token": pa.array(out["token"], pa.string()),
                         "cf": pa.array(out["tf"].to_numpy(np.int64))})

    totals = bucket_grouped_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "token"], ["cf"], num_buckets=default_num_buckets(),
    )

    def agg(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("source")["cf"]
        out = pd.DataFrame({
            "n_tokens": g.sum(), "n_types": g.size(),
            "n_hapax": g.apply(lambda s: int((s == 1).sum())),
        }).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    p = totals.map_batches(agg, batch_format="pyarrow").to_pandas()
    p = p.groupby("source", as_index=False)[["n_tokens", "n_types", "n_hapax"]].sum()
    p = p.sort_values("source").reset_index(drop=True)
    return pd.DataFrame({
        "source": p["source"],
        "n_tokens": p["n_tokens"].astype(np.int64),
        "n_types": p["n_types"].astype(np.int64),
        "n_hapax": p["n_hapax"].astype(np.int64),
        "ttr": [round(a / b, 6) for a, b in zip(p["n_types"], p["n_tokens"])],
        "hapax_frac": [round(a / b, 6) for a, b in zip(p["n_hapax"], p["n_types"])],
    })


# ------------------------------------------------- cross-source overlap
def source_overlap(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Pairwise cross-source n-gram-shingle overlap matrix — the
    contamination audit run between corpus subsets before mixing them
    into a training set: for every source pair (a < b), the distinct
    3-gram shingle sets' intersection size and Jaccard similarity.

    Shingles are 63-bit polynomial hashes (functions/text.py
    batch_gram_hashes — set semantics identical to the joined-string
    shingle, collisions ~2^-63, same contract ngram_jaccard_pairs is
    verified under). ONE bucketed exchange keyed by gram hash: each
    bucket task dedups its (g, source) rows, emits per-source distinct
    counts and per-pair co-occurrence counts (every g lives in exactly
    one bucket, so the partials are additive); the driver sums a
    handful of (source, source) rows. Never a cross-bucket self-join,
    never a broadcast of a shingle set."""
    from ..engine.join import bucket_grouped

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        rows, gh = T.batch_gram_hashes(t["text"].to_pylist(), n)
        if not len(rows):
            return pa.table({"g": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        src = t["source"].to_pandas().to_numpy(object)[rows]
        d = pd.DataFrame({"g": gh, "source": src}).drop_duplicates()
        return pa.table({"g": pa.array(d["g"].to_numpy(np.int64)),
                         "source": pa.array(d["source"].to_numpy(object),
                                            pa.string())})

    p = docs.map_batches(partial, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["g", "source"]].drop_duplicates()
        tot = d.groupby("source").size()
        m = d.merge(d, on="g")
        m = m[m["source_x"] < m["source_y"]]
        pr = m.groupby(["source_x", "source_y"]).size()
        rows = [{"sa": s, "sb": "", "n": int(c)} for s, c in tot.items()]
        rows += [{"sa": a, "sb": b, "n": int(c)} for (a, b), c in pr.items()]
        return pd.DataFrame(rows, columns=["sa", "sb", "n"])

    pdf = bucket_grouped(p, ["g", "source"], agg).to_pandas()
    tot = pdf[pdf["sb"] == ""].groupby("sa")["n"].sum()
    pairs = pdf[pdf["sb"] != ""].groupby(["sa", "sb"])["n"].sum()

    rows = []
    for (a, b), i in sorted(pairs.items()):
        na, nb, i = int(tot[a]), int(tot[b]), int(i)
        rows.append({
            "source_a": a, "source_b": b,
            "n_a": np.int64(na), "n_b": np.int64(nb),
            "n_shared": np.int64(i),
            "jaccard": np.float64(round(i / (na + nb - i), 6)),
        })
    return pd.DataFrame(rows)


def term_burstiness(sf_dir: str, min_cf: int = 50, k: int = 30) -> Dataset:
    """Top-k bursty terms: chi-square of each token's observed-vs-expected
    distribution across sources (expected = collection frequency x the
    source's share of all tokens). The classic corpus-drift / topicality
    signal. (token, cf, chi2), chi2 desc then token asc.

    Per-batch (token, source) partial counts fold through one bucketed
    exchange keyed on token (each token's full source vector co-locates);
    the per-source token totals are a 5-row broadcast. Zero-count
    (token, source) cells contribute E (as (0-E)²/E = E), computed
    without materializing the cross product."""
    import ray

    from ray.data import aggregate as _agg

    from ..engine.join import bucket_grouped, default_num_buckets
    from .textstats import round_sql
    Sum = _agg.Sum

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        if not len(tokens):
            return pa.table({"token": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "o": pa.array([], pa.int64())})
        src = t["source"].to_numpy(zero_copy_only=False)[doc_idx]
        out = (pd.DataFrame({"token": tokens, "source": src})
               .groupby(["token", "source"], as_index=False, sort=False)
               .size().rename(columns={"size": "o"}))
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = docs.map_batches(partial, batch_format="pyarrow").materialize()

    # per-source token totals: dimension-sized (a handful of sources)
    per_src = (counts.groupby("source")
               .aggregate(Sum("o", alias_name="t")).to_pandas()
               .sort_values("source", ignore_index=True))
    srcs = per_src["source"].to_numpy()
    t_s = per_src["t"].to_numpy(np.float64)
    t_tot = float(t_s.sum())
    ref = ray.put((srcs, t_s, t_tot))

    def chi2(g: pd.DataFrame) -> pd.DataFrame:
        srcs_, ts_, tt_ = ray.get(ref)
        agg = g.groupby(["token", "source"], as_index=False)["o"].sum()
        piv = agg.pivot_table(index="token", columns="source", values="o",
                              fill_value=0, aggfunc="sum")
        piv = piv.reindex(columns=srcs_, fill_value=0)
        o = piv.to_numpy(np.float64)
        cf = o.sum(axis=1)
        keep = cf >= min_cf
        if not keep.any():
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cf": pd.Series([], dtype="int64"),
                                 "chi2": pd.Series([], dtype="float64")})
        o, cf = o[keep], cf[keep]
        e = cf[:, None] * (ts_[None, :] / tt_)
        d = o - e
        x2 = (d * d / e).sum(axis=1)
        out = pd.DataFrame({"token": piv.index.to_numpy()[keep],
                            "cf": cf.astype(np.int64),
                            "chi2": round_sql(x2)})
        return out.sort_values(["chi2", "token"],
                               ascending=[False, True]).head(k)

    per = bucket_grouped(counts, ["token"], chi2,
                         num_buckets=default_num_buckets())
    parts = per.to_pandas()
    top = parts.sort_values(["chi2", "token"],
                            ascending=[False, True]).head(k)
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "token": pa.array(top["token"]),
        "cf": pa.array(top["cf"].to_numpy(np.int64)),
        "chi2": pa.array(top["chi2"].to_numpy(np.float64), pa.float64()),
    }))


def source_lm_divergence(sf_dir: str) -> Dataset:
    """Domain-shift matrix: cross-entropy (bits/bigram) of each source's
    bigram stream under every other source's add-one-smoothed bigram LM —
    the CCNet/KenLM-style corpus-similarity diagnostic, as one
    left-token-bucketed exchange. (lm_source, target_source, n_bigrams,
    cross_entropy_bits).

    Per-batch (source, a, b) partial counts bucket on the LEFT token, so
    each bucket holds every source's full (a, *) row set: the smoothed
    per-(A, B) log-prob sums are 5 vectorized merges per bucket, and only
    a sources² partial matrix leaves each bucket. The vocab size V and
    per-source bigram totals are dimension-sized driver folds."""
    import ray as _ray

    from ray.data import aggregate as _agg

    from ..engine.join import bucket_grouped, default_num_buckets

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        tokens, doc_idx = T.batch_word_tokens(t["text"].to_pylist())
        if len(tokens) < 2:
            return pa.table({"source": pa.array([], pa.string()),
                             "a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        mask = doc_idx[1:] == doc_idx[:-1]
        src = t["source"].to_numpy(zero_copy_only=False)[doc_idx[:-1][mask]]
        out = (pd.DataFrame({"source": src, "a": tokens[:-1][mask],
                             "b": tokens[1:][mask]})
               .groupby(["source", "a", "b"], as_index=False, sort=False)
               .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = docs.map_batches(partial, batch_format="pyarrow").materialize()

    # vocab size V: distinct unigram tokens over the corpus (left OR right
    # position — identical to SQL's unnest-all distinct because every
    # token appears as a left token unless it's a doc's last, and as a
    # right token unless first; union both sides)
    def uni(t: pa.Table) -> pa.Table:
        tokens, _ = T.batch_word_tokens(t["text"].to_pylist())
        u = np.unique(tokens) if len(tokens) else np.array([], object)
        return pa.table({"token": pa.array(u, pa.string())})

    from ..engine.degrees import distinct_pairs
    vocab = distinct_pairs(
        docs.map_batches(uni, batch_format="pyarrow"), ["token"])
    V = int(vocab.count())

    nb = (counts.groupby("source")
          .aggregate(_agg.Sum("n", alias_name="nb")).to_pandas())
    n_of = dict(zip(nb["source"], nb["nb"].astype(np.int64)))
    # LM sources = ALL distinct document sources (matches the oracle's
    # `srcs AS (SELECT DISTINCT source FROM documents)`): a source whose
    # docs all have <2 tokens still contributes lm_source rows, just
    # with an empty bigram LM (add-one smoothing handles the zero counts)
    from ..engine.degrees import distinct_pairs
    srcs = sorted(
        distinct_pairs(docs.select_columns(["source"]), ["source"])
        .to_pandas()["source"])

    def bucket_sums(g: pd.DataFrame) -> pd.DataFrame:
        pc_ = g.groupby(["source", "a", "b"], as_index=False)["n"].sum()
        cu = pc_.groupby(["source", "a"], as_index=False)["n"].sum() \
            .rename(columns={"n": "na"})
        rows = []
        for A in srcs:
            ca = pc_[pc_["source"] == A][["a", "b", "n"]].rename(
                columns={"n": "n_a"})
            cua = cu[cu["source"] == A][["a", "na"]]
            m = pc_.merge(ca, on=["a", "b"], how="left").merge(
                cua, on="a", how="left")
            num = m["n_a"].fillna(0).to_numpy(np.float64) + 1.0
            den = m["na"].fillna(0).to_numpy(np.float64) + float(V)
            term = m["n"].to_numpy(np.float64) * np.log2(num / den)
            s = pd.DataFrame({"target_source": m["source"], "t": term}) \
                .groupby("target_source", as_index=False)["t"].sum()
            s["lm_source"] = A
            rows.append(s)
        return pd.concat(rows, ignore_index=True)

    per = bucket_grouped(counts, ["a"], bucket_sums,
                         num_buckets=default_num_buckets())
    tot = (per.groupby(["lm_source", "target_source"])
           .aggregate(_agg.Sum("t", alias_name="t")).to_pandas())
    tot = tot.sort_values(["lm_source", "target_source"],
                          ignore_index=True)
    from .textstats import round_sql
    nbv = tot["target_source"].map(n_of).to_numpy(np.float64)
    h = round_sql(-tot["t"].to_numpy(np.float64) / nbv)
    return _ray.data.from_arrow(pa.table({
        "lm_source": pa.array(tot["lm_source"]),
        "target_source": pa.array(tot["target_source"]),
        "n_bigrams": pa.array(tot["target_source"].map(n_of)
                              .to_numpy(np.int64)),
        "cross_entropy_bits": pa.array(h, pa.float64()),
    }))


def train_val_test_split(sf_dir: str, train: float = 0.8,
                         val: float = 0.1) -> Dataset:
    """Deterministic three-way corpus split: each document lands in
    train/val/test by its content hash (first 8 md5 hex chars compared
    against the fixed-width hex thresholds — the quality_weighted_sample
    trick, so reruns and disjoint shards agree with no RNG state), and
    the report is per-(source, split) counts with the realised fraction.
    (source, split, n_docs, fraction). Embarrassingly parallel: a pure
    per-batch classification + a tiny grouped fold."""
    from ray.data import aggregate as _agg

    from .textstats import round_sql

    t_train = format(int(min(np.floor(train * 4294967296.0),
                             4294967295.0)), "08x")
    t_val = format(int(min(np.floor((train + val) * 4294967296.0),
                           4294967295.0)), "08x")

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = T.md5_fingerprint(t["text"].to_pylist())
        split = np.array(["train" if f[:8] < t_train
                          else ("val" if f[:8] < t_val else "test")
                          for f in fps], object)
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "split": split,
        }).groupby(["source", "split"], as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n_docs"}), preserve_index=False)

    agg = (docs.map_batches(fn, batch_format="pyarrow")
           .groupby(["source", "split"])
           .aggregate(_agg.Sum("n_docs", alias_name="n_docs")).to_pandas())
    tot = agg.groupby("source")["n_docs"].transform("sum")
    import ray.data as _rd
    return _rd.from_arrow(pa.table({
        "source": pa.array(agg["source"]),
        "split": pa.array(agg["split"]),
        "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
        "fraction": pa.array(round_sql(
            agg["n_docs"].to_numpy(np.float64) / tot.to_numpy(np.float64)),
            pa.float64()),
    }))
