"""Deduplication suite over the documents table — exact, n-gram Jaccard,
MinHash+LSH, SimHash (training-data pipeline ops).

Scale notes: every variant is shuffle-shaped, not driver-shaped —
shingle/signature generation is a vectorized map_batches, candidate
generation is a groupby on (band, hash) or gram, and pair verification is a
second groupby. Nothing materializes all-pairs; candidates only."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..engine.join import add_bucket, bucket_grouped_count, bucket_join, rename
from ..engine.degrees import distinct_pairs
from ..functions import text as T
from ..functions.hashing import hash_strings, minhash_params
from ..functions.pairs import allpairs_by_group
from ..sources.readers import read_table

ROUND = 6
NGRAM = 3
_MERSENNE = np.uint64((1 << 61) - 1)


# ------------------------------------------------------------------ exact
def exact_dedup_keep(sf_dir: str) -> Dataset:
    """(doc_id) kept per distinct text = min doc_id (D1 with deterministic
    keep-first rule). Hash-partition + per-group min — no text shuffle, only
    (hash, doc_id) rows move."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        return pa.table(
            {"text_hash": pa.array(hash_strings(t["text"].to_pylist())),
             "doc_id": t["doc_id"]}
        )

    hashed = docs.map_batches(h, batch_format="pyarrow")
    kept = hashed.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return kept.select_columns(["doc_id"])


# ------------------------------------------------------------------ n-gram sets
def _gram_rows(t: pa.Table, n: int = NGRAM) -> pa.Table:
    """(doc_id, gram_hash) distinct word-n-gram shingles per doc."""
    ids, grams = [], []
    for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = T.word_tokens(txt)
        gs = {" ".join(ws[k : k + n]) for k in range(len(ws) - n + 1)}
        ids.extend([i] * len(gs))
        grams.extend(gs)
    gh = hash_strings(np.array(grams, dtype=object)) if grams else np.array([], np.int64)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "gram": pa.array(gh, pa.int64())}
    )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.2) -> Dataset:
    """(doc_a, doc_b, jaccard) pairs over distinct 3-gram shingle sets with
    J >= threshold; pairs sharing no gram never materialize."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    grams = docs.map_batches(_gram_rows, batch_format="pyarrow").materialize()
    sizes = bucket_grouped_count(grams, ["doc_id"], "n")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["gram", "doc_id"])
        a, b = allpairs_by_group(df["gram"].to_numpy(), df["doc_id"].to_numpy())
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = add_bucket(grams, "gram", 8).groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    ).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        ),
        batch_format="pandas",
    )
    inter = bucket_grouped_count(cand, ["doc_a", "doc_b"], "i")
    j1 = bucket_join(inter, rename(sizes, {"doc_id": "ad", "n": "na"}),
                     on="doc_a", right_on="ad", how="inner")
    j2 = bucket_join(j1, rename(sizes, {"doc_id": "bd", "n": "nb"}),
                     on="doc_b", right_on="bd", how="inner")

    def finish(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = i / (na + nb - i)
        keep = jac >= threshold
        return pa.table(
            {"doc_a": t["doc_a"].to_numpy(zero_copy_only=False)[keep],
             "doc_b": t["doc_b"].to_numpy(zero_copy_only=False)[keep],
             "jaccard": pa.array(np.round(jac[keep], ROUND), pa.float64())}
        )

    return j2.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------------ MinHash + LSH
def minhash_signatures(
    docs: Dataset, num_perm: int = 128, n: int = NGRAM
) -> Dataset:
    """(doc_id, sig: fixed list<uint64>) — (a*x+b) mod 2^61-1 permutations
    over shingle hashes; vectorized per batch."""
    a, b = minhash_params(num_perm)

    def fn(t: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = T.word_tokens(txt)
            gs = list({" ".join(ws[k : k + n]) for k in range(len(ws) - n + 1)})
            if not gs:
                sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
            else:
                x = hash_strings(np.array(gs, dtype=object)).view(np.uint64)
                # (num_perm, n_grams) via broadcasting, min over grams
                vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
                sig = vals.min(axis=1)
            ids.append(i)
            sigs.append(sig.astype(np.int64))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "sig": pa.array([s.tolist() for s in sigs],
                             pa.list_(pa.int64(), num_perm))}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs(
    sf_dir: str, num_perm: int = 128, bands: int = 32, threshold: float = 0.2
) -> Dataset:
    """(doc_a, doc_b, est_jaccard) candidate pairs from LSH banding,
    verified by full-signature agreement >= threshold.

    shingle→minhash→band→bucket groupby (the scale path for near-dup at
    100 TB); estimated Jaccard = fraction of equal minhashes."""
    rows_per_band = num_perm // bands
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = minhash_signatures(docs, num_perm).materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.array(t["sig"].to_pylist(), dtype=np.int64)
        out_id, out_band, out_h = [], [], []
        for b_i in range(bands):
            chunk = sig[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
            h = np.zeros(len(ids), dtype=np.uint64)
            for c in range(chunk.shape[1]):
                h = h * np.uint64(1099511628211) + chunk[:, c].view(np.uint64)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b_i, dtype=np.int64))
            out_h.append(h.view(np.int64))
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out_id), pa.int64()),
             "band": pa.array(np.concatenate(out_band), pa.int64()),
             "bh": pa.array(np.concatenate(out_h), pa.int64())}
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["band", "bh", "doc_id"]).copy()
        key = df["band"].to_numpy() * np.int64(1 << 32) ^ df["bh"].to_numpy()
        a, b = allpairs_by_group(key, df["doc_id"].to_numpy())
        return pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates()

    cand = add_bucket(banded, "bh", 8).groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    ).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        ),
        batch_format="pandas",
    )
    cand = distinct_pairs(cand, ["doc_a", "doc_b"])

    # verify: estimated jaccard from full signatures (broadcast signature map
    # — at 100 TB this verify joins signatures by doc instead)
    import ray

    sig_pd = sigs.to_pandas()
    sig_map = {int(r.doc_id): np.array(r.sig, dtype=np.int64)
               for r in sig_pd.itertuples()}
    ref = ray.put(sig_map)

    def verify(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        est = np.array(
            [float((m[x] == m[y]).mean()) for x, y in zip(a, b)]
        )
        keep = est >= threshold
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep]),
             "est_jaccard": pa.array(np.round(est[keep], ROUND))}
        )

    return cand.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------------ SimHash
def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over word-token features (deterministic)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, txt in enumerate(texts):
        ws = T.word_tokens(txt)
        if not ws:
            continue
        hs = hash_strings(np.array(ws, dtype=object)).view(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((score > 0)[::-1]).view(np.uint64).byteswap()[0]
    return out.view(np.int64)


def simhash_pairs(sf_dir: str, max_hamming: int = 12) -> Dataset:
    """(doc_a, doc_b, hamming) pairs within max_hamming bits, candidates via
    4×16-bit band collision (catches all pairs with hamming <= 3 exactly;
    wider radius is best-effort — documented LSH property)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_fn(t: pa.Table) -> pa.Table:
        s = simhash64(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "sh": pa.array(s, pa.int64())})

    sigs = docs.map_batches(sig_fn, batch_format="pyarrow").materialize()

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = t["sh"].to_numpy(zero_copy_only=False).view(np.uint64)
        out = {"doc_id": [], "band": [], "bh": []}
        for b_i in range(4):
            chunk = ((sh >> np.uint64(16 * b_i)) & np.uint64(0xFFFF)).view(np.int64)
            out["doc_id"].append(ids)
            out["band"].append(np.full(len(ids), b_i, dtype=np.int64))
            out["bh"].append(chunk)
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["band", "bh", "doc_id"]).copy()
        key = df["band"].to_numpy() * np.int64(1 << 32) ^ df["bh"].to_numpy()
        a, b = allpairs_by_group(key, df["doc_id"].to_numpy())
        return pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates()

    cand = add_bucket(banded, "bh", 8).groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    ).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        ),
        batch_format="pandas",
    )
    cand = distinct_pairs(cand, ["doc_a", "doc_b"])

    import ray

    sh_map = dict(zip(
        sigs.to_pandas()["doc_id"].to_numpy(),
        sigs.to_pandas()["sh"].to_numpy().view(np.uint64),
    ))
    ref = ray.put(sh_map)

    def verify(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        ham = np.array(
            [bin(int(m[x]) ^ int(m[y])).count("1") for x, y in zip(a, b)],
            dtype=np.int64,
        )
        keep = ham <= max_hamming
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep]),
             "hamming": pa.array(ham[keep])}
        )

    return cand.map_batches(verify, batch_format="pyarrow")
