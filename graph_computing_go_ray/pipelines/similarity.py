"""Similarity search over the embeddings table: brute-force cosine top-k
(baseline) and an LSH-bucketed variant (the scale path), plus
threshold-pair search and embedding near-dup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.pairs import allpairs_by_group
from ..sources.readers import read_table

ROUND = 6


def _embedding_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5) -> Dataset:
    """Brute-force cosine top-k per query vector (vec_id < n_queries),
    self excluded; tie-break smaller vec_id.

    Query matrix is normalized once on the driver and broadcast (ray.put);
    each batch of candidates does one matmul — the baseline the IVF/LSH
    variant is measured against."""
    ids, m = _embedding_matrix(sf_dir)
    q_mask = ids < n_queries
    q_ids = ids[q_mask]
    qm = m[q_mask]
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ref = ray.put((q_ids, qm))

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        q_ids_, qm_ = ray.get(ref)
        cids = t["vec_id"].to_numpy(zero_copy_only=False)
        cm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        sims = cm @ qm_.T  # (n_cand, n_query)
        n_c, n_q = sims.shape
        out_q = np.repeat(q_ids_, n_c)
        out_c = np.tile(cids, n_q)
        out_s = sims.T.ravel()
        keep = out_q != out_c
        # per-batch top-k partial: keep k best per query per batch
        df = pd.DataFrame(
            {"query_id": out_q[keep], "vec_id": out_c[keep],
             "sim": np.round(out_s[keep], ROUND)}
        )
        df = df.sort_values(["query_id", "sim", "vec_id"],
                            ascending=[True, False, True])
        df = df.groupby("query_id", as_index=False).head(50)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = emb.map_batches(score, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True])
        return g.head(k)

    out = partials.groupby("query_id").map_groups(final, batch_format="pandas")
    return out.map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                       ("sim", pa.float64())])
        ),
        batch_format="pandas",
    )


def cosine_pairs(sf_dir: str, threshold: float = 0.35) -> Dataset:
    """(vec_a, vec_b, sim) all pairs with cosine >= threshold — brute-force
    per-batch matmul against the broadcast (normalized) full matrix.

    At 100 TB this becomes the LSH-bucketed variant below; brute force is
    the correctness baseline."""
    ids, m = _embedding_matrix(sf_dir)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, mn))

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        cids = t["vec_id"].to_numpy(zero_copy_only=False)
        cm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        sims = cm @ all_m.T
        rows_a, rows_b, rows_s = [], [], []
        for r in range(len(cids)):
            mask = (sims[r] >= threshold) & (all_ids > cids[r])  # a<b once
            rows_a.append(np.full(mask.sum(), cids[r], dtype=np.int64))
            rows_b.append(all_ids[mask])
            rows_s.append(sims[r][mask])
        a = np.concatenate(rows_a) if rows_a else np.array([], np.int64)
        return pa.table(
            {"vec_a": pa.array(a, pa.int64()),
             "vec_b": pa.array(np.concatenate(rows_b) if rows_b else [], pa.int64()),
             "sim": pa.array(np.round(np.concatenate(rows_s) if rows_s else [], ROUND),
                             pa.float64())}
        )

    return emb.map_batches(fn, batch_format="pyarrow")


def ivf_topk(
    sf_dir: str, n_queries: int = 10, k: int = 5, n_cells: int = 16,
    n_probe: int = 4, seed: int = 13,
) -> Dataset:
    """IVF-style ANN: coarse quantizer (deterministic k-means-lite on a
    seeded sample) assigns vectors to cells; each query probes its n_probe
    nearest cells. The scale path next to brute-force ann_topk — recall vs
    the exact baseline is asserted in tests/test_textops.py."""
    ids, m = _embedding_matrix(sf_dir)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    # k-means-lite: seeded init + 5 Lloyd iterations on the (small) sample
    cent = mn[rng.choice(len(mn), size=min(n_cells, len(mn)), replace=False)].copy()
    for _ in range(5):
        assign = (mn @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = mn[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    q_mask = ids < n_queries
    q_ids, qm = ids[q_mask], mn[q_mask]
    ref = ray.put((ids, mn, cent, q_ids, qm))

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def cell_rows(t: pa.Table) -> pa.Table:
        _, _, cent_, _, _ = ray.get(ref)
        cids = t["vec_id"].to_numpy(zero_copy_only=False)
        cm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        cell = (cm @ cent_.T).argmax(axis=1)
        return pa.table(
            {"vec_id": pa.array(cids, pa.int64()),
             "cell": pa.array(cell.astype(np.int64))}
        )

    cells = emb.map_batches(cell_rows, batch_format="pyarrow")

    # query → probed cells (broadcast, driver-side tiny)
    probe = {}
    for qi, qv in zip(q_ids, qm):
        order = np.argsort(-(cent @ qv))[:n_probe]
        for c in order:
            probe.setdefault(int(c), []).append(int(qi))
    probe_ref = ray.put(probe)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_m, _, q_ids_, qm_ = ray.get(ref)
        pr = ray.get(probe_ref)
        cell = int(g["cell"].iloc[0])
        queries = pr.get(cell, [])
        if not queries:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "vec_id": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        pos = {int(v): i for i, v in enumerate(all_ids)}
        cand_ids = g["vec_id"].to_numpy()
        cm = all_m[[pos[int(v)] for v in cand_ids]]
        qpos = {int(v): i for i, v in enumerate(q_ids_)}
        rows = []
        for q in queries:
            sims = cm @ qm_[qpos[q]]
            for v, s_ in zip(cand_ids, sims):
                if v != q:
                    rows.append((q, int(v), round(float(s_), ROUND)))
        return pd.DataFrame(rows, columns=["query_id", "vec_id", "sim"])

    scored = cells.groupby("cell").map_groups(score, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True])
        return g.head(k)

    out = scored.groupby("query_id").map_groups(final, batch_format="pandas")
    return out.map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                       ("sim", pa.float64())])
        ),
        batch_format="pandas",
    )


def lsh_cosine_pairs(
    sf_dir: str, threshold: float = 0.35, n_planes: int = 3, n_tables: int = 10,
    seed: int = 11,
) -> Dataset:
    # few planes / many tables: collision prob per table for cosine s is
    # (1 - arccos(s)/pi)^n_planes; at s≈0.35 that's ~0.22 with 3 planes,
    # so 10 tables give ~0.92 recall. More planes would starve recall at
    # the modest thresholds these random embeddings support.
    """Random-hyperplane LSH candidates → exact cosine verify — the
    scale path for embedding near-dup (recall measured in tests vs the
    brute-force baseline)."""
    ids, m = _embedding_matrix(sf_dir)
    dim = m.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, mn, planes))

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucket_rows(t: pa.Table) -> pa.Table:
        _, _, pl = ray.get(ref)
        cids = t["vec_id"].to_numpy(zero_copy_only=False)
        cm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        out_id, out_tb, out_bh = [], [], []
        for tb in range(pl.shape[0]):
            bits = (cm @ pl[tb].T) > 0  # (n, n_planes)
            key = np.zeros(len(cids), dtype=np.int64)
            for c in range(bits.shape[1]):
                key = key * 2 + bits[:, c]
            out_id.append(cids)
            out_tb.append(np.full(len(cids), tb, dtype=np.int64))
            out_bh.append(key)
        return pa.table(
            {"vec_id": pa.array(np.concatenate(out_id), pa.int64()),
             "tb": pa.array(np.concatenate(out_tb), pa.int64()),
             "bh": pa.array(np.concatenate(out_bh), pa.int64())}
        )

    banded = emb.map_batches(bucket_rows, batch_format="pyarrow")

    from ..engine.join import add_bucket

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["tb", "bh", "vec_id"])
        key = df["tb"].to_numpy() * np.int64(1 << 40) ^ df["bh"].to_numpy()
        a, b = allpairs_by_group(key, df["vec_id"].to_numpy())
        return pd.DataFrame({"vec_a": a, "vec_b": b}).drop_duplicates()

    cand = add_bucket(banded, "bh", 8).groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    ).map_batches(
        lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
        ),
        batch_format="pandas",
    )
    from ..engine.degrees import distinct_pairs

    cand = distinct_pairs(cand, ["vec_a", "vec_b"])

    def verify(t: pa.Table) -> pa.Table:
        all_ids, all_m, _ = ray.get(ref)
        pos = {int(v): i for i, v in enumerate(all_ids)}
        a = t["vec_a"].to_numpy(zero_copy_only=False)
        b = t["vec_b"].to_numpy(zero_copy_only=False)
        sims = np.array(
            [float(all_m[pos[x]] @ all_m[pos[y]]) for x, y in zip(a, b)]
        )
        keep = sims >= threshold
        return pa.table(
            {"vec_a": pa.array(a[keep]), "vec_b": pa.array(b[keep]),
             "sim": pa.array(np.round(sims[keep], ROUND))}
        )

    return cand.map_batches(verify, batch_format="pyarrow")
