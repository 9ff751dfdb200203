"""Exact-quantile kernel vs the numpy rank-ceil definition (including a
planted hot value that overloads one histogram bin), and near-dup
clustering vs a pure-python union-find over the exact jaccard pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from graph_computing_go_ray.engine.quantile import exact_quantiles
from graph_computing_go_ray.functions import text as T
from graph_computing_go_ray.pipelines import dedup as D

QS = [0.01, 0.1, 0.5, 0.9, 0.99]


def _numpy_quantiles(v: np.ndarray, qs):
    s = np.sort(v)
    n = len(s)
    return {q: float(s[max(1, int(np.ceil(q * n))) - 1]) for q in qs}


def test_exact_quantiles_matches_numpy():
    rng = np.random.RandomState(7)
    v = np.concatenate([
        rng.lognormal(3.0, 1.5, size=20_000),       # heavy tail
        np.full(5_000, 42.0),                        # hot value: one fat bin
        rng.uniform(-10, 0, size=1_000),             # negative range
    ])
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(13)
    got = exact_quantiles(ds, "x", QS, k_bins=64)  # small k: forces fat bins
    want = _numpy_quantiles(v, QS)
    for _, r in got.iterrows():
        assert r["value"] == want[r["q"]], (r["q"], r["value"], want[r["q"]])


def test_exact_quantiles_constant_column():
    ds = rd.from_arrow(pa.table({"x": np.full(100, 3.5)}))
    got = exact_quantiles(ds, "x", [0.5, 0.99])
    assert (got["value"] == 3.5).all()


def _cluster_corpus(tmpdir: str) -> str:
    """Chain A~B~C with A!~C plus isolated docs: transitive collapse."""
    rng = np.random.RandomState(11)
    vocab = [f"w{k}" for k in range(300)]
    rows = []
    for i in range(30):
        words = [vocab[k] for k in rng.randint(0, len(vocab), size=50)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # chain: 100 ~ 101 (small edit), 101 ~ 102 (small edit of 101)
    base = rows[0]["text"].split()
    for j, did in enumerate((100, 101, 102)):
        w = list(base)
        for k in range(0, 4 * j):  # drift grows along the chain
            w[3 * k % len(w)] = f"drift{j}_{k}"
        rows.append({"doc_id": did, "text": " ".join(w)})
    df = pd.DataFrame(rows)
    df["lang"] = "en"
    df["source"] = "synthetic"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmpdir}/documents.parquet")
    return tmpdir


def _oracle_clusters(df: pd.DataFrame, threshold: float):
    sets = {}
    for r in df.itertuples():
        ws = T.word_tokens(r.text)
        sets[r.doc_id] = {" ".join(ws[k:k + 3]) for k in range(len(ws) - 2)}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sets)
    paired = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                paired.update((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in paired}


def test_near_dup_clusters_union_find_parity(tmp_path):
    sf = _cluster_corpus(str(tmp_path))
    got = D.near_dup_clusters(sf, threshold=0.2).to_pandas()
    want = _oracle_clusters(pd.read_parquet(f"{sf}/documents.parquet"), 0.2)
    assert set(got["doc_id"]) == set(want)
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert got_map == want
    # chain must have collapsed into ONE cluster even if 100!~102
    assert want[102] == want[100]
    keep = got.set_index("doc_id")["keep"]
    assert keep[got_map[100]] and not keep[102]


def test_grouped_exact_quantiles_matches_duckdb_quantile_disc():
    """grouped_exact_quantiles must reproduce DuckDB quantile_disc per
    group: rank ceil(q*n_g), 1-based ascending — including skewed group
    sizes, hot duplicated values, and a constant-valued group."""
    import duckdb

    from graph_computing_go_ray.engine.quantile import grouped_exact_quantiles

    rng = np.random.default_rng(7)
    frames = []
    for g, n in [("a", 1), ("b", 2), ("c", 97), ("d", 1000), ("e", 9)]:
        v = rng.integers(-50_000, 50_000, size=n).astype(np.int64)
        if g == "d":
            v[: n // 2] = 1234  # fat duplicated value inside one bin
        if g == "e":
            v[:] = -7  # constant group: hi == lo
        frames.append(pd.DataFrame({"g": g, "v": v}))
    df = pd.concat(frames, ignore_index=True)

    qs = [1.0 / 3.0, 2.0 / 3.0, 0.5, 0.999]
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = grouped_exact_quantiles(ds, "g", "v", qs, k_bins=64)

    con = duckdb.connect()
    con.register("t", df)
    for q in qs:
        want = dict(con.execute(
            f"SELECT g, quantile_disc(v, {q!r}) FROM t GROUP BY g"
        ).fetchall())
        sub = got[got["q"] == q].set_index("group")["value"]
        for g in want:
            assert sub.loc[g] == want[g], (q, g, sub.loc[g], want[g])


def test_round_sql_half_away_parity():
    import duckdb

    from graph_computing_go_ray.pipelines.textstats import round_sql

    vals = np.array([2.5e-6, -2.5e-6, 1.0000005, -1.0000005, 0.1234565,
                     7.0000015, -4.8431805, 0.0, 3.14159265358979])
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            f"select round(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        assert round_sql(np.array([v]))[0] == want, v


# ---------------------------------------------------------------- embeddings
SF = "/root/testdata/sf0.001"


def _emb_matrix():
    t = pq.read_table(SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def test_mmr_topk_numpy_parity():
    from graph_computing_go_ray.pipelines.similarity import mmr_topk

    got = mmr_topk(SF, n_candidates=50, k=8, lam=0.7)

    ids, m = _emb_matrix()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = mn[ids == 0][0]
    sims = mn @ q
    order = np.lexsort((ids, -sims))[:50]
    cid, csim, cm = ids[order], sims[order], mn[order]
    sel, chosen = [], np.zeros(len(cid), bool)
    want_scores = []
    for _ in range(8):
        red = (cm @ cm[sel].T).max(axis=1) if sel else np.zeros(len(cid))
        mmr = 0.7 * csim - 0.3 * red
        mmr[chosen] = -np.inf
        b = np.lexsort((cid, -mmr))[0]
        sel.append(int(b)); chosen[b] = True
        want_scores.append(mmr[b])
    assert list(got["vec_id"]) == [int(cid[i]) for i in sel]
    assert np.allclose(got["mmr_score"], np.round(want_scores, 6), atol=1e-9)


def test_kcenter_coreset_numpy_parity():
    from graph_computing_go_ray.pipelines.similarity import kcenter_coreset

    got = kcenter_coreset(SF, k=6)

    ids, m = _emb_matrix()
    sel = [int(np.argmin(ids))]
    radii = [0.0]
    for _ in range(5):
        d = np.sqrt(np.maximum(
            ((m[:, None, :] - m[sel][None, :, :]) ** 2).sum(axis=2), 0
        )).min(axis=1)
        j = np.lexsort((ids, -d))[0]
        sel.append(int(j)); radii.append(float(d[j]))
    assert list(got["vec_id"]) == [int(ids[i]) for i in sel]
    assert np.allclose(got["radius"], np.round(radii, 6), atol=1e-9)


def test_silhouette_kmeans_replica_parity():
    from graph_computing_go_ray.pipelines.similarity import (
        _kmeans_fit, silhouette_kmeans)
    from graph_computing_go_ray.sources.readers import read_table

    got = silhouette_kmeans(SF, n_clusters=5, n_iters=4, seed=13)

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    cent = _kmeans_fit(emb, 5, 4, 13, 65536)
    _, m = _emb_matrix()
    d = np.sqrt(np.maximum(
        (m * m).sum(axis=1, keepdims=True) - 2.0 * (m @ cent.T)
        + (cent * cent).sum(axis=1)[None, :], 0))
    a_idx = d.argmin(axis=1)
    a = d[np.arange(len(m)), a_idx]
    d[np.arange(len(m)), a_idx] = np.inf
    b = d.min(axis=1)
    s = (b - a) / np.maximum(np.maximum(a, b), 1e-300)
    for _, r in got.iterrows():
        mask = a_idx == r["cluster"]
        assert int(r["n"]) == int(mask.sum())
        assert abs(r["mean_silhouette"] - round(float(s[mask].mean()), 6)) < 1e-9
    # well-formed: every vector assigned, silhouette in [-1, 1]
    assert got["n"].sum() == len(m)
    assert (got["mean_silhouette"].abs() <= 1.0).all()
