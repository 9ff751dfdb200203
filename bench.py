"""Benchmark harness (driver-run per round; see BASELINE.md §3).

Headline: the north-rule pipeline — deterministic synthetic web pages →
stateful extraction → resolution joins → edge table → PageRank supersteps
to convergence. Reports per-superstep edges/sec and end-to-end seconds.

Also times a representative subset of queries() over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline twice in fresh processes at num_cpus=8 and 32
on the SAME input and reports both throughputs + scaling efficiency
(sandbox substitute for the N vs 4N cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
NUM_PARTS = 32  # fixed across CPU levels so the work is identical

QUERY_SUBSET = [
    "in_degree", "pricing_summary", "link_entropy_per_vertex",
    "cooccur_edges", "triangle_count", "order_year_snapshot",
    # round-2 operators
    "events_hopping_window", "events_asof_orders", "unigram_logprob",
    # round-2 corpus layer
    "token_df", "tfidf_top_terms", "price_quantiles", "near_dup_clusters",
    "benchmark_contamination", "pmi_top_pairs",
    # round-2 link-graph metrics
    "chain_reciprocity", "collapse_nation_brand",
    # round-2 continuation (this session); ktruss_cooccur is excluded —
    # its sf0.1 peel is minutes-long by design (5+ triangle-count rounds)
    "jaccard_topk", "katz_bipartite", "segment_dedup", "doc_chunks",
    # round-3 operators
    "dup_span_fraction", "lang_confusion", "chars_percentile_filter",
    # round-3 late additions (wedge census, temporal slice, corpus audits)
    "butterfly_count", "graph_growth", "lexical_richness", "source_overlap",
    # round-3 continuation: star join, retention, PQ-ANN, fuzzy join
    "market_share", "cohort_retention", "pq_topk", "name_edit_pairs",
    # round-3 session 2: Q9 profit, session attribution, WL fingerprint
    "profit_by_nation_year", "attribution_revenue", "wl_colors_cooccur",
    # round-4: fused+hybrid Louvain (the r3 perf-weak item), SCC peeling,
    # Newman assortativity
    "louvain_chain_two_level", "scc_chain", "chain_degree_assortativity",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def headline(sf: float) -> dict:
    """Pages → extract → resolve → PageRank. Pages are cached (generation is
    not part of the engine); extract/resolve/pagerank run fresh and timed."""
    import shutil

    import ray.data as rd

    from graph_computing_go_ray.engine.pagerank import pagerank
    from graph_computing_go_ray.pipelines.pages import build_link_graph
    from graph_computing_go_ray.sources.pages_gen import generate_pages

    n_pages = max(2_000, int(sf * 2_000_000))
    pages_dir = f"/tmp/gcgr_bench/pages_{n_pages}"
    generate_pages(pages_dir, n_pages=n_pages, seed=42, n_files=32)

    graph_dir = f"/tmp/gcgr_bench/graph_{n_pages}_{NUM_CPUS}"
    shutil.rmtree(graph_dir, ignore_errors=True)
    t0 = time.time()
    paths = build_link_graph(
        pages_dir, graph_dir, num_buckets=NUM_PARTS,
        extract_concurrency=(1, max(2, NUM_CPUS - 2)), extract_batch_size=2048,
    )
    build_sec = time.time() - t0

    pr_dir = os.path.join(graph_dir, "pagerank")
    t0 = time.time()
    # tol 1e-6 converges in ~80-90 supersteps at d=0.85: the headline metric
    # is iterations-to-convergence wall-clock, so run to actual convergence
    ranks, info = pagerank(
        rd.read_parquet(paths["edges"], columns=["src", "dst"]),
        pr_dir, tol=1e-6, max_iters=150, num_parts=NUM_PARTS, resume=False,
    )
    pr_sec = time.time() - t0
    n_rank = ranks.count()
    eps = [t["edges_per_sec"] for t in info["timings"]]
    return {
        "build_sec": round(build_sec, 3),
        "pagerank_sec": round(pr_sec, 3),
        "iterations": info["iterations"],
        "converged": info["converged"],
        "n_edges": info["n_edges"],
        "n_vertices": info["n_vertices"],
        "n_ranked": n_rank,
        "superstep_sec_mean": round(sum(t["sec"] for t in info["timings"]) / max(1, len(eps)), 3),
        "edges_per_sec_per_superstep": round(sum(eps) / max(1, len(eps)), 1),
    }


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sf = _sf_of(SF_DIR)
    # warm the page cache with one untimed read
    import pyarrow.parquet as pq

    pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"))

    head = headline(sf)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    q_times: dict[str, float] = {}
    for name in QUERY_SUBSET:
        if name not in qs:
            continue
        t0 = time.time()
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        q_times[name] = round(time.time() - t0, 3)

    out = {
        "metric": "pages_to_pagerank_convergence_sec",
        "value": round(head["build_sec"] + head["pagerank_sec"], 3),
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        **head,
    }
    ray.shutdown()
    return out


SCALE_EDGES = int(os.environ.get("GCGR_SCALE_EDGES", "40000000"))
SCALE_VERTICES = int(os.environ.get("GCGR_SCALE_VERTICES", "4000000"))


def run_pagerank_scale() -> dict:
    """PageRank supersteps on a superstep-dominated synthetic edge table
    (BASELINE.md §3: the two-parallelism-level jobs must be identical and
    big enough that a superstep takes seconds — the html-pages path at sf0.1
    is overhead-bound and cannot evidence scaling)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import shutil

    import ray.data as rd

    from graph_computing_go_ray.engine.pagerank import pagerank
    from graph_computing_go_ray.sources.edges_gen import generate_edges

    edir = f"/tmp/gcgr_bench/edges_{SCALE_EDGES}_{SCALE_VERTICES}"
    generate_edges(edir, n_edges=SCALE_EDGES, n_vertices=SCALE_VERTICES)
    wd = f"/tmp/gcgr_bench/prscale_{SCALE_EDGES}_{NUM_CPUS}"
    shutil.rmtree(wd, ignore_errors=True)
    edges = rd.read_parquet(edir, columns=["src", "dst"])
    t0 = time.time()
    _, info = pagerank(edges, wd, tol=0.0, max_iters=8, num_parts=NUM_PARTS,
                       resume=False)
    total = time.time() - t0
    # skip the first superstep (cold object-store/page cache)
    eps = [t["edges_per_sec"] for t in info["timings"][1:]]
    out = {
        "n_edges": info["n_edges"], "n_vertices": info["n_vertices"],
        "iterations": info["iterations"], "total_sec": round(total, 3),
        "superstep_sec_mean": round(
            sum(t["sec"] for t in info["timings"][1:]) / max(1, len(eps)), 3),
        "edges_per_sec_per_superstep": round(sum(eps) / max(1, len(eps)), 1),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def hw_scaling_probe(reps: int = 6, size: int = 1000) -> dict:
    """Raw host compute-scaling probe (no Ray): throughput of 8 vs 32
    concurrent single-threaded numpy matmul processes. On an overcommitted
    hypervisor the 32-way throughput caps at the PHYSICAL cores actually
    available (measured 2026-08-18: ratio 2.41/4 = 0.60 — i.e. ~20 real
    cores behind 32 vCPUs with nonzero steal time), which bounds ANY
    job's 8→32 scaling efficiency. Recorded alongside the Ray number so a
    sub-0.8 efficiency can be attributed: compare scaling_efficiency
    against hw_efficiency_8_to_32, not against 1.0."""
    import multiprocessing as mp

    import numpy as np

    def burn(q):
        x = np.random.RandomState(0).rand(size, size)
        for _ in range(reps):
            x = x @ x
            x /= np.abs(x).max()
        q.put(1)

    through = {}
    for k in (8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(k)]
        t0 = time.time()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        through[k] = k * reps / (time.time() - t0)
    return {
        "hw_matmul_per_sec_8": round(through[8], 1),
        "hw_matmul_per_sec_32": round(through[32], 1),
        "hw_efficiency_8_to_32": round(through[32] / (4 * through[8]), 3),
    }


def run_scaling() -> dict:
    """Identical PageRank job at num_cpus=8 and 32 in fresh processes on the
    same deterministic input; efficiency = eps_32 / (4 * eps_8). The raw
    hardware probe (hw_scaling_probe) rides along: when the hypervisor
    exposes fewer physical cores than vCPUs, hw_efficiency_8_to_32 is the
    actual ceiling the Ray number should be read against."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py"),
             "--pagerank-scale"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    eps8 = results[8]["edges_per_sec_per_superstep"]
    eps32 = results[32]["edges_per_sec_per_superstep"]
    return {
        "metric": "pagerank_superstep_scaling_8_to_32",
        "n_edges": results[32]["n_edges"],
        "superstep_sec_8": results[8]["superstep_sec_mean"],
        "superstep_sec_32": results[32]["superstep_sec_mean"],
        "edges_per_sec_8": eps8, "edges_per_sec_32": eps32,
        "scaling_efficiency": round(eps32 / (4 * eps8), 3),
        **hw_scaling_probe(),
    }


CORPUS_DOCS = int(os.environ.get("GCGR_CORPUS_DOCS", "200000"))


def _gen_docs(out_dir: str, n_docs: int, seed: int = 7, n_files: int = 32) -> str:
    """Deterministic synthetic corpus at probe scale: zipf token draws over
    a 50k vocabulary, ~80 tokens/doc, 2% planted exact duplicates. Cached
    (one parquet dir with a marker); the generator is NOT timed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array([f"w{i}" for i in range(50_000)], dtype=object)
    per = n_docs // n_files
    for f in range(n_files):
        rng = np.random.RandomState(seed * 1000 + f)
        texts, ids = [], []
        for j in range(per):
            did = f * per + j
            if j >= per - per // 50 and texts:  # 2% exact dups of earlier docs
                texts.append(texts[rng.randint(0, len(texts) - 1)])
            else:
                k = 60 + int(rng.randint(0, 40))
                idx = (rng.zipf(1.3, size=k) - 1) % len(vocab)
                texts.append(" ".join(vocab[idx]))
            ids.append(did)
        n_chars = [len(t) for t in texts]
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([("en", "de", "fr", "es")[i % 4] for i in ids]),
            "source": pa.array([f"src{i % 20}" for i in ids]),
            "n_chars": pa.array(n_chars, pa.int64()),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{f:04d}.parquet"))
    # single-file view expected by read_table(sf_dir, "documents")
    full = pq.ParquetDataset(out_dir).read()
    pq.write_table(full, os.path.join(out_dir, "documents.parquet"))
    for f in range(n_files):
        os.remove(os.path.join(out_dir, f"part-{f:04d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("")
    return out_dir


def run_corpus_scale() -> dict:
    """Corpus-layer throughput probe at CORPUS_DOCS (default 200k, 40x the
    sf0.1 documents table): docs/sec for the dedup / vocabulary / sampling
    ops — the 100-TB evidence for the LLM-data layer (BASELINE.md §4a)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = _gen_docs(f"/tmp/gcgr_bench/docs_{CORPUS_DOCS}", CORPUS_DOCS)
    from graph_computing_go_ray.pipelines import corpus as C
    from graph_computing_go_ray.pipelines import dedup as D
    from graph_computing_go_ray.pipelines import textstats as TX

    ops = {
        "exact_dedup": lambda: D.exact_dedup_keep(sf_dir).count(),
        "hash_sample": lambda: C.hash_sample(sf_dir).count(),
        "token_df": lambda: C.token_df(sf_dir).count(),
        "repetition_scores": lambda: TX.repetition_scores(sf_dir).count(),
        "winnow_fingerprints": lambda: TX.winnow_fingerprints(sf_dir).count(),
        "training_mix": lambda: C.training_mix(sf_dir).count(),
        "source_stats": lambda: len(C.source_stats(sf_dir)),
        # round-2 continuation ops
        "segment_dedup": lambda: C.segment_dedup(sf_dir).count(),
        "quality_weighted_sample":
            lambda: C.quality_weighted_sample(sf_dir).count(),
        "bigram_lm_top": lambda: C.bigram_lm_top(sf_dir).count(),
        "distinct_ngram_ratio":
            lambda: TX.distinct_ngram_ratio(sf_dir).count(),
        "doc_chunks": lambda: TX.doc_chunks(sf_dir).count(),
        "zipf_slope": lambda: len(C.zipf_slope(sf_dir)),
    }
    times, rows = {}, {}
    for name, fn in ops.items():
        t0 = time.time()
        rows[name] = int(fn())
        times[name] = round(time.time() - t0, 3)
    out = {
        "metric": "corpus_ops_docs_per_sec",
        "n_docs": CORPUS_DOCS,
        "num_cpus": NUM_CPUS,
        "op_sec": times,
        "op_rows": rows,
        "docs_per_sec": {k: round(CORPUS_DOCS / v, 1) for k, v in times.items()},
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--pagerank-scale" in sys.argv:
        print(json.dumps(run_pagerank_scale()))
    elif "--corpus-scale" in sys.argv:
        print(json.dumps(run_corpus_scale()))
    else:
        print(json.dumps(run_bench()))
