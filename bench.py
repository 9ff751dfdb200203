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


def run_scaling() -> dict:
    """Identical PageRank job at num_cpus=8 and 32 in fresh processes on the
    same deterministic input; efficiency = eps_32 / (4 * eps_8)."""
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
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--pagerank-scale" in sys.argv:
        print(json.dumps(run_pagerank_scale()))
    else:
        print(json.dumps(run_bench()))
