"""`ray job submit` entrypoint for the link-graph pipeline.

The north rule runs the pipeline "via ray job submit on fixed N-node and
4N-node clusters". This module is that driver script: it connects to the
cluster the job runtime provides (``ray.init(address="auto")`` under a
job; local mode when run standalone), then runs

    pages parquet -> stateful actor-pool extraction -> title resolution
    -> edge table -> CSR partitions -> {pagerank|cc|lpa|triangles}

against URI-capable dirs, resumable: the graph build is skipped when its
_SUCCESS marker exists, and the iterative stage resumes from the latest
persisted checkpoint in ``--workdir`` (state/checkpoint.py lineage).

Cluster usage:

    ray job submit --working-dir . -- \
        python -m graph_computing_go_ray.jobs \
        --pages s3://bucket/pages --out s3://bucket/graph \
        --workdir s3://bucket/graph/pagerank --algo pagerank \
        --num-parts 256 --tol 1e-6

One JSON line with the run metrics is printed on completion (the same
shape bench.py emits), so job logs are machine-readable.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Any


def run_job(args: argparse.Namespace) -> dict[str, Any]:
    """Body of the job, callable in-process (tests) or from main()."""
    import ray.data as rd

    from .pipelines.pages import build_link_graph

    t0 = time.time()
    paths = build_link_graph(
        args.pages, args.out, num_buckets=args.num_parts,
        extract_concurrency=(1, max(2, args.extract_workers)),
        extract_batch_size=args.extract_batch_size,
    )
    build_sec = time.time() - t0

    edges = rd.read_parquet(paths["edges"], columns=["src", "dst"])
    t0 = time.time()
    if args.algo == "pagerank":
        from .engine.pagerank import pagerank

        out, info = pagerank(edges, args.workdir, tol=args.tol,
                             max_iters=args.max_iters,
                             num_parts=args.num_parts, resume=True)
        result_rows = out.count()
    elif args.algo == "cc":
        from .engine.components import connected_components

        out, info = connected_components(edges, args.workdir,
                                         num_parts=args.num_parts)
        result_rows = out.count()
    elif args.algo == "lpa":
        from .engine.labelprop import label_propagation

        out, info = label_propagation(edges, args.workdir,
                                      max_iters=args.max_iters,
                                      num_parts=args.num_parts)
        result_rows = out.count()
    elif args.algo == "triangles":
        from .engine.triangles import triangle_count

        n_tri = triangle_count(edges)
        info = {"triangles": int(n_tri)}
        result_rows = 1
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(f"unknown algo {args.algo}")
    algo_sec = time.time() - t0

    metrics = {
        "metric": f"linkgraph_job_{args.algo}_sec",
        "value": round(build_sec + algo_sec, 3),
        "unit": "sec",
        "build_sec": round(build_sec, 3),
        "algo_sec": round(algo_sec, 3),
        "algo": args.algo,
        "result_rows": int(result_rows),
        "iterations": info.get("iterations"),
        "converged": info.get("converged"),
        "n_edges": info.get("n_edges"),
        "n_vertices": info.get("n_vertices"),
        "workdir": args.workdir,
    }
    return metrics


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--pages", required=True,
                   help="input pages parquet dir (local path or URI)")
    p.add_argument("--out", required=True,
                   help="graph build output dir (edges/vertices/extracted)")
    p.add_argument("--workdir", required=True,
                   help="iterative-state checkpoint root (URI-capable)")
    p.add_argument("--algo", default="pagerank",
                   choices=["pagerank", "cc", "lpa", "triangles"])
    p.add_argument("--num-parts", type=int, default=8,
                   help="graph partitions; scale with cluster size")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--max-iters", type=int, default=150)
    p.add_argument("--extract-workers", type=int, default=8)
    p.add_argument("--extract-batch-size", type=int, default=1024)
    p.add_argument("--address", default="auto",
                   help='"auto" under ray job submit; "local" standalone')
    return p


def main(argv: list[str] | None = None) -> None:
    import ray

    args = make_parser().parse_args(argv)
    if not ray.is_initialized():
        ray.init(address=args.address, include_dashboard=False)
    try:
        print(json.dumps(run_job(args)), flush=True)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
