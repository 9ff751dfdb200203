"""The `ray job submit` entrypoint (graph_computing_go_ray.jobs):
run_job() drives pages -> build -> iterative algo against the session's
cluster, resumable, and returns the machine-readable metrics dict that
main() prints as the job's JSON log line."""

import os

from graph_computing_go_ray.jobs import make_parser, run_job
from graph_computing_go_ray.sources.pages_gen import generate_pages


def test_job_pagerank_and_resume(tmp_path):
    pages = generate_pages(os.path.join(str(tmp_path), "pages"),
                           n_pages=800, seed=7, n_files=4)
    args = make_parser().parse_args([
        "--pages", pages,
        "--out", os.path.join(str(tmp_path), "graph"),
        "--workdir", os.path.join(str(tmp_path), "graph", "pr"),
        "--algo", "pagerank", "--num-parts", "4", "--tol", "1e-8",
    ])
    m = run_job(args)
    assert m["converged"] is True
    assert m["result_rows"] == m["n_vertices"] > 0
    assert m["iterations"] > 1
    # resumability: a second run reuses the build marker AND the
    # converged checkpoint — no new iterations
    m2 = run_job(args)
    assert m2["iterations"] == m["iterations"]
    assert m2["result_rows"] == m["result_rows"]
    assert m2["value"] < m["value"]


def test_job_triangles(tmp_path):
    pages = generate_pages(os.path.join(str(tmp_path), "pages"),
                           n_pages=600, seed=9, n_files=2)
    args = make_parser().parse_args([
        "--pages", pages,
        "--out", os.path.join(str(tmp_path), "graph"),
        "--workdir", os.path.join(str(tmp_path), "graph", "tri"),
        "--algo", "triangles", "--num-parts", "4",
    ])
    m = run_job(args)
    assert m["algo"] == "triangles"
    assert m["result_rows"] == 1
