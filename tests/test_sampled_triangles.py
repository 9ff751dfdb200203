"""DOULION sampled triangle estimate: exact parity of the deterministic
subsample + sampled count vs a python replica, and accuracy vs the exact
triangle count."""

from __future__ import annotations

import numpy as np

from graph_computing_go_ray.functions.hashing import splitmix64

SF = "/root/testdata/sf0.001"


def _python_triangles(src, dst):
    """Exact triangle count on distinct undirected (u<v) pairs: for each
    edge, intersect the smaller-id-neighbor sets (compact-forward)."""
    nbrs: dict[int, set[int]] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    count = 0
    for a, b in zip(src.tolist(), dst.tolist()):
        na, nb = nbrs[a], nbrs[b]
        if len(na) > len(nb):
            na, nb = nb, na
        count += sum(1 for x in na if x > b and x in nb)
    return count


def test_triangles_sampled_parity_and_accuracy():
    from graph_computing_go_ray.pipelines.graphalgos import (
        cooccur_edge_ds,
        triangles_sampled,
    )

    p = 0.5
    df = cooccur_edge_ds(SF).to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    h = splitmix64(
        (src.astype(np.uint64) << np.uint64(32)) | dst.astype(np.uint64)
    )
    keep = h >= np.uint64(int((1.0 - p) * 2**64))
    want_kept = int(keep.sum())
    want_tri = _python_triangles(src[keep], dst[keep])
    exact = _python_triangles(src, dst)

    out = triangles_sampled(SF, p_keep=p).iloc[0]
    assert int(out["n_edges_kept"]) == want_kept
    assert int(out["n_triangles_sampled"]) == want_tri
    assert abs(float(out["est_triangles"]) - want_tri / p**3) < 1e-6
    # accuracy of the estimator vs the exact count (deterministic, so this
    # pins the measured relative error on this graph, not a flaky bound)
    rel = abs(float(out["est_triangles"]) - exact) / exact
    assert rel < 0.25, f"relative error {rel:.3f} vs exact {exact}"
