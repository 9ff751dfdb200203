"""Exact-parity oracle for the synchronous Louvain move phase and the
distributed modularity kernel (engine/louvain.py).

The replica applies the IDENTICAL rule — same float64 gain expression,
same (max dq, then min community id) tie-break, same direction-alternation
and refractory guards, simultaneous application — so labels must match
exactly."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import ray.data as rd

from graph_computing_go_ray.engine.louvain import (
    louvain_move_phase,
    modularity,
)

SF = "/root/testdata/sf0.001"


def louvain_replica(src, dst, max_rounds=12):
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    ids, kcnt = np.unique(s, return_counts=True)
    k = {int(i): int(c) for i, c in zip(ids, kcnt)}
    comm = {int(i): int(i) for i in ids}
    m = float(len(src))
    adj = defaultdict(list)
    for a, b in zip(s.tolist(), d.tolist()):
        adj[a].append(b)
    zero_streak = 0
    last_moved: set[int] = set()
    for r in range(max_rounds):
        down = r % 2 == 0  # direction alternation guard
        tot = defaultdict(float)
        for i in comm:
            tot[comm[i]] += float(k[i])
        new_comm = {}
        moved: set[int] = set()
        for i in sorted(comm):
            ca = comm[i]
            k_ic = defaultdict(int)
            for j in adj[i]:
                k_ic[comm[j]] += 1
            k_ia = float(k_ic.get(ca, 0))
            ki = float(k[i])
            best_dq, best_c = -np.inf, None
            for c in sorted(k_ic):
                if c == ca:
                    continue
                if (c < ca) != down:
                    continue
                dq = (float(k_ic[c]) - k_ia) / m - ki * (
                    tot[c] - (tot[ca] - ki)
                ) / (2.0 * m * m)
                if dq > best_dq:  # strict: ties keep the smaller comm id
                    best_dq, best_c = dq, c
            new = ca
            if (i not in last_moved) and best_c is not None and best_dq > 1e-12:
                new = best_c
                moved.add(i)
            new_comm[i] = new
        comm = new_comm
        last_moved = moved
        zero_streak = zero_streak + 1 if not moved else 0
        if zero_streak >= 2:
            break
    return comm


def modularity_replica(src, dst, comm):
    m = len(src)
    intra = sum(int(comm[int(a)] == comm[int(b)]) for a, b in zip(src, dst))
    deg = defaultdict(int)
    for a, b in zip(src, dst):
        deg[int(a)] += 1
        deg[int(b)] += 1
    tot = defaultdict(float)
    for i, kk in deg.items():
        tot[comm[i]] += float(kk)
    q = intra / m - sum((t / (2.0 * m)) ** 2 for t in tot.values())
    return len(tot), m, round(q, 6)


def _edges_ds(src, dst):
    return rd.from_pandas(pd.DataFrame({
        "src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64),
    }))


def _two_cliques():
    src, dst = [], []
    for grp in (range(0, 5), range(10, 15)):
        g = list(grp)
        for x in range(len(g)):
            for y in range(x + 1, len(g)):
                src.append(g[x])
                dst.append(g[y])
    src.append(4)
    dst.append(10)
    return np.array(src, np.int64), np.array(dst, np.int64)


def test_louvain_two_cliques_parity_and_structure():
    src, dst = _two_cliques()
    labels, info = louvain_move_phase(_edges_ds(src, dst), max_rounds=12)
    got = labels.to_pandas().set_index("id")["comm"].to_dict()
    want = louvain_replica(src, dst, max_rounds=12)
    assert got == want
    # structure: each clique ends up in one community
    for grp in (range(0, 5), range(10, 15)):
        cs = {got[i] for i in grp}
        assert len(cs) == 1, f"clique {list(grp)} split: {cs}"
    # and the partition beats singletons on modularity
    q_louv = modularity(
        _edges_ds(src, dst),
        rd.from_pandas(pd.DataFrame({
            "id": list(got), "comm": [got[i] for i in got]})),
    ).iloc[0]
    nc, m, q_want = modularity_replica(src, dst, got)
    assert int(q_louv["n_communities"]) == nc
    assert int(q_louv["m_edges"]) == m
    assert abs(float(q_louv["modularity"]) - q_want) < 1e-9
    singles = {int(i): int(i) for i in np.unique(np.concatenate([src, dst]))}
    _, _, q_single = modularity_replica(src, dst, singles)
    assert float(q_louv["modularity"]) > q_single


def test_louvain_cooccur_parity_sf0001():
    from graph_computing_go_ray.pipelines.graphalgos import cooccur_edge_ds

    edges = cooccur_edge_ds(SF).materialize()
    df = edges.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    labels, info = louvain_move_phase(edges, max_rounds=12)
    got = labels.to_pandas().set_index("id")["comm"].to_dict()
    want = louvain_replica(src, dst, max_rounds=12)
    assert got == want
    assert info["m_edges"] == len(df)
    # the kernel's modularity of the result matches the replica's formula
    q = modularity(
        edges,
        rd.from_pandas(pd.DataFrame({
            "id": list(got), "comm": [got[i] for i in got]})),
    ).iloc[0]
    nc, m, q_want = modularity_replica(src, dst, got)
    assert (int(q["n_communities"]), int(q["m_edges"])) == (nc, m)
    assert abs(float(q["modularity"]) - q_want) < 1e-9


def move_phase_w_replica(edges, max_rounds=12):
    """Weighted replica: edges is {(u<=v): w} possibly with self-loops.
    Same rule set as louvain_move_phase (weighted gains, direction
    alternation, refractory, two-zero-round fixpoint)."""
    k = defaultdict(int)
    adj = defaultdict(list)  # non-self incident (j, w)
    m = 0
    ids = set()
    for (a, b), w in edges.items():
        m += w
        ids.add(a)
        ids.add(b)
        if a == b:
            k[a] += 2 * w
        else:
            k[a] += w
            k[b] += w
            adj[a].append((b, w))
            adj[b].append((a, w))
    comm = {i: i for i in ids}
    fm = float(m)
    zero_streak = 0
    last_moved: set[int] = set()
    for r in range(max_rounds):
        down = r % 2 == 0
        tot = defaultdict(float)
        for i in comm:
            tot[comm[i]] += float(k[i])
        new_comm = {}
        moved: set[int] = set()
        for i in sorted(comm):
            ca = comm[i]
            k_ic = defaultdict(int)
            for j, w in adj[i]:
                k_ic[comm[j]] += w
            k_ia = float(k_ic.get(ca, 0))
            ki = float(k[i])
            best_dq, best_c = -np.inf, None
            for c in sorted(k_ic):
                if c == ca or (c < ca) != down:
                    continue
                dq = (float(k_ic[c]) - k_ia) / fm - ki * (
                    tot[c] - (tot[ca] - ki)
                ) / (2.0 * fm * fm)
                if dq > best_dq:
                    best_dq, best_c = dq, c
            new = ca
            if (i not in last_moved) and best_c is not None and best_dq > 1e-12:
                new = best_c
                moved.add(i)
            new_comm[i] = new
        comm = new_comm
        last_moved = moved
        zero_streak = zero_streak + 1 if not moved else 0
        if zero_streak >= 2:
            break
    return comm


def louvain_multilevel_replica(src, dst, levels=2, max_rounds=12):
    edges = {(int(a), int(b)): 1 for a, b in zip(src, dst)}
    vert_map = None
    for _ in range(levels):
        comm = move_phase_w_replica(edges, max_rounds)
        if vert_map is None:
            vert_map = dict(comm)
        else:
            vert_map = {v: comm[c] for v, c in vert_map.items()}
        new_edges = defaultdict(int)
        for (a, b), w in edges.items():
            ca, cb = comm[a], comm[b]
            new_edges[(min(ca, cb), max(ca, cb))] += w
        edges = dict(new_edges)
    return vert_map


def _ring_of_cliques():
    src, dst = [], []
    for q in range(6):
        base = q * 10
        for x in range(6):
            for y in range(x + 1, 6):
                src.append(base + x)
                dst.append(base + y)
    for q in range(6):
        src.append(q * 10 + 5)
        dst.append(((q + 1) % 6) * 10)
    return np.array(src, np.int64), np.array(dst, np.int64)


def test_louvain_multilevel_parity_ring():
    from graph_computing_go_ray.engine.louvain import louvain

    src, dst = _ring_of_cliques()
    labels, info = louvain(_edges_ds(src, dst), levels=2, max_rounds=12)
    got = labels.to_pandas().set_index("id")["comm"].to_dict()
    want = louvain_multilevel_replica(src, dst, levels=2, max_rounds=12)
    assert got == want
    # each clique stays intact at the final level
    for q in range(6):
        cs = {got[q * 10 + x] for x in range(6)}
        assert len(cs) == 1
    # level-2 projected labels don't lose modularity vs level-1 on this
    # fixture (empirical pin — synchronous rounds carry no joint guarantee)
    lvl1 = move_phase_w_replica(
        {(int(a), int(b)): 1 for a, b in zip(src, dst)}, 12)
    _, _, q1 = modularity_replica(src, dst, lvl1)
    _, _, q2 = modularity_replica(src, dst, want)
    assert q2 >= q1


def test_louvain_multilevel_parity_chain_sf0001():
    from graph_computing_go_ray.engine.louvain import louvain
    from graph_computing_go_ray.pipelines.graphalgos import chain_und_ds

    edges = chain_und_ds(SF).materialize()
    df = edges.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    labels, info = louvain(edges, levels=2, max_rounds=12)
    got = labels.to_pandas().set_index("id")["comm"].to_dict()
    want = louvain_multilevel_replica(src, dst, levels=2, max_rounds=12)
    assert got == want


def test_louvain_local_vs_distributed_parity_sf0001():
    """The local-cutoff leg and the distributed per-round exchanges must
    produce byte-identical labels (both feed the same _decide_round
    frame) — guards the hybrid cutover against drift."""
    from graph_computing_go_ray.pipelines.graphalgos import chain_edge_ds

    import os

    edges = chain_edge_ds(SF, order_mod=16)
    lab_local, info_local = louvain_move_phase(edges, max_rounds=8)
    assert info_local.get("local") is True
    a = lab_local.to_pandas().sort_values("id", ignore_index=True)
    # both distributed neighbor-attach modes (shard-published default and
    # the bucket-join fallback) must match the local leg byte-identically
    for mode in ("shards", "join"):
        os.environ["GCGR_LOUVAIN_NBR"] = mode
        try:
            lab_dist, info_dist = louvain_move_phase(
                edges, max_rounds=8, local_cutoff=0)
        finally:
            os.environ.pop("GCGR_LOUVAIN_NBR", None)
        assert "local" not in info_dist
        b = lab_dist.to_pandas().sort_values("id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        assert info_local["moves_per_round"] == info_dist["moves_per_round"]
