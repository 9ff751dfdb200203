"""Strongly connected components by forward/backward min-label peeling.

Per round over the ACTIVE subgraph:
  1. fwmin(v) = min id over {v} ∪ ancestors(v)   — directed hash-min
     propagation to fixpoint (the CC HashMinProgram on unsymmetrized
     partitions; messages flow src→dst),
  2. bwmin(v) = the same on the REVERSED edges,
  3. every vertex with fwmin == bwmin == m is in SCC(m): m reaches v and v
     reaches m, and mutual reachability makes ancestor/descendant sets (and
     hence both labels) identical across the whole SCC — and m is the MIN id
     of that SCC (any smaller member would be an ancestor and lower fwmin),
  4. label-cut decomposition: every vertex of an SCC shares BOTH labels
     (identical ancestor/descendant sets within the subgraph), so an edge
     whose endpoints differ in fwmin OR bwmin can never be intra-SCC — cut
     it. Edges between identified vertices (fwmin == bwmin) are intra-SCC
     edges of components that just left — cut too. One pairwise label
     filter therefore both removes identified SCCs and splits the residual
     graph into independent (fwmin, bwmin) classes, the FW-BW coloring
     step, so remaining SCCs resolve in parallel and rounds drop to
     O(log #SCCs)-ish instead of one-SCC-per-round peeling.

Each round identifies at least SCC(min active id) — fwmin = bwmin = that id
by global minimality — and after the cut every label class recurses
independently; on web link graphs trims and the giant SCC go in the first
rounds (the FW-BW algorithm of Fleischer/Hendrickson/Pinar with min labels).
Vertices isolated by edge removal finish as singleton SCCs in one final
anti-join. Everything stays Dataset-shaped: per-round superstep fixpoints
checkpoint/resume like every other program; the identified sets move
through bucketed joins, never a driver-side id set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .components import HashMinProgram
from .superstep import (
    _load_graph_meta,
    build_graph_partitions,
    final_state,
    load_edge_blocks,
    run_supersteps,
)


def _minreach(edges: Dataset, workdir: str, num_parts: int, max_iters: int,
              resume: bool) -> Dataset:
    """(id, label) min-ancestor-or-self labels over DIRECTED edges."""
    info = _load_graph_meta(workdir)
    if info is None:
        info = build_graph_partitions(edges, workdir, num_parts, symmetrize=False)
    prog = HashMinProgram()
    edges_ds = load_edge_blocks(workdir, info["num_parts"])
    res = run_supersteps(edges_ds, workdir, prog, info, max_iters=max_iters,
                         resume=resume)
    if not res["converged"]:
        # truncated labels would silently merge/split SCCs downstream
        raise RuntimeError(
            f"min-reach did not converge in {max_iters} supersteps "
            f"({workdir}); raise max_iters for deep chain graphs"
        )
    return final_state(workdir).select_columns(["id", "label"])


def _fw_cut(edges: Dataset, fw: Dataset, num_buckets: int) -> Dataset:
    """Keep only edges whose endpoints share the same fwmin label. Every
    SCC lies entirely inside one fw class (members share ancestor sets), so
    cross-class edges are never intra-SCC. Running the BACKWARD pass on
    this cut graph makes bwmin class-local, which turns the identification
    rule bw(u)==fw(u) into 'u is in the SCC of its class minimum' — one
    SCC per fw class per round (Orzan-style coloring), instead of only the
    classes whose labels happened to coincide globally."""
    from .join import bucket_join, rename_cols, typed_seed

    e1 = bucket_join(
        edges, rename_cols(fw, {"id": "sid", "label": "fs"}),
        on="src", right_on="sid", how="inner", num_buckets=num_buckets,
    )
    e2 = bucket_join(
        e1, rename_cols(fw, {"id": "did", "label": "fd"}),
        on="dst", right_on="did", how="inner", num_buckets=num_buckets,
    )
    out = e2.map_batches(
        lambda t: t.filter(pc.equal(t["fs"], t["fd"])).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    return typed_seed(out, pa.schema([("src", pa.int64()), ("dst", pa.int64())]))


def _label_cut(edges: Dataset, labels: Dataset, num_buckets: int) -> Dataset:
    """FW-BW coloring cut: keep only edges whose endpoints agree on BOTH
    labels and whose (shared) labels differ — i.e. possibly-intra-SCC edges
    of not-yet-identified components. Two bucketed joins, no driver-side
    id set. `labels` is (id, label, blabel)."""
    from .join import bucket_join, rename_cols, typed_seed

    e1 = bucket_join(
        edges,
        rename_cols(labels, {"id": "sid", "label": "fs", "blabel": "bs"}),
        on="src", right_on="sid", how="inner", num_buckets=num_buckets,
    )
    e2 = bucket_join(
        e1,
        rename_cols(labels, {"id": "did", "label": "fd", "blabel": "bd"}),
        on="dst", right_on="did", how="inner", num_buckets=num_buckets,
    )

    def flt(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(t["fs"], t["fd"]), pc.equal(t["bs"], t["bd"])),
            pc.not_equal(t["fs"], t["bs"]),
        )
        return t.filter(keep).select(["src", "dst"])

    out = e2.map_batches(flt, batch_format="pyarrow")
    return typed_seed(out, pa.schema([("src", pa.int64()), ("dst", pa.int64())]))


def _trim(active: "Dataset", num_buckets: int, max_trim: int = 8) -> "Dataset":
    """Iteratively drop edges touching a vertex with in-degree 0 or
    out-degree 0 — such a vertex is a singleton SCC (no cycle through it),
    so removing it never splits a surviving SCC. On web link graphs the
    trim set is the majority of vertices (FW-BW 'Trim' step), making the
    expensive min-reach fixpoints run on a far smaller core. Trimmed
    vertices are recovered as singletons by the caller's final anti-join.
    Each iteration is two distinct-id scans + two bucketed semi-joins —
    no driver-side id sets."""
    from .degrees import distinct_pairs
    from .join import bucket_join, rename_cols, typed_seed

    eschema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    prev = active.count()
    if prev == 0:
        return active
    for _ in range(max_trim):
        srcs = distinct_pairs(
            active.map_batches(lambda t: pa.table({"id": t["src"]}),
                               batch_format="pyarrow"), ["id"])
        dsts = distinct_pairs(
            active.map_batches(lambda t: pa.table({"id": t["dst"]}),
                               batch_format="pyarrow"), ["id"])
        both = bucket_join(srcs, rename_cols(dsts, {"id": "did"}),
                           on="id", right_on="did", how="inner",
                           num_buckets=num_buckets)
        both = typed_seed(both, pa.schema([("id", pa.int64())]))
        kept = bucket_join(active, rename_cols(both, {"id": "kid"}),
                           on="src", right_on="kid", how="inner",
                           num_buckets=num_buckets)
        kept = typed_seed(
            kept.map_batches(lambda t: t.select(["src", "dst"]),
                             batch_format="pyarrow"), eschema)
        kept = bucket_join(kept, rename_cols(both, {"id": "kid"}),
                           on="dst", right_on="kid", how="inner",
                           num_buckets=num_buckets)
        kept = typed_seed(
            kept.map_batches(lambda t: t.select(["src", "dst"]),
                             batch_format="pyarrow"), eschema)
        active = kept.materialize()
        c = active.count()
        if c == prev or c == 0:
            break
        prev = c
    return active


def _local_scc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact SCCs of a SMALL edge frame in one task (iterative Tarjan,
    explicit stack); (id, scc_id = min member id). The standard hybrid
    finish: once distributed peeling has shrunk the active remainder below
    one block's worth of edges, more superstep fixpoints only pay fixed
    scheduling cost per round — solve the remainder in-memory instead."""
    adj: dict[int, list] = {}
    nodes: set = set()
    for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        adj.setdefault(int(s), []).append(int(d))
        nodes.add(int(s))
        nodes.add(int(d))
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    comp_of: dict = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            neigh = adj.get(v, [])
            for i in range(pi, len(neigh)):
                w = neigh[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    comp_of[w] = m

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    ids = sorted(comp_of)
    return pd.DataFrame({"id": np.array(ids, np.int64),
                         "scc_id": np.array([comp_of[i] for i in ids],
                                            np.int64)})


def strongly_connected_components(
    edges: Dataset, workdir: str, max_rounds: int = 30,
    num_parts: int = 8, max_iters: int = 100, resume: bool = True,
    trim_rounds: int = 0, local_cutoff: int = 100_000,
) -> tuple[Dataset, dict]:
    """(id, scc_id) for every vertex of the directed edge table;
    scc_id = min vertex id of the component.

    trim_rounds > 0 runs the _trim singleton peel before each of the first
    `trim_rounds` peeling rounds. Default OFF: measured at sf0.01 (1.7k
    vertices) the trim's ~4 shuffles/iteration cost more wall-time than the
    min-reach supersteps they avoid; at web scale (billions of vertices,
    most of them acyclic tendrils) trim shrinks the fixpoint input by
    orders of magnitude and should be enabled.

    local_cutoff: an active edge set of at most this many rows is finished
    by ONE exact in-task Tarjan (_local_scc) instead of (more) fixpoint
    rounds — including round 0, the same hybrid cutover as
    louvain_move_phase: at web scale the input never fits a block and the
    distributed peeling (giant SCC + coloring classes) runs; at block
    scale the per-round fixed costs measure nothing. The all-distributed
    path stays pinned by the local_cutoff=0 parity test
    (tests/test_graph_extras.py). 0 disables."""
    import ray.data as rd

    from .join import default_num_buckets, typed_seed

    nb = default_num_buckets()

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    def canon(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        return t.filter(keep).select(["src", "dst"])

    active = edges.map_batches(canon, batch_format="pyarrow").materialize()
    all_vertices = _vertex_ids(active).materialize()

    identified: list[Dataset] = []
    rounds = 0
    local_finish = False
    for r in range(max_rounds):
        if r < trim_rounds:
            active = _trim(active, nb)  # singleton peel before the fixpoints
        n_act = active.count()
        if n_act == 0:
            break
        if local_cutoff and n_act <= local_cutoff:
            # hybrid finish: the remainder fits one block — solve exactly
            # in-memory rather than paying more per-round fixed costs
            loc = _local_scc(active.to_pandas())
            identified.append(rd.from_arrow(
                pa.Table.from_pandas(loc, preserve_index=False).cast(
                    pa.schema([("id", pa.int64()), ("scc_id", pa.int64())])
                )
            ))
            rounds = r + 1
            local_finish = True
            break
        rounds = r + 1
        fw = _minreach(active, f"{workdir}/r{r}_fw", num_parts, max_iters,
                       resume).materialize()
        # coloring refinement: bw runs on the fw-CUT graph so its labels are
        # class-local — every fw class then yields its min-id SCC this round
        active = _fw_cut(active, fw, nb).materialize()
        if active.count() == 0:
            # every edge crossed fw classes: no intra-SCC edge remains, so
            # all still-unidentified vertices are singletons (final anti-join)
            break
        bw = _minreach(
            active.map_batches(rev, batch_format="pyarrow"),
            f"{workdir}/r{r}_bw", num_parts, max_iters, resume,
        )
        from .join import bucket_join, rename_cols

        labels = bucket_join(
            fw, rename_cols(bw, {"id": "bid", "label": "blabel"}),
            on="id", right_on="bid", how="inner", num_buckets=nb,
        ).materialize()
        ident = labels.map_batches(
            lambda t: (lambda f: pa.table({"id": f["id"], "scc_id": f["label"]}))(
                t.filter(pc.equal(t["label"], t["blabel"]))
            ),
            batch_format="pyarrow",
        )
        ident = typed_seed(
            ident, pa.schema([("id", pa.int64()), ("scc_id", pa.int64())])
        ).materialize()
        identified.append(ident)
        active = _label_cut(active, labels, nb).materialize()

    # vertices never identified became isolated mid-peel: singleton SCCs
    got = identified[0] if identified else None
    for d in identified[1:]:
        got = got.union(d)
    if got is not None:
        from .join import bucket_join, rename_cols

        flag = got.map_batches(
            lambda t: pa.table({"fid": t["id"],
                                "hit": pa.array(np.ones(t.num_rows, np.int8))}),
            batch_format="pyarrow",
        )
        lone = bucket_join(all_vertices, flag, on="id", right_on="fid",
                           how="left", num_buckets=nb)
        lone = lone.map_batches(
            lambda t: (lambda f: pa.table({"id": f["id"], "scc_id": f["id"]}))(
                t.filter(pc.is_null(t["hit"]))
            ),
            batch_format="pyarrow",
        )
        lone = typed_seed(
            lone, pa.schema([("id", pa.int64()), ("scc_id", pa.int64())])
        )
        out = got.union(lone)
    else:
        out = all_vertices.map_batches(
            lambda t: pa.table({"id": t["id"], "scc_id": t["id"]}),
            batch_format="pyarrow",
        )
    return out, {"rounds": rounds, "local_finish": local_finish}


def _vertex_ids(edges: Dataset) -> Dataset:
    """Distinct vertex ids of an edge table (block partial + groupby)."""
    def partial(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate(
            [t["src"].to_numpy(zero_copy_only=False),
             t["dst"].to_numpy(zero_copy_only=False)]
        ))
        return pa.table({"id": pa.array(ids, pa.int64())})

    from .degrees import distinct_pairs

    p = edges.map_batches(partial, batch_format="pyarrow")
    return distinct_pairs(p, ["id"])
