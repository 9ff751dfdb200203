"""Community detection beyond label propagation: a distributed modularity
kernel and a synchronous Louvain local-move phase.

The reference has no modularity-based community detection (its grouping is
LPA-style labels, see SURVEY §2.10); this extends the iterative set with
the modularity family every link-graph stack ships. Both pieces are pure
per-round Ray-Data dataflow — no driver-side vertex- or community-sized
state, unlike the superstep programs whose metrics stay scalar:

  modularity(edges, labels):
      Q = (sum_c intra_c)/m  -  sum_c (tot_c / 2m)^2
      * intra term: one label-attach join on each endpoint + a filtered
        count (a scalar aggregate — per-community intra counts are never
        collected anywhere);
      * degree term: degree table -> label attach -> community groupby ->
        per-batch sum of (tot/2m)^2 (community-sized dataset, scalar out).

  louvain_move_phase(edges): synchronous local moves with the standard
      Blondel-et-al gain for relocating vertex i from community a to b
          dQ = (k_ib - k_ia)/m - k_i * (tot_b - (tot_a - k_i)) / (2m^2)
      evaluated over NEIGHBOR communities only. Every round is
          tot    = labels groupby(comm) sum(k)         (community-sized)
          nbr    = sym-edges + neighbor community      (adaptive join)
          cand   = per-(i, comm) edge counts k_ic      (bucketed groupby)
          cand  += tot_c, self state (comm_a, k_i, tot_a)   (adaptive joins)
          moves  = per-i argmax dQ > 0                 (one bucket kernel)
      and the driver reads only the scalar moved-count per round.
      Synchronous simultaneous moves can two-swap oscillate (the same
      failure mode as synchronous LPA), so two deterministic guards from
      the parallel-Louvain literature (cf. Grappolo's minimum-labeling /
      swap-prevention heuristics) apply: (1) DIRECTION ALTERNATION — even
      rounds only allow moves to a SMALLER community id, odd rounds to a
      LARGER one, and (2) REFRACTORY — a vertex that moved in round r-1
      sits out round r. Measured head-to-head on two-clique / ring-of-
      cliques / G(n,m) / planted-partition fixtures, this combination
      converges everywhere the parity-gate and refractory-only variants
      oscillate or fragment (parity-gate: Q=0.10 vs 0.45 on two cliques;
      refractory-only: mass two-cycles on G(n,m)). Ties break to max dQ
      then the SMALLER community id — fully deterministic, replicated
      exactly by the pytest oracle (tests/test_louvain.py). The fixpoint
      test is TWO consecutive zero-move rounds (one per direction).

Scale notes: the community-total table is (#communities)-sized and flows
through the same bucketed groupby/join machinery as everything else (it
is never ray.put as a dict); at round 0 it is vertex-sized, which is
inherent to Louvain's singleton start. Per-round plans are cut by a
materialize() on the (id, comm, k) label table so lineage does not grow
across rounds (vertex-sized, spillable — never collected to the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .join import (
    adaptive_map_join,
    bucket_grouped,
    bucket_grouped_sum,
    default_num_buckets,
    rename_cols,
)


def _with_weight(edges_uv: Dataset) -> Dataset:
    """Ensure an int64 ``w`` weight column (1 per edge when absent)."""
    schema = edges_uv.schema()
    names = list(schema.names) if schema is not None else []
    if "w" in names:
        return edges_uv.select_columns(["src", "dst", "w"])

    def add_w(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "w": pa.array(np.ones(t.num_rows, np.int64)),
        })

    return edges_uv.select_columns(["src", "dst"]).map_batches(
        add_w, batch_format="pyarrow"
    )


def _symmetrize(edges_uvw: Dataset) -> Dataset:
    """Both directions of a DISTINCT undirected weighted (src, dst, w)
    table. Self-loops (contracted intra-community weight) are emitted
    twice like every other edge, so the weighted-degree sum over ``sym``
    automatically gives them the conventional 2w degree contribution."""

    def both(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": np.concatenate([src, dst]),
            "dst": np.concatenate([dst, src]),
            "w": np.concatenate([w, w]),
        })

    return edges_uvw.map_batches(both, batch_format="pyarrow")


def _degrees(sym: Dataset, num_buckets: int) -> Dataset:
    """(id, k) weighted degree from the symmetrized edge table."""
    deg = bucket_grouped_sum(
        sym.select_columns(["src", "w"]), ["src"], ["w"],
        num_buckets=num_buckets,
    )
    return rename_cols(deg, {"src": "id", "w": "k"})


def modularity(
    edges_uv: Dataset,
    labels: Dataset,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Newman modularity of a labeling over a distinct undirected
    (src, dst) edge table. ``labels`` is (id, comm) covering every
    endpoint. Returns one row (n_communities, m_edges, modularity)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    labels = labels.select_columns(["id", "comm"]).materialize()
    m = edges_uv.count()
    if m == 0:
        return pd.DataFrame(
            [{"n_communities": 0, "m_edges": 0, "modularity": 0.0}]
        )
    two_m = 2.0 * m

    # intra-edge total: attach both endpoint communities, count equals.
    e1 = adaptive_map_join(
        edges_uv.select_columns(["src", "dst"]), labels,
        on="src", key_col="id", val_cols=["comm"],
        num_buckets=num_buckets,
    )
    e1 = rename_cols(e1, {"comm": "comm_u"})
    e2 = adaptive_map_join(
        e1, labels, on="dst", key_col="id", val_cols=["comm"],
        num_buckets=num_buckets,
    )

    def intra_partial(t: pa.Table) -> pa.Table:
        cu = t["comm_u"].to_numpy(zero_copy_only=False)
        cv = t["comm"].to_numpy(zero_copy_only=False)
        return pa.table({"intra": pa.array([int((cu == cv).sum())], pa.int64())})

    intra = e2.map_batches(intra_partial, batch_format="pyarrow").sum("intra")

    # degree term: tot_c = sum of degrees per community.
    sym = _symmetrize(_with_weight(edges_uv))
    deg = _degrees(sym, num_buckets)
    degc = adaptive_map_join(
        deg, labels, on="id", key_col="id", val_cols=["comm"],
        num_buckets=num_buckets,
    )
    tot = bucket_grouped_sum(
        degc.select_columns(["comm", "k"]), ["comm"], ["k"],
        num_buckets=num_buckets,
    )

    def sq_partial(t: pa.Table) -> pa.Table:
        tk = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "sq": pa.array([float(((tk / two_m) ** 2).sum())]),
            "nc": pa.array([t.num_rows], pa.int64()),
        })

    parts = tot.map_batches(sq_partial, batch_format="pyarrow").materialize()
    sq = parts.sum("sq")
    n_comm = parts.sum("nc")
    q = float(intra) / m - float(sq)
    return pd.DataFrame([{
        "n_communities": int(n_comm),
        "m_edges": int(m),
        "modularity": round(q, 6),
    }])


def louvain_move_phase(
    edges_uv: Dataset,
    max_rounds: int = 12,
    num_buckets: int | None = None,
) -> tuple[Dataset, dict]:
    """Synchronous Louvain local-move phase over a distinct undirected
    (src, dst) pair table, starting from singleton communities.

    Returns ((id, comm) labels, info) with info carrying m_edges, rounds
    run and the per-round move counts. Deterministic: gains are computed
    with one fixed float64 expression, ties break to the smaller
    community id, even/odd rounds restrict moves to smaller/larger
    community ids, and a vertex that moved last round sits this one out
    (the measured-best synchronous oscillation guard, see module doc).
    max_rounds is a cap, not a promised fixpoint — Louvain sweeps are
    conventionally capped; info["converged"] reports which happened."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    ew = _with_weight(edges_uv).materialize()
    m = ew.sum("w")
    sym = _symmetrize(ew).materialize()
    deg = _degrees(sym, num_buckets)
    # candidate generation excludes self-loops: a self-loop moves WITH its
    # vertex (it cancels in the gain), but it must stay in the degree sum

    def no_self(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s != d))

    sym_ns = sym.map_batches(no_self, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": ids,
            "comm": ids,
            "k": t["k"].to_numpy(zero_copy_only=False),
            "moved": np.zeros(t.num_rows, np.int64),
        })

    labels = deg.map_batches(seed, batch_format="pyarrow").materialize()
    fm = float(m)
    moves_per_round: list[int] = []
    zero_streak = 0  # each round only allows one move direction, so a
    # fixpoint needs TWO consecutive zero-move rounds (both directions
    # stable; after a zero round the refractory set is empty)

    for r in range(max_rounds):
        tot = bucket_grouped_sum(
            labels.select_columns(["comm", "k"]), ["comm"], ["k"],
            num_buckets=num_buckets,
        )
        tot = rename_cols(tot, {"k": "tot"})
        # self state: (id, comm_a, k_i, tot_a, moved_last)
        selfst = adaptive_map_join(
            labels, tot, on="comm", key_col="comm", val_cols=["tot"],
            num_buckets=num_buckets,
        )
        selfst = rename_cols(
            selfst, {"comm": "comm_a", "tot": "tot_a", "moved": "moved_last"}
        )
        # neighbor communities: (src=i, comm=c_j, w) per non-self sym edge
        nbr = adaptive_map_join(
            sym_ns, labels.select_columns(["id", "comm"]),
            on="dst", key_col="id", val_cols=["comm"],
            num_buckets=num_buckets,
        ).select_columns(["src", "comm", "w"])
        # zero-weight own-community rows keep vertices whose only edges
        # are self-loops (fully-contracted communities) in the frontier
        selfrows = labels.map_batches(
            lambda t: pa.table({
                "src": t["id"], "comm": t["comm"],
                "w": pa.array(np.zeros(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        )

        # k_ic: total edge weight from i into each neighbor community
        def kic_fn(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["src", "comm"], as_index=False)["w"].sum()
            return out.rename(columns={"w": "k_ic"})

        cand = bucket_grouped(
            nbr.union(selfrows), ["src"], kic_fn,
            num_buckets=num_buckets,
            out_schema=pa.schema([
                ("src", pa.int64()), ("comm", pa.int64()),
                ("k_ic", pa.int64()),
            ]),
        )
        cand = adaptive_map_join(
            cand, tot, on="comm", key_col="comm", val_cols=["tot"],
            num_buckets=num_buckets,
        )
        cand = adaptive_map_join(
            cand, selfst, on="src", key_col="id",
            val_cols=["comm_a", "k", "tot_a", "moved_last"],
            num_buckets=num_buckets,
        )

        def decide(g: pd.DataFrame, _r=r) -> pd.DataFrame:
            if not len(g):
                return pd.DataFrame({
                    "id": pd.Series([], dtype=np.int64),
                    "comm": pd.Series([], dtype=np.int64),
                    "k": pd.Series([], dtype=np.int64),
                    "moved": pd.Series([], dtype=np.int64),
                })
            df = g[["src", "comm", "k_ic", "tot", "comm_a", "k", "tot_a",
                    "moved_last"]]
            k_ia_row = df["k_ic"].where(df["comm"] == df["comm_a"], 0)
            k_ia = k_ia_row.groupby(df["src"]).transform("max")
            k_i = df["k"].to_numpy(np.float64)
            dq = (
                (df["k_ic"].to_numpy(np.float64) - k_ia.to_numpy(np.float64))
                / fm
                - k_i
                * (df["tot"].to_numpy(np.float64)
                   - (df["tot_a"].to_numpy(np.float64) - k_i))
                / (2.0 * fm * fm)
            )
            stay = (df["comm"] == df["comm_a"]).to_numpy()
            # direction alternation: even rounds move down-id, odd up-id
            down = _r % 2 == 0
            cdir = (df["comm"].to_numpy() < df["comm_a"].to_numpy())
            wrong_dir = cdir != down
            dq = np.where(stay | wrong_dir, -np.inf, dq)
            pick = df.assign(dq=dq).sort_values(
                ["src", "dq", "comm"], ascending=[True, False, True]
            ).groupby("src", as_index=False).first()
            gate = pick["moved_last"].to_numpy() == 0  # refractory
            move = gate & (pick["dq"].to_numpy() > 1e-12)
            new_comm = np.where(move, pick["comm"].to_numpy(),
                                pick["comm_a"].to_numpy())
            return pd.DataFrame({
                "id": pick["src"].to_numpy(np.int64),
                "comm": new_comm.astype(np.int64),
                "k": pick["k"].to_numpy(np.int64),
                "moved": move.astype(np.int64),
            })

        decided = bucket_grouped(
            cand, ["src"], decide, num_buckets=num_buckets,
            out_schema=pa.schema([
                ("id", pa.int64()), ("comm", pa.int64()),
                ("k", pa.int64()), ("moved", pa.int64()),
            ]),
        ).materialize()
        moved = int(decided.sum("moved") or 0)
        moves_per_round.append(moved)
        labels = decided  # (id, comm, k, moved) — moved feeds the
        # refractory gate next round
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break

    info = {"m_edges": int(m), "rounds": len(moves_per_round),
            "moves_per_round": moves_per_round,
            "converged": zero_streak >= 2}
    return labels.select_columns(["id", "comm"]), info


def contract_by_labels(
    edges_uvw: Dataset,
    labels: Dataset,
    num_buckets: int | None = None,
) -> Dataset:
    """Louvain contraction: collapse vertices to their community ids and
    aggregate edge weights. Output is a distinct undirected weighted
    (src <= dst, w) table where src == dst rows carry the intra-community
    weight as self-loops — exactly the graph the next move-phase level
    consumes. Two label-attach joins + one bucketed weight sum."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    labels = labels.select_columns(["id", "comm"]).materialize()
    ew = _with_weight(edges_uvw)
    e1 = adaptive_map_join(
        ew, labels, on="src", key_col="id", val_cols=["comm"],
        num_buckets=num_buckets,
    )
    e1 = rename_cols(e1, {"comm": "comm_u"})
    e2 = adaptive_map_join(
        e1, labels, on="dst", key_col="id", val_cols=["comm"],
        num_buckets=num_buckets,
    )

    def collapse(t: pa.Table) -> pa.Table:
        cu = t["comm_u"].to_numpy(zero_copy_only=False)
        cv = t["comm"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": np.minimum(cu, cv),
            "dst": np.maximum(cu, cv),
            "w": t["w"],
        })

    coarse = e2.map_batches(collapse, batch_format="pyarrow")
    return bucket_grouped(
        coarse, ["src"],
        lambda g: g.groupby(["src", "dst"], as_index=False)["w"].sum(),
        num_buckets=num_buckets,
        out_schema=pa.schema([
            ("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64()),
        ]),
    )


def louvain(
    edges_uv: Dataset,
    levels: int = 2,
    max_rounds: int = 12,
    num_buckets: int | None = None,
) -> tuple[Dataset, dict]:
    """Multilevel Louvain: alternate the synchronous move phase with
    community contraction, then project the coarse labels back to the
    base vertices. Each level's graph is the previous level's communities
    with summed weights and intra-weight self-loops (the standard Blondel
    et al. 2008 pipeline; the move phase is the deterministic synchronous
    variant documented above). Returns ((id, comm), info) at base-vertex
    granularity; by the contraction invariant, modularity of the
    projected labels on the base graph equals modularity of the coarse
    labels on the coarse graph. Synchronous simultaneous moves carry no
    per-round joint-improvement guarantee (unlike sequential Louvain), so
    the Q improvement across levels is pinned empirically by
    tests/test_louvain.py rather than claimed as an invariant."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    e = _with_weight(edges_uv).materialize()
    total: Dataset | None = None
    infos = []
    for lvl in range(levels):
        lab, info = louvain_move_phase(
            e, max_rounds=max_rounds, num_buckets=num_buckets
        )
        lab = lab.materialize()
        infos.append(info)
        if total is None:
            total = lab
        else:
            up = rename_cols(lab, {"id": "cid", "comm": "comm_next"})
            total = adaptive_map_join(
                total, up, on="comm", key_col="cid",
                val_cols=["comm_next"], num_buckets=num_buckets,
            ).select_columns(["id", "comm_next"])
            total = rename_cols(total, {"comm_next": "comm"}).materialize()
        if lvl + 1 < levels:
            e = contract_by_labels(e, lab, num_buckets).materialize()
    return total, {"levels": levels, "per_level": infos}
