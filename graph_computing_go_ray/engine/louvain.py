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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .join import (
    adaptive_map_join,
    add_bucket,
    bucket_grouped,
    bucket_grouped_sum,
    default_num_buckets,
    rename_cols,
)

# worker-local cache of published label shards: one fetch per
# (run, round, bucket) per worker; FIFO-capped like superstep._STATE_CACHE
_SHARD_CACHE: dict = {}
_SHARD_CACHE_MAX = 64


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


def _decide_round(g: pd.DataFrame, r: int, fm: float) -> pd.DataFrame:
    """One synchronous move decision over a tagged candidate frame
    (src, comm, w, tot, k, moved, is_self) — per-src independent, so the
    distributed src-bucketed pass and the local whole-graph pass produce
    byte-identical outputs from the same input rows."""
    st = g[g["is_self"] == 1][["src", "comm", "k", "tot", "moved"]]
    st = st.rename(columns={"comm": "comm_a", "tot": "tot_a",
                            "moved": "moved_last"})
    if not len(st):
        return pd.DataFrame({
            "id": pd.Series([], dtype=np.int64),
            "comm": pd.Series([], dtype=np.int64),
            "k": pd.Series([], dtype=np.int64),
            "moved": pd.Series([], dtype=np.int64),
        })
    nb = g[g["is_self"] == 0]
    agg = (nb.groupby(["src", "comm"], as_index=False)
           .agg(k_ic=("w", "sum"), tot=("tot", "first")))
    # every vertex keeps exactly one self row, so this left merge
    # yields either its candidate rows or one all-NaN candidate
    df = st.merge(agg, on="src", how="left")
    k_ic = df["k_ic"].fillna(0).to_numpy(np.float64)
    k_ia_row = df["k_ic"].where(df["comm"] == df["comm_a"], 0)
    k_ia = k_ia_row.fillna(0).groupby(df["src"]).transform("max")
    k_i = df["k"].to_numpy(np.float64)
    dq = (
        (k_ic - k_ia.to_numpy(np.float64)) / fm
        - k_i
        * (df["tot"].fillna(0).to_numpy(np.float64)
           - (df["tot_a"].to_numpy(np.float64) - k_i))
        / (2.0 * fm * fm)
    )
    no_cand = df["comm"].isna().to_numpy()
    stay = (df["comm"] == df["comm_a"]).to_numpy()
    # direction alternation: even rounds move down-id, odd up-id
    down = r % 2 == 0
    cdir = df["comm"].fillna(0).to_numpy() < df["comm_a"].to_numpy()
    wrong_dir = cdir != down
    dq = np.where(no_cand | stay | wrong_dir, -np.inf, dq)
    pick = df.assign(dq=dq).sort_values(
        ["src", "dq", "comm"], ascending=[True, False, True]
    ).groupby("src", as_index=False).first()
    gate = pick["moved_last"].to_numpy() == 0  # refractory
    move = gate & (pick["dq"].to_numpy() > 1e-12)
    # keep the candidate comm integer: the left merge made pick['comm']
    # float64 (NaN for no-candidate rows), and ids >= 2^53 would corrupt
    # on a float round-trip; no-candidate rows have move=False (dq=-inf)
    # so the -1 fill is never selected
    cand_comm = pick["comm"].fillna(-1).astype(np.int64).to_numpy()
    new_comm = np.where(move, cand_comm, pick["comm_a"].to_numpy(np.int64))
    return pd.DataFrame({
        "id": pick["src"].to_numpy(np.int64),
        "comm": new_comm.astype(np.int64),
        "k": pick["k"].to_numpy(np.int64),
        "moved": move.astype(np.int64),
    })


def _move_phase_local(
    sym_ns: pd.DataFrame, labels: pd.DataFrame, fm: float, max_rounds: int,
) -> tuple[pd.DataFrame, list[int], bool]:
    """Whole-graph move loop in one process — the small-remainder leg of
    the local-cutoff hybrid (same pattern as scc.local_cutoff). Builds
    the exact tagged frame the distributed round feeds _decide_round, so
    results are identical; only the exchange machinery is skipped."""
    moves_per_round: list[int] = []
    zero_streak = 0
    for r in range(max_rounds):
        tot = labels.groupby("comm")["k"].sum()
        nbr = sym_ns.merge(
            labels[["id", "comm"]], left_on="dst", right_on="id",
            how="inner")[["src", "comm", "w"]]
        nbr["tot"] = nbr["comm"].map(tot).astype(np.int64)
        nbr["k"] = 0
        nbr["moved"] = 0
        nbr["is_self"] = 0
        own = pd.DataFrame({
            "src": labels["id"], "comm": labels["comm"],
            "w": np.zeros(len(labels), np.int64),
            "tot": labels["comm"].map(tot).astype(np.int64),
            "k": labels["k"], "moved": labels["moved"],
            "is_self": np.ones(len(labels), np.int64),
        })
        tagged = pd.concat(
            [nbr[["src", "comm", "w", "tot", "k", "moved", "is_self"]], own],
            ignore_index=True)
        decided = _decide_round(tagged, r, fm)
        moved = int(decided["moved"].sum())
        moves_per_round.append(moved)
        labels = decided
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break
    return labels, moves_per_round, zero_streak >= 2


def louvain_move_phase(
    edges_uv: Dataset,
    max_rounds: int = 12,
    num_buckets: int | None = None,
    local_cutoff: int = 200_000,
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
    conventionally capped; info["converged"] reports which happened.

    local_cutoff: a symmetrized candidate table of at most this many rows
    runs the whole move loop in ONE Ray task via _move_phase_local (the
    scc.local_cutoff hybrid); 0 disables. Both paths feed the same
    _decide_round frame, so outputs are identical (parity pytest in
    tests/test_louvain.py)."""
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

    # local-cutoff hybrid (same pattern as scc.strongly_connected_
    # components): a graph whose symmetrized candidate table fits one
    # worker runs the whole move loop in-process — the per-round
    # exchanges only pay off when the frontier doesn't fit. At web scale
    # the distributed rounds below run; results are identical because
    # both paths feed the same _decide_round frame.
    if local_cutoff and sym_ns.count() <= local_cutoff:
        import ray as _ray

        @_ray.remote
        def _run_local(sym_df: pd.DataFrame, lab_df: pd.DataFrame,
                       _fm: float, _mr: int):
            return _move_phase_local(sym_df, lab_df, _fm, _mr)

        out_df, mpr, conv = _ray.get(_run_local.remote(
            sym_ns.to_pandas(), labels.to_pandas(), fm, max_rounds))
        import ray.data as _rd

        lab_ds = _rd.from_arrow(pa.Table.from_pandas(
            out_df[["id", "comm"]], preserve_index=False).cast(
                pa.schema([("id", pa.int64()), ("comm", pa.int64())])))
        return lab_ds, {"m_edges": int(m), "rounds": len(mpr),
                        "moves_per_round": mpr, "converged": conv,
                        "local": True}

    moves_per_round: list[int] = []
    zero_streak = 0  # each round only allows one move direction, so a
    # fixpoint needs TWO consecutive zero-move rounds (both directions
    # stable; after a zero round the refractory set is empty)

    # shard-published neighbor attach (round-4 verdict #6): the edge table
    # is round-INVARIANT, so re-shuffling it through a bucket join every
    # round is wasted motion. Instead the dst-hash bucket id is stamped on
    # the edges ONCE; each round the (vertex-sized) label table is
    # published as id-hash shards into the object store via the superstep
    # keeper pool, and a map stage over the static edges fetches only the
    # shards its batch needs (peer-to-peer plasma, worker-cached). Edge
    # rows then move once per round (into the decide exchange) instead of
    # twice — per-round shuffled bytes drop from ~2E+2V to ~E+2V.
    # Measured at the sf1 chain graph (280k edges / 168k vertices,
    # 32 CPUs, 4 rounds, BASELINE §6): join (adaptive broadcast) 1.48-1.49
    # s/round; join forced onto its bucketed fallback 2.06-2.07 s/round;
    # shards 2.25-2.45 s/round in both regimes — the publish pass's extra
    # vertex exchange + keeper round-trips outweigh the saved edge
    # re-shuffle at every scale reachable in this sandbox, so the
    # measured default stays "join". The shard path remains an opt-in
    # (GCGR_LOUVAIN_NBR=shards, parity-tested byte-identical) for
    # edge-byte-dominated graphs where E bytes >> V bytes.
    nbr_mode = os.environ.get("GCGR_LOUVAIN_NBR", "join")
    keepers = None
    run_nonce = None
    sym_src = sym_ns
    if nbr_mode == "shards":
        import uuid

        import ray as _ray

        from .superstep import _keeper_for, _make_keepers

        sym_src = add_bucket(sym_ns, "dst", num_buckets).materialize()
        keepers = _make_keepers(num_buckets)
        run_nonce = uuid.uuid4().hex

    for r in range(max_rounds):
        # FUSED round (round-3 verdict perf item): 3 exchanges instead of 7.
        # (1) ONE comm-keyed bucket pass computes community totals AND
        # attaches them to every member row (the old tot groupby + selfst
        # join fused); (2) the neighbor attach carries the neighbor's
        # (comm, tot) together so no separate candidate-tot join is
        # needed; (3) k_ic aggregation, self-state merge and the move
        # decision fuse into ONE src-keyed bucket pass over a tagged
        # union (the old cand groupby + selfst join + decide pass fused).

        def attach_tot(g: pd.DataFrame) -> pd.DataFrame:
            g = g[["id", "comm", "k", "moved"]].copy()
            g["tot"] = g.groupby("comm")["k"].transform("sum")
            return g

        labt = bucket_grouped(
            labels, ["comm"], attach_tot, num_buckets=num_buckets,
            out_schema=pa.schema([
                ("id", pa.int64()), ("comm", pa.int64()),
                ("k", pa.int64()), ("moved", pa.int64()),
                ("tot", pa.int64()),
            ]),
        ).materialize()  # consumed twice: neighbor attach + self rows

        # neighbor candidates: (src=i, comm=c_j, tot=tot_{c_j}, w) per
        # non-self sym edge — the neighbor's community total rides the
        # same attach instead of a second comm-keyed pass
        if nbr_mode == "shards":
            # publish this round's label shards by id-hash; keeper owns
            # the refs so their lifetime outlives the publishing task
            def publish(g: pd.DataFrame, _r=r, _kp=keepers,
                        _rid=run_nonce) -> pd.DataFrame:
                import ray as _r2

                b = int(g["bucket"].iloc[0])
                t = pa.Table.from_pandas(
                    g[["id", "comm", "tot"]], preserve_index=False)
                kp = _keeper_for(_kp, b)
                ref = _r2.put(t, _owner=kp)
                _r2.get(kp.register.remote(_rid, _r, b, [ref]))
                return pd.DataFrame({"bucket": [b], "n": [len(g)]})

            add_bucket(
                labt.select_columns(["id", "comm", "tot"]), "id",
                num_buckets,
            ).repartition(max(16, min(128, num_buckets))).groupby(
                "bucket"
            ).map_groups(publish, batch_format="pandas").materialize()

            _nbr_schema = pa.schema([
                ("src", pa.int64()), ("comm", pa.int64()),
                ("w", pa.int64()), ("tot", pa.int64()),
            ])

            def nbr_lookup(t: pa.Table, _r=r, _kp=keepers,
                           _rid=run_nonce) -> pa.Table:
                import ray as _r2

                b_arr = t["bucket"].to_numpy(zero_copy_only=False)
                out = []
                for b in np.unique(b_arr):
                    key = (_rid, _r, int(b))
                    shard = _SHARD_CACHE.get(key)
                    if shard is None:
                        ref = _r2.get(_keeper_for(_kp, int(b)).lookup.remote(
                            _rid, _r, int(b)))[0]
                        if ref is None:
                            continue  # no vertex hashed to this bucket
                        shard = _r2.get(ref).to_pandas()
                        if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
                            _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
                        _SHARD_CACHE[key] = shard
                    sub = t.filter(pa.array(b_arr == b)).select(
                        ["src", "dst", "w"]).to_pandas()
                    mg = sub.merge(shard, left_on="dst", right_on="id",
                                   how="inner")
                    out.append(pa.Table.from_pandas(
                        mg[["src", "comm", "w", "tot"]],
                        preserve_index=False).cast(_nbr_schema))
                if not out:
                    return _nbr_schema.empty_table()
                return pa.concat_tables(out)

            nbr = sym_src.map_batches(nbr_lookup, batch_format="pyarrow",
                                      batch_size=None)
        else:
            nbr = adaptive_map_join(
                sym_ns, labt.select_columns(["id", "comm", "tot"]),
                on="dst", key_col="id", val_cols=["comm", "tot"],
                num_buckets=num_buckets,
            ).select_columns(["src", "comm", "w", "tot"])

        def tag_nbr(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, np.int64)
            return pa.table({
                "src": t["src"], "comm": t["comm"], "w": t["w"],
                "tot": t["tot"], "k": pa.array(z), "moved": pa.array(z),
                "is_self": pa.array(z),
            })

        # one self-state row per vertex (comm_a, k_i, tot_a, moved_last);
        # doubles as the frontier keeper for vertices whose only edges
        # are self-loops (fully-contracted communities)
        def tag_self(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, np.int64)
            return pa.table({
                "src": t["id"], "comm": t["comm"],
                "w": pa.array(z), "tot": t["tot"], "k": t["k"],
                "moved": t["moved"],
                "is_self": pa.array(np.ones(t.num_rows, np.int64)),
            })

        tagged = nbr.map_batches(tag_nbr, batch_format="pyarrow").union(
            labt.map_batches(tag_self, batch_format="pyarrow"))

        def decide(g: pd.DataFrame, _r=r) -> pd.DataFrame:
            return _decide_round(g, _r, fm)

        decided = bucket_grouped(
            tagged, ["src"], decide, num_buckets=num_buckets,
            out_schema=pa.schema([
                ("id", pa.int64()), ("comm", pa.int64()),
                ("k", pa.int64()), ("moved", pa.int64()),
            ]),
        ).materialize()
        moved = int(decided.sum("moved") or 0)
        moves_per_round.append(moved)
        labels = decided  # (id, comm, k, moved) — moved feeds the
        # refractory gate next round
        if keepers is not None:
            for kp in keepers:  # decided is materialized: round-r shards
                kp.drop_before.remote(run_nonce, r + 1)  # are dead weight
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break

    if keepers is not None:
        for kp in keepers:
            kp.drop_run.remote(run_nonce)

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
