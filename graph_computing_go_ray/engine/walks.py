"""Deterministic random-walk generation (DeepWalk/node2vec precursor).

Embedding pipelines over link graphs start by materializing fixed-length
random walks from every vertex; at web scale the walk table is bigger than
the graph, so the generation itself must be a distributed dataflow, not a
driver loop. Design:

- adjacency lists are built ONCE (groupby(src), neighbors sorted for
  determinism) and stay sharded — never broadcast;
- the walk frontier (walk_id, cur) advances one step per round through a
  bucketed join against the adjacency shards: pick index =
  splitmix64(walk_id * C1 xor step * C2) mod degree, a counter-based RNG,
  so every step is reproducible from (walk_id, step) alone — no RNG state
  to carry, no cross-run nondeterminism, and the same formula replicated
  in a single-process oracle gives EXACT parity;
- each round emits its (walk_id, step, vertex) rows; the result is the
  union of rounds. Walks that hit a sink vertex (no out-edges) stop early
  (the inner join drops them), matching the oracle.

walk_len rounds = walk_len bucketed joins over a frontier that never
exceeds n_walks rows — the same shuffle shape as the redirect chase.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import splitmix64

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def step_choice(walk_ids: np.ndarray, step: int, degrees: np.ndarray) -> np.ndarray:
    """Counter-based neighbor index: reproducible from (walk_id, step)."""
    h = splitmix64(
        walk_ids.astype(np.int64).view(np.uint64) * _C1
        ^ np.uint64(step) * _C2
    )
    return (h % degrees.astype(np.uint64)).astype(np.int64)


def _adjacency(edges: Dataset, num_buckets: int) -> Dataset:
    """(src, neighbors list<int64>) — sorted, distinct neighbors."""
    from .join import add_bucket

    b = add_bucket(edges, "src", num_buckets)

    def lists(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst"]].drop_duplicates().sort_values(["src", "dst"])
        # plain Python lists: numpy cells would be stored as Ray's tensor
        # extension struct, which no longer casts to list<int64>
        out = g.groupby("src")["dst"].apply(lambda s: s.tolist())
        return pd.DataFrame({"src": out.index.to_numpy(), "neighbors": out.values})

    return b.groupby("bucket").map_groups(lists, batch_format="pandas")


def random_walks(edges: Dataset, walk_len: int = 5, n_walks: int = 1,
                 num_buckets: int | None = None) -> Dataset:
    """(walk_id, step, vertex) rows for `n_walks` walks per source vertex,
    walk_id = vertex * n_walks + j. Step 0 is the start vertex."""
    import ray.data as rd

    from .join import add_bucket, default_num_buckets, typed_seed

    if num_buckets is None:
        num_buckets = default_num_buckets()
    adj = _adjacency(edges, num_buckets).materialize()

    def starts(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        wid = (src[:, None] * n_walks + np.arange(n_walks)[None, :]).ravel()
        return pa.table({
            "walk_id": pa.array(wid, pa.int64()),
            "cur": pa.array(np.repeat(src, n_walks), pa.int64()),
        })

    frontier = adj.map_batches(
        lambda t: starts(t.select(["src"])), batch_format="pyarrow"
    ).materialize()

    out_schema = pa.schema([("walk_id", pa.int64()), ("step", pa.int64()),
                            ("vertex", pa.int64())])

    def emit(t: pa.Table, step: int) -> pa.Table:
        return pa.table({
            "walk_id": t["walk_id"],
            "step": pa.array(np.full(t.num_rows, step, np.int64)),
            "vertex": t["cur"],
        })

    rows = [frontier.map_batches(lambda t: emit(t, 0), batch_format="pyarrow")]
    ab_cached = None  # the adjacency co-group side is identical every step
    for step in range(1, walk_len + 1):

        def advance(g: pd.DataFrame, _step=step) -> pd.DataFrame:
            # co-grouped frontier rows (cur) and adjacency rows (src)
            fr = g[g["__side"] == 0]
            ad = g[g["__side"] == 1]
            if not len(fr) or not len(ad):
                return pd.DataFrame({"walk_id": pd.Series([], dtype=np.int64),
                                     "cur": pd.Series([], dtype=np.int64)})
            m = fr[["walk_id", "cur"]].merge(
                ad[["src", "neighbors"]], left_on="cur", right_on="src"
            )
            if not len(m):
                return pd.DataFrame({"walk_id": pd.Series([], dtype=np.int64),
                                     "cur": pd.Series([], dtype=np.int64)})
            degs = np.fromiter((len(x) for x in m["neighbors"]), np.int64,
                               count=len(m))
            idx = step_choice(m["walk_id"].to_numpy(), _step, degs)
            flat = np.concatenate([np.asarray(x) for x in m["neighbors"]])
            offs = np.concatenate([[0], np.cumsum(degs)[:-1]])
            return pd.DataFrame({
                "walk_id": m["walk_id"].to_numpy(),
                "cur": flat[offs + idx].astype(np.int64),
            })

        fb = add_bucket(frontier, "cur", num_buckets).map_batches(
            lambda t: t.append_column(
                "__side", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        if ab_cached is None:
            ab_cached = add_bucket(adj, "src", num_buckets).map_batches(
                lambda t: t.append_column(
                    "__side", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            ).materialize()
        ab = ab_cached

        def pad_f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "walk_id": t["walk_id"] if "walk_id" in t.column_names
                else pa.nulls(n, pa.int64()),
                "cur": t["cur"] if "cur" in t.column_names
                else pa.nulls(n, pa.int64()),
                "src": t["src"] if "src" in t.column_names
                else pa.nulls(n, pa.int64()),
                "neighbors": t["neighbors"].cast(pa.list_(pa.int64()))
                if "neighbors" in t.column_names
                else pa.nulls(n, pa.list_(pa.int64())),
                "bucket": t["bucket"], "__side": t["__side"],
            })

        # coalesce before the sort-based groupby: many tiny union blocks
        # degrade Ray's groupby badly (same fix as engine/join.bucket_grouped)
        both = fb.map_batches(pad_f, batch_format="pyarrow").union(
            ab.map_batches(pad_f, batch_format="pyarrow")
        ).repartition(max(16, min(128, num_buckets)))
        frontier = both.groupby("bucket").map_groups(
            advance, batch_format="pandas"
        )
        frontier = typed_seed(
            frontier.map_batches(
                lambda df: pa.Table.from_pandas(df, preserve_index=False).cast(
                    pa.schema([("walk_id", pa.int64()), ("cur", pa.int64())])
                ),
                batch_format="pandas",
            ),
            pa.schema([("walk_id", pa.int64()), ("cur", pa.int64())]),
        ).materialize()
        if frontier.count() == 0:
            break
        rows.append(frontier.map_batches(
            lambda t, _s=step: emit(t, _s), batch_format="pyarrow"
        ))

    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return typed_seed(out, out_schema)


def skipgram_pairs(walks: Dataset, window: int = 2,
                   num_buckets: int | None = None) -> Dataset:
    """(center, context, n) co-occurrence counts within +-window positions
    of each walk — the training pairs a word2vec-style embedding consumes.
    Walks are bucketed by walk_id so every walk's rows co-locate; each
    bucket emits its pairs with pure array shifts (no per-walk Python), and
    the final count is one bucketed groupby of the (small-int) pair keys."""
    from .join import add_bucket, bucket_grouped_count, default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    b = add_bucket(walks, "walk_id", num_buckets)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["walk_id", "step"])
        wid = g["walk_id"].to_numpy()
        step = g["step"].to_numpy()
        v = g["vertex"].to_numpy()
        us, vs = [], []
        for d in range(1, window + 1):
            if len(v) <= d:
                break
            ok = (wid[d:] == wid[:-d]) & (step[d:] == step[:-d] + d)
            us.append(v[:-d][ok]); vs.append(v[d:][ok])
        if not us:
            return pd.DataFrame({"center": pd.Series([], dtype=np.int64),
                                 "context": pd.Series([], dtype=np.int64)})
        a = np.concatenate(us); c = np.concatenate(vs)
        # symmetric context window (DeepWalk trains both directions)
        return pd.DataFrame({
            "center": np.concatenate([a, c]).astype(np.int64),
            "context": np.concatenate([c, a]).astype(np.int64),
        })

    p = b.groupby("bucket").map_groups(pairs, batch_format="pandas")
    return bucket_grouped_count(p, ["center", "context"], "n", num_buckets)


def biased_choice(walk_ids: np.ndarray, step: int,
                  totals: np.ndarray) -> np.ndarray:
    """Counter-based integer target in [0, total) per walk — the biased
    (node2vec) analog of step_choice; exact in integer arithmetic."""
    h = splitmix64(
        walk_ids.astype(np.int64).view(np.uint64) * _C2
        ^ np.uint64(step) * _C1
    )
    return (h % totals.astype(np.uint64)).astype(np.int64)


def node2vec_walks(edges: Dataset, walk_len: int = 5, n_walks: int = 1,
                   w_return: int = 2, w_common: int = 4, w_far: int = 1,
                   num_buckets: int | None = None) -> Dataset:
    """Second-order (node2vec) biased walks: the next-vertex weight depends
    on the PREVIOUS vertex — w_return if the candidate is prev itself,
    w_common if it is a neighbor of prev, w_far otherwise (integer weights
    = 1/p : 1 : 1/q up to a common scale, so the weighted pick is exact
    integer arithmetic and bit-for-bit replicable by the pytest oracle).

    Distribution shape: the frontier carries (walk_id, cur, prev,
    prev_nbrs) — the previous vertex's neighbor list is what THIS step's
    adjacency join produced for cur last round, so each step still costs
    exactly ONE bucketed co-group join against the sharded adjacency, and
    the second-order dependence never needs a second join. Membership
    (candidate in prev_nbrs) is one vectorized np.isin over composite
    (row, vertex) keys; the weighted pick is a global-integer-cumsum
    searchsorted — no per-walk Python."""
    from .join import add_bucket, default_num_buckets, typed_seed

    if num_buckets is None:
        num_buckets = default_num_buckets()
    adj = _adjacency(edges, num_buckets).materialize()

    def starts(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        wid = (src[:, None] * n_walks + np.arange(n_walks)[None, :]).ravel()
        cur = np.repeat(src, n_walks)
        return pa.table({
            "walk_id": pa.array(wid, pa.int64()),
            "cur": pa.array(cur, pa.int64()),
            "prev": pa.array(np.full(len(wid), -1, np.int64)),
            "prev_nbrs": pa.array([[] for _ in range(len(wid))],
                                  pa.list_(pa.int64())),
        })

    frontier = adj.map_batches(
        lambda t: starts(t.select(["src"])), batch_format="pyarrow"
    ).materialize()

    out_schema = pa.schema([("walk_id", pa.int64()), ("step", pa.int64()),
                            ("vertex", pa.int64())])

    def emit(t: pa.Table, step: int) -> pa.Table:
        return pa.table({
            "walk_id": t["walk_id"],
            "step": pa.array(np.full(t.num_rows, step, np.int64)),
            "vertex": t["cur"],
        })

    f_schema = pa.schema([
        ("walk_id", pa.int64()), ("cur", pa.int64()), ("prev", pa.int64()),
        ("prev_nbrs", pa.list_(pa.int64())),
    ])
    rows = [frontier.map_batches(lambda t: emit(t, 0), batch_format="pyarrow")]
    ab_cached = None  # the adjacency co-group side is identical every step
    for step in range(1, walk_len + 1):

        def advance(g: pd.DataFrame, _step=step) -> pd.DataFrame:
            empty = pd.DataFrame({
                "walk_id": pd.Series([], dtype=np.int64),
                "cur": pd.Series([], dtype=np.int64),
                "prev": pd.Series([], dtype=np.int64),
                "prev_nbrs": pd.Series([], dtype=object),
            })
            fr = g[g["__side"] == 0]
            ad = g[g["__side"] == 1]
            if not len(fr) or not len(ad):
                return empty
            m = fr[["walk_id", "cur", "prev", "prev_nbrs"]].merge(
                ad[["src", "neighbors"]], left_on="cur", right_on="src"
            )
            if not len(m):
                return empty
            R = len(m)
            degs = np.fromiter((len(x) for x in m["neighbors"]), np.int64,
                               count=R)
            cand = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in m["neighbors"]]
            )
            row = np.repeat(np.arange(R, dtype=np.int64), degs)
            offs = np.concatenate([[0], np.cumsum(degs)[:-1]])
            prev = m["prev"].to_numpy()
            # composite (row, vertex) keys: vertex ids are nonneg int64
            SHIFT = np.int64(1) << np.int64(32)
            pdegs = np.fromiter((len(x) for x in m["prev_nbrs"]), np.int64,
                                count=R)
            if pdegs.sum():
                pflat = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in m["prev_nbrs"]]
                )
                prow = np.repeat(np.arange(R, dtype=np.int64), pdegs)
                common = np.isin(row * SHIFT + cand, prow * SHIFT + pflat)
            else:
                common = np.zeros(len(cand), dtype=bool)
            w = np.where(cand == prev[row], np.int64(w_return),
                         np.where(common, np.int64(w_common),
                                  np.int64(w_far)))
            cum = np.cumsum(w)
            base = np.concatenate([[0], cum[:-1]])[offs]
            totals = cum[offs + degs - 1] - base
            t_row = biased_choice(m["walk_id"].to_numpy(), _step, totals)
            pick = np.searchsorted(cum, base + t_row, side="right")
            nxt = cand[pick]
            return pd.DataFrame({
                "walk_id": m["walk_id"].to_numpy(),
                "cur": nxt.astype(np.int64),
                "prev": m["cur"].to_numpy(),
                "prev_nbrs": list(m["neighbors"]),
            })

        fb = add_bucket(frontier, "cur", num_buckets).map_batches(
            lambda t: t.append_column(
                "__side", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow",
        )
        if ab_cached is None:
            ab_cached = add_bucket(adj, "src", num_buckets).map_batches(
                lambda t: t.append_column(
                    "__side", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow",
            ).materialize()
        ab = ab_cached

        def pad_f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            lt = pa.list_(pa.int64())
            return pa.table({
                "walk_id": t["walk_id"] if "walk_id" in t.column_names
                else pa.nulls(n, pa.int64()),
                "cur": t["cur"] if "cur" in t.column_names
                else pa.nulls(n, pa.int64()),
                "prev": t["prev"] if "prev" in t.column_names
                else pa.nulls(n, pa.int64()),
                "prev_nbrs": t["prev_nbrs"].cast(lt)
                if "prev_nbrs" in t.column_names else pa.nulls(n, lt),
                "src": t["src"] if "src" in t.column_names
                else pa.nulls(n, pa.int64()),
                "neighbors": t["neighbors"].cast(lt)
                if "neighbors" in t.column_names else pa.nulls(n, lt),
                "bucket": t["bucket"], "__side": t["__side"],
            })

        # coalesce before the sort-based groupby: many tiny union blocks
        # degrade Ray's groupby badly (same fix as engine/join.bucket_grouped)
        both = fb.map_batches(pad_f, batch_format="pyarrow").union(
            ab.map_batches(pad_f, batch_format="pyarrow")
        ).repartition(max(16, min(128, num_buckets)))
        frontier = both.groupby("bucket").map_groups(
            advance, batch_format="pandas"
        )
        frontier = typed_seed(
            frontier.map_batches(
                lambda df: pa.Table.from_pandas(
                    df, preserve_index=False
                ).cast(f_schema),
                batch_format="pandas",
            ),
            f_schema,
        ).materialize()
        if frontier.count() == 0:
            break
        rows.append(frontier.map_batches(
            lambda t, _s=step: emit(t, _s), batch_format="pyarrow"
        ))

    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return typed_seed(out, out_schema)
