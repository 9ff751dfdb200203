"""J1-J3: url/title resolution — dual-index dedup, ≤3-hop redirect chase,
out-link resolution → canonical edge table.

Reference semantics (/root/reference/internal/wikiEntropy/wikiEntropy.go:156-279):

- J1: two hash indexes over the snapshot's pages: exact key and normalized
  key (title_filter); on conflict prefer non-redirect, else "later arrival"
  (we use max id — deterministic deviation, SURVEY §7.4.2).
- J2: redirect chase, ≤3 iterations. QUIRK replicated: when the exact-index
  lookup misses and the normalized-index lookup finds ANOTHER redirect, the
  chase does NOT advance (shadowed variable at wikiEntropy.go:209 /
  wikipediaGoogleDistance.go:210) — it burns the iteration.
- J3: out-link resolution, ≤3 iterations; in the normalized branch the chase
  DOES advance (wikiEntropy.go:253-262). Unresolved links and self-links are
  dropped (wikiEntropy.go:266).

Ray shape: the two resolution tables are hash-BUCKETED ONCE to Parquet
(bucket=N subdirs); each chase round shuffles only the shrinking actives by
key-hash bucket and every bucket group merges against its bucket file — the
repeated-lookup join of engine/join.py. Shuffle key = target url; partition
count = num_buckets (the partitioning assumption this operator relies on).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..engine.join import add_bucket, read_bucket
from ..functions.hashing import hash_strings
from ..functions.text import title_filter, title_filter_py


def _with_id(batch: pa.Table) -> pa.Table:
    ids = hash_strings(batch["url"].to_pylist())
    return batch.append_column("id", pa.array(ids, pa.int64()))


def vertices_from_extracted(extracted: Dataset) -> Dataset:
    """(url, links_out, redirect, id) with id = stable hash of url."""
    return extracted.map_batches(_with_id, batch_format="pyarrow")


def _priority_pick_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """D2 per bucket, vectorized: prefer non-redirect over redirect, then
    max id (deterministic deviation from last-write-wins; SURVEY §7.4.2).
    Sort puts the winner first per key, then one drop_duplicates."""
    g = g.assign(_nr=g["redirect"].isna()).sort_values(
        ["key", "_nr", "id"], ascending=[True, False, False]
    )
    return g.drop_duplicates("key", keep="first")[["key", "id", "redirect"]]


_RES_SCHEMA = pa.schema(
    [("key", pa.large_string()), ("id", pa.int64()), ("redirect", pa.large_string())]
)


def resolution_table(vertices: Dataset, normalized: bool) -> Dataset:
    """key → (id, redirect) resolution table; key = exact url or
    title_filter(url) (J1)."""

    def keyed(batch: pa.Table) -> pa.Table:
        key = title_filter(batch["url"]) if normalized else batch["url"]
        return pa.table(
            {"key": pc.cast(key, pa.large_string()), "id": batch["id"],
             "redirect": pc.cast(batch["redirect"], pa.large_string())}
        )

    ds = vertices.select_columns(["url", "id", "redirect"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    from ..engine.join import bucket_grouped

    return bucket_grouped(ds, ["key"], _priority_pick_bucket, out_schema=_RES_SCHEMA)


def write_resolution_buckets(
    vertices: Dataset, out_dir: str, num_buckets: int = 8
) -> tuple[str, str]:
    """Build + bucket both resolution tables once; returns (origin_dir, norm_dir).

    Fused: the priority-pick dedup and the bucket-file write happen in the
    SAME per-bucket task (the group the dedup shuffle delivers IS exactly
    one bucket's rows), so each table costs one shuffle + one write instead
    of dedup-shuffle -> re-bucket -> partitioned write.

    out_dir may be a URI (file://, s3://): bucket files are written from
    inside Ray tasks through the checkpoint fs layer, so on a cluster they
    land in shared storage every later lookup task can read (VERDICT r4 #1
    — raw local-fs writes put buckets on whichever node ran the task)."""
    from ..state import checkpoint as ckpt

    dirs = []
    for normalized, dname in ((False, "origin_buckets"), (True, "norm_buckets")):
        bdir = ckpt.join(out_dir, dname)
        fsys, broot = ckpt.get_fs(bdir)
        fsys.delete_dir_contents(broot, missing_dir_ok=True)
        ckpt.ensure_dir(bdir)

        def keyed(batch: pa.Table, _n=normalized) -> pa.Table:
            key = title_filter(batch["url"]) if _n else batch["url"]
            return pa.table(
                {"key": pc.cast(key, pa.large_string()), "id": batch["id"],
                 "redirect": pc.cast(batch["redirect"], pa.large_string())}
            )

        ds = vertices.select_columns(["url", "id", "redirect"]).map_batches(
            keyed, batch_format="pyarrow"
        )

        def pick_write(g: pd.DataFrame, _d=bdir) -> pd.DataFrame:
            from ..state import checkpoint as _ckpt

            b = int(g["bucket"].iloc[0])
            out = _priority_pick_bucket(g.drop(columns=["bucket"]))
            _ckpt.ensure_dir(_ckpt.join(_d, f"bucket={b}"))
            _ckpt.write_table_at(
                _ckpt.join(_d, f"bucket={b}", "data.parquet"),
                pa.Table.from_pandas(out, preserve_index=False).cast(_RES_SCHEMA),
            )
            return pd.DataFrame({"bucket": [b], "n": [len(out)]})

        add_bucket(ds, "key", num_buckets).repartition(
            max(8, num_buckets)
        ).groupby("bucket").map_groups(
            pick_write, batch_format="pandas"
        ).to_pandas()
        dirs.append(bdir)
    return dirs[0], dirs[1]


# status codes inside a chase round
_HIT, _ADV, _MISS = 0, 1, 2


def _lookup_fn(bucket_dir: str, join_col: str, next_key: str):
    """Per-bucket lookup: merge the group against its bucket file.

    Output: (src, key, dst, status) — key is the NEXT key for status=_ADV
    rows when next_key='redirect'; unchanged when next_key='key' (the J2
    normalized-branch quirk)."""

    def fn(g: pd.DataFrame) -> pa.Table:
        b = int(g["bucket"].iloc[0])
        t = read_bucket(bucket_dir, b)
        out = pd.DataFrame(
            {"key0": g["key0"].astype(object), "key": g["key"].astype(object),
             "lookup": g[join_col].astype(object)}
        )
        if t is None:
            out["dst"] = pd.array([pd.NA] * len(out), dtype="Int64")
            out["status"] = np.int8(_MISS)
            return pa.Table.from_pandas(
                out[["key0", "key", "dst", "status"]], preserve_index=False
            ).cast(_STEP_SCHEMA)
        rt = t.to_pandas().rename(
            columns={"key": "lookup", "id": "rid", "redirect": "rred"}
        )
        # nullable Int64 BEFORE the left-merge: a post-merge astype from
        # float64 would corrupt the low bits of 63-bit hash ids
        rt["rid"] = rt["rid"].astype("Int64")
        m = out.merge(rt, on="lookup", how="left")
        hit = m["rid"].notna() & m["rred"].isna()
        adv = m["rred"].notna()
        status = np.where(hit, _HIT, np.where(adv, _ADV, _MISS)).astype(np.int8)
        if next_key == "redirect":
            key = np.where(adv, m["rred"].astype(object), m["key"].astype(object))
        else:
            key = m["key"].to_numpy(dtype=object)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"key0": m["key0"].to_numpy(dtype=object), "key": key,
                 "dst": m["rid"].astype("Int64"), "status": status}
            ),
            preserve_index=False,
        ).cast(_STEP_SCHEMA)

    return fn


_STEP_SCHEMA = pa.schema(
    [("key0", pa.large_string()), ("key", pa.large_string()),
     ("dst", pa.int64()), ("status", pa.int8())]
)


def _take(step: Dataset, status: int, cols: dict[str, pa.DataType]) -> Dataset:
    def fn(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["status"], status))
        return pa.table({c: f[c].cast(typ) for c, typ in cols.items()})

    return step.map_batches(fn, batch_format="pyarrow")


def chase(
    candidates: Dataset,
    origin_dir: str,
    norm_dir: str,
    advance_on_norm_redirect: bool,
    rounds: int = 3,
    num_buckets: int = 8,
) -> Dataset:
    """Resolve (src, key) candidates to (src, dst) through ≤`rounds` redirect
    hops (J2/J3). Unresolved candidates are dropped.

    The chase runs over DISTINCT keys (zipf-skewed link targets repeat
    heavily, so distinct keys ≈ |V| while candidates ≈ |E|); resolutions are
    mapped back to candidates with one bucketed join at the end."""
    from ..engine.join import bucket_grouped, bucket_join

    uniq = bucket_grouped(
        candidates.select_columns(["key"]), ["key"],
        lambda g: g[["key"]].drop_duplicates(), num_buckets,
        out_schema=pa.schema([("key", pa.large_string())]),
    ).map_batches(
        lambda t: pa.table({"key0": t["key"], "key": t["key"]}).cast(
            pa.schema([("key0", pa.large_string()), ("key", pa.large_string())])
        ),
        batch_format="pyarrow",
    )
    res_keys = _chase_keys(uniq, origin_dir, norm_dir,
                           advance_on_norm_redirect, rounds, num_buckets)
    # map back: candidates (src,key) ⋈ (key0 -> dst)
    out = bucket_join(
        candidates, res_keys, on="key", right_on="key0", how="inner",
        num_buckets=num_buckets,
    )
    return out.select_columns(["src", "dst"])


def _chase_keys(
    candidates: Dataset,
    origin_dir: str,
    norm_dir: str,
    advance_on_norm_redirect: bool,
    rounds: int,
    num_buckets: int,
) -> Dataset:
    """Inner chase over (src, key, key0) rows; returns (key0, dst)."""
    import ray.data as rd

    edge_cols = {"key0": pa.large_string(), "dst": pa.int64()}
    key_cols = {"key0": pa.large_string(), "key": pa.large_string()}
    # schema seed: an empty resolved table so downstream schema survives
    # even when a round (or the whole chase) resolves nothing
    resolved: list[Dataset] = [rd.from_arrow(pa.table(
        {"key0": pa.array([], pa.large_string()), "dst": pa.array([], pa.int64())}
    ))]
    active = candidates.select_columns(["key0", "key"])
    for _ in range(rounds):
        # materialize the shrinking active set: its count sizes the coalesce
        # (sort-groupby fixed cost scales with input block count) and an
        # empty set ends the chase — no key can resolve in a later round
        active = active.materialize()
        n_active = active.count()
        if n_active == 0:
            break
        rep = max(8, min(num_buckets, -(-n_active // 200_000)))
        a = add_bucket(active, "key", num_buckets).repartition(rep)
        # _lookup_fn returns Arrow with the pinned _STEP_SCHEMA, so the
        # steps need no separate cast stage
        step1 = a.groupby("bucket").map_groups(
            _lookup_fn(origin_dir, "key", next_key="redirect"),
            batch_format="pandas",
        ).materialize()
        resolved.append(_take(step1, _HIT, edge_cols))
        adv1 = _take(step1, _ADV, key_cols)
        miss = _take(step1, _MISS, key_cols).map_batches(
            lambda t: t.append_column(
                "nkey",
                pa.array(
                    [title_filter_py(k) for k in t["key"].to_pylist()],
                    pa.large_string(),
                ),
            ),
            batch_format="pyarrow",
        )
        m = add_bucket(miss, "nkey", num_buckets).repartition(rep)
        step2 = m.groupby("bucket").map_groups(
            _lookup_fn(
                norm_dir, "nkey",
                next_key="redirect" if advance_on_norm_redirect else "key",
            ),
            batch_format="pandas",
        ).materialize()
        resolved.append(_take(step2, _HIT, edge_cols))
        adv2 = _take(step2, _ADV, key_cols)
        active = adv1.union(adv2)
    out = resolved[0]
    for r in resolved[1:]:
        out = out.union(r)
    return out


def resolve_redirect_ids(
    vertices: Dataset, origin_dir: str, norm_dir: str, num_buckets: int = 8
) -> Dataset:
    """J2: (id, redirect_id) for redirect vertices; self-redirects dropped
    (wikiEntropy.go:226)."""

    def cands(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["redirect"]))
        return pa.table(
            {"src": f["id"], "key": pc.cast(f["redirect"], pa.large_string())}
        )

    import ray.data as rd

    c = vertices.map_batches(cands, batch_format="pyarrow")
    res = chase(c, origin_dir, norm_dir,
                advance_on_norm_redirect=False, num_buckets=num_buckets)
    mapped = res.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"]))
        .rename_columns(["id", "redirect_id"]),
        batch_format="pyarrow",
    )
    # typed empty seed: an all-empty chase otherwise yields Unknown schema
    # (map_batches UDFs never run on 0-row blocks)
    seed = rd.from_arrow(pa.table(
        {"id": pa.array([], pa.int64()), "redirect_id": pa.array([], pa.int64())}
    ))
    return seed.union(mapped)


def resolve_edges(
    vertices: Dataset, origin_dir: str, norm_dir: str, num_buckets: int = 8
) -> Dataset:
    """J3: canonical edge table (src, dst); unresolved + self-links dropped.

    Edge sources are the origin-table winners (the reference iterates
    PageOriginNameMap, wikiEntropy.go:234). Web-crawl input has unique urls
    (upstream crawl dedup), so the vertices ARE the winners; parallel edges
    are kept (multigraph, matching the reference's append semantics)."""

    def explode(t: pa.Table) -> pa.Table:
        links = t["links_out"]
        flat = pc.list_flatten(links)
        lens = pc.list_value_length(links).to_numpy(zero_copy_only=False)
        src = np.repeat(t["id"].to_numpy(zero_copy_only=False), lens)
        return pa.table(
            {"src": pa.array(src, pa.int64()),
             "key": pc.cast(flat, pa.large_string())}
        )

    cands = vertices.select_columns(["id", "links_out"]).map_batches(
        explode, batch_format="pyarrow"
    )
    res = chase(cands, origin_dir, norm_dir,
                advance_on_norm_redirect=True, num_buckets=num_buckets)
    return res.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    )
