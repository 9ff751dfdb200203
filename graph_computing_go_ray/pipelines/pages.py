"""End-to-end link-graph build: pages parquet → extract (actor pool) →
resolution joins → canonical edges/vertices parquet.

Ray shape of the reference's wiki-extract + pageLinkHandle stages
(SURVEY §3.1-3.2): read_parquet → map_batches(ExtractorActor) → J1/J2/J3
bucketed joins → write_parquet. Outputs go to deterministic subdirs with a
marker so a rerun skips finished work (K3 task-ledger analog,
/root/reference/internal/extractWikipediadump/mongoClient.go:65-79)."""

from __future__ import annotations


import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..engine.join import bucket_join
from ..stages.extract import ExtractorActor
from ..stages.resolve import (
    resolve_edges,
    resolve_redirect_ids,
    vertices_from_extracted,
    write_resolution_buckets,
)


def build_link_graph(
    pages_dir: str,
    out_dir: str,
    num_buckets: int = 8,
    extract_concurrency: int | tuple[int, int] = (1, 8),
    extract_batch_size: int = 1024,
    force: bool = False,
) -> dict[str, str]:
    """Returns dict of output parquet dirs: extracted, failed, vertices, edges.

    out_dir may be a URI (file://, s3://); every marker/bucket/table write
    goes through the checkpoint fs layer so a multi-node job sees one
    shared build (VERDICT r4 #1)."""
    from ..state import checkpoint as ckpt

    paths = {k: ckpt.join(out_dir, k) for k in ("extracted", "failed", "vertices", "edges")}
    marker = ckpt.join(out_dir, "_SUCCESS")
    if ckpt.exists(marker) and not force:
        return paths

    # Stage 1: extraction (stateful actor pool); ok/fail split (K1/K2 sinks)
    # is written from one materialized pass — html is never read twice.
    # concurrency is an autoscaling (min,max) so the pool can never reserve
    # every CPU and starve the upstream read (deadlocks a small cluster).
    pages = rd.read_parquet(
        pages_dir,
        columns=["url", "warc_ts", "lang", "html", "core_subject_tag"],
    )
    extracted_all = pages.map_batches(
        ExtractorActor, batch_format="pyarrow", batch_size=extract_batch_size,
        concurrency=extract_concurrency,
    ).materialize()
    extracted_all.filter(expr="ok == True").drop_columns(["ok"]).write_parquet(
        paths["extracted"], mode="overwrite"
    )
    extracted_all.filter(expr="ok == False").select_columns(["url"]).write_parquet(
        paths["failed"], mode="overwrite"
    )

    # Stage 2: resolution tables bucketed once; chase shuffles only actives
    extracted = rd.read_parquet(
        paths["extracted"], columns=["url", "links_out", "redirect"]
    )
    vertices = vertices_from_extracted(extracted).materialize()
    origin_dir, norm_dir = write_resolution_buckets(vertices, out_dir, num_buckets)

    red_ids = resolve_redirect_ids(vertices, origin_dir, norm_dir, num_buckets)
    vert_out = bucket_join(
        vertices.select_columns(["id", "url", "redirect"]),
        red_ids, on="id", right_on="id", how="left", num_buckets=num_buckets,
    )
    vert_out.write_parquet(paths["vertices"], mode="overwrite")

    edges = resolve_edges(vertices, origin_dir, norm_dir, num_buckets)
    edges.write_parquet(paths["edges"], mode="overwrite")

    mf, mp = ckpt.get_fs(marker)
    with mf.open_output_stream(mp) as out:
        out.write(b"ok")
    return paths


def graph_edges(paths: dict[str, str]) -> Dataset:
    return rd.read_parquet(paths["edges"], columns=["src", "dst"])


def graph_vertices(paths: dict[str, str]) -> Dataset:
    return rd.read_parquet(paths["vertices"])


def host_edges(paths: dict[str, str], num_buckets: int = 8) -> Dataset:
    """Host-level webgraph: collapse the resolved page edge table to
    (src_host, dst_host, n_links) — the Common-Crawl-style host graph a
    crawler publishes alongside the page graph (host = url authority).

    Scale shape: the id→host map is the VERTEX table (fact-scale), so both
    endpoint hops are bucketed joins — never a broadcast; the collapse is
    per-batch grouped partials + one bucketed sum over the (tiny)
    host×host key space."""
    from ..engine.join import bucket_grouped_sum, rename

    verts = rd.read_parquet(paths["vertices"], columns=["id", "url"])

    def hostify(t):
        import pyarrow as pa

        hosts = pc.extract_regex(t["url"], r"^[a-z]+://(?P<host>[^/]+)")
        return pa.table({"hid": t["id"],
                         "host": pc.struct_field(hosts, "host")})

    hmap = verts.map_batches(hostify, batch_format="pyarrow").materialize()
    e = graph_edges(paths)
    e1 = rename(
        bucket_join(e, hmap, on="src", right_on="hid", how="inner",
                    num_buckets=num_buckets),
        {"host": "src_host"},
    )
    e2 = rename(
        bucket_join(e1, hmap, on="dst", right_on="hid", how="inner",
                    num_buckets=num_buckets),
        {"host": "dst_host"},
    )

    def partial(t):
        import pandas as pd
        import pyarrow as pa

        df = pd.DataFrame({"src_host": t["src_host"].to_pylist(),
                           "dst_host": t["dst_host"].to_pylist()})
        out = df.groupby(["src_host", "dst_host"], as_index=False).size()
        return pa.Table.from_pandas(out.rename(columns={"size": "n_links"}),
                                    preserve_index=False)

    agg = bucket_grouped_sum(
        e2.map_batches(partial, batch_format="pyarrow"),
        ["src_host", "dst_host"], ["n_links"], num_buckets=num_buckets,
    )
    import pyarrow as pa

    return agg.map_batches(
        lambda t: t.cast(pa.schema([("src_host", pa.string()),
                                    ("dst_host", pa.string()),
                                    ("n_links", pa.int64())])),
        batch_format="pyarrow",
    )


def non_redirect_edges(paths: dict[str, str], num_buckets: int = 8) -> Dataset:
    """Edges whose source is a non-redirect vertex — the edge set every
    degree/entropy stage consumes (reference skips redirect sources,
    wikiEntropy.go:77-79)."""
    verts = rd.read_parquet(paths["vertices"], columns=["id", "redirect"])
    keep = verts.map_batches(
        lambda t: t.filter(pc.is_null(t["redirect"])).select(["id"]),
        batch_format="pyarrow",
    ).rename_columns({"id": "vid"})
    return bucket_join(
        graph_edges(paths), keep, on="src", right_on="vid", how="inner",
    ).select_columns(["src", "dst"])


def _host_id_edges(he: Dataset) -> Dataset:
    """(src, dst, w) int64-id weighted edges from a (src_host, dst_host,
    n_links) host table — hosts hashed with the shared string hash."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_strings

    def to_ids(t: pa.Table) -> pa.Table:
        s = t["src_host"].to_pylist()
        d = t["dst_host"].to_pylist()
        return pa.table({
            "src": pa.array(hash_strings(np.array(s, object)), pa.int64()),
            "dst": pa.array(hash_strings(np.array(d, object)), pa.int64()),
            "w": pa.array(t["n_links"].to_numpy(zero_copy_only=False)
                          .astype(np.float64)),
        })

    return he.map_batches(to_ids, batch_format="pyarrow")


def _host_name_ds(he: Dataset):
    """(hid, host) dedup'd name map Dataset for joining ids back to
    host strings (host tables are host-cardinality — bounded)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.hashing import hash_strings

    def name_rows(t: pa.Table) -> pa.Table:
        hosts = (t["src_host"].to_pylist() + t["dst_host"].to_pylist())
        hu = sorted(set(hosts))
        return pa.table({
            "hid": pa.array(hash_strings(np.array(hu, object)), pa.int64()),
            "host": pa.array(hu, pa.string()),
        })

    hmap = he.map_batches(name_rows, batch_format="pyarrow").to_pandas()
    hmap = hmap.drop_duplicates("hid")
    return rd.from_arrow(pa.Table.from_pandas(hmap, preserve_index=False))


def host_pagerank(
    paths: dict[str, str], workdir: str, num_buckets: int = 8,
    tol: float = 1e-10, max_iters: int = 100,
) -> Dataset:
    """Weighted PageRank at HOST granularity: collapse the page graph to
    the host webgraph (host_edges) and rank hosts with link counts as
    edge weights — the host-authority score a crawler derives from the
    Common-Crawl host graph. Intra-host self-links are kept (they hold
    mass at the host, matching the host-graph convention; the page-level
    build drops page self-links before this point). Returns
    (host, rank)."""
    from ..engine.join import bucket_join
    from ..engine.wpagerank import weighted_pagerank

    he = host_edges(paths, num_buckets=num_buckets).materialize()
    ranks, _info = weighted_pagerank(
        _host_id_edges(he), workdir,
        tol=tol, max_iters=max_iters, num_parts=num_buckets,
    )
    return bucket_join(
        ranks, _host_name_ds(he),
        on="id", right_on="hid", how="inner", num_buckets=num_buckets,
    ).select_columns(["host", "rank"])


def host_trustrank(
    paths: dict[str, str], workdir: str, num_buckets: int = 8,
    n_seeds: int = 3, tol: float = 1e-10, max_iters: int = 100,
) -> Dataset:
    """TrustRank + relative spam mass over the host webgraph (Gyöngyi et
    al. 2004, engine/trustrank.py): rank hosts with weighted PageRank,
    take the top `n_seeds` hosts as the trusted seed set (the paper uses
    inverse-PageRank + human review; the deterministic proxy here is the
    high-authority head, a standard choice when no labels exist), run
    seeded weighted TrustRank from them, and report per host
        spam_mass = round((rank - trust) / rank, 9)
    (negative = better-trusted than its raw authority; large positive =
    authority not reachable from trusted seeds — the spam signal).
    Returns (host, rank, trust, spam_mass).

    Scale notes: both iterations run on the same superstep engine; the
    seed pick is a per-block partial top-k + a (k × n_blocks)-row driver
    reduce — never a global sort; joins are bucketed on the host id."""
    import numpy as np
    import pyarrow as pa

    from ..engine.join import bucket_join, rename
    from ..engine.trustrank import weighted_trustrank
    from ..engine.wpagerank import weighted_pagerank

    he = host_edges(paths, num_buckets=num_buckets).materialize()
    ids = _host_id_edges(he).materialize()
    pr, _ = weighted_pagerank(
        ids, f"{workdir}/pr", tol=tol, max_iters=max_iters,
        num_parts=num_buckets,
    )
    pr = pr.materialize()

    def topk_part(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        i = t["id"].to_numpy(zero_copy_only=False)
        keep = np.lexsort((i, -r))[:n_seeds]
        return pa.table({"id": pa.array(i[keep], pa.int64()),
                         "rank": pa.array(r[keep], pa.float64())})

    cand = pr.map_batches(topk_part, batch_format="pyarrow").to_pandas()
    order = np.lexsort((cand["id"].to_numpy(), -cand["rank"].to_numpy()))
    seeds = np.sort(cand["id"].to_numpy()[order[:n_seeds]])

    tr, _ = weighted_trustrank(
        ids, f"{workdir}/tr", seeds, tol=tol, max_iters=max_iters,
        num_parts=num_buckets,
    )
    both = bucket_join(
        pr, rename(tr, {"id": "tid", "rank": "trust"}),
        on="id", right_on="tid", how="inner", num_buckets=num_buckets,
    )

    def mass(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        tru = t["trust"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": t["id"],
            "rank": pa.array(np.round(r, 9)),
            "trust": pa.array(np.round(tru, 9)),
            "spam_mass": pa.array(np.round((r - tru) / r, 9)),
        })

    return bucket_join(
        both.map_batches(mass, batch_format="pyarrow"), _host_name_ds(he),
        on="id", right_on="hid", how="inner", num_buckets=num_buckets,
    ).select_columns(["host", "rank", "trust", "spam_mass"])
