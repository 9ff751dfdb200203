"""10x scale drill (round-3 verdict #4): run the headline build+PageRank
and the five heaviest BENCH queries at sf1 (= 10x the bench's sf0.1 data)
on 32 CPUs, and compare wall-times against the same queries at sf0.1 in
the same session.

sf1 tables are synthesized DETERMINISTICALLY from the driver's sf0.1
parquet (no external data): 10 replicas with id offsets — documents get a
per-replica suffix token, so replicas are NEAR-duplicates (10-doc
cross-replica families — the realistic crawl shape) rather than exact
byte-copies; lineitem
offsets l_orderkey/l_partkey by a stride, so the co-occurrence and chain
graphs become 10 disjoint copies (10x vertices/edges/triangles).

Usage: python scale_drill.py  (prints one JSON line at the end; the
results are recorded in BASELINE.md §7).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = "/tmp/gcgr_sf1"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
DOC_STRIDE = 1_000_000
LI_STRIDE = 10_000_000
REPLICAS = 10

QUERIES = ["jaccard_topk", "near_dup_clusters", "dup_span_fraction",
           "triangle_count", "tfidf_top_terms",
           # round-4 hybrid additions (VERDICT r4 #5): the 10x input pushes
           # the chain graph past the local cutoffs, so these exercise the
           # local->distributed handover the hybrids rely on
           "louvain_chain_two_level", "scc_chain", "bowtie_chain",
           "dedup_cut_spans"]


def synthesize_sf1() -> str:
    marker = os.path.join(SF1_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return SF1_DIR
    os.makedirs(SF1_DIR, exist_ok=True)

    docs = pq.read_table(os.path.join(SF01, "documents.parquet"))
    outs = []
    for k in range(REPLICAS):
        t = docs
        did = t["doc_id"].to_numpy(zero_copy_only=False) + k * DOC_STRIDE
        txt = t["text"].to_pylist()
        if k > 0:
            txt = [s + f" rep{k}" for s in txt]
        outs.append(pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "text": pa.array(txt, pa.string()),
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.array(
                np.asarray([len(s) for s in txt], np.int64)),
        }))
    pq.write_table(pa.concat_tables(outs),
                   os.path.join(SF1_DIR, "documents.parquet"))

    li = pq.read_table(os.path.join(SF01, "lineitem.parquet"))
    outs = []
    for k in range(REPLICAS):
        cols = {}
        for name in li.schema.names:
            arr = li[name]
            if name in ("l_orderkey", "l_partkey"):
                cols[name] = pa.array(
                    arr.to_numpy(zero_copy_only=False) + k * LI_STRIDE,
                    pa.int64())
            else:
                cols[name] = arr.combine_chunks() \
                    if isinstance(arr, pa.ChunkedArray) else arr
        outs.append(pa.table(cols))
    pq.write_table(pa.concat_tables(outs),
                   os.path.join(SF1_DIR, "lineitem.parquet"))

    # the remaining tables are not inputs of the drill queries but are
    # linked as-is so read_table(sf_dir, ...) paths resolve uniformly
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "events", "embeddings"):
        src = os.path.join(SF01, f"{t}.parquet")
        dst = os.path.join(SF1_DIR, f"{t}.parquet")
        if not os.path.exists(dst):
            os.link(src, dst)
    open(marker, "w").close()
    return SF1_DIR


def object_store_stats() -> dict:
    import ray

    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        return {"memory_summary": s.strip().split("\n")[-6:]}
    except Exception as e:  # stats are best-effort
        return {"memory_summary_error": str(e)}


def main() -> None:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    synthesize_sf1()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as M
    from tests.util import to_pandas

    q = M.queries()
    res: dict = {"num_cpus": NUM_CPUS, "replicas": REPLICAS, "queries": {}}

    for name in QUERIES:
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1_DIR)):
            t0 = time.time()
            out = to_pandas(q[name](sf_dir))
            row[label] = {"sec": round(time.time() - t0, 2),
                          "rows": int(len(out))}
        row["ratio"] = round(row["sf1"]["sec"] / max(row["sf0.1"]["sec"],
                                                     1e-9), 2)
        res["queries"][name] = row
        print(f"{name}: sf0.1 {row['sf0.1']['sec']}s/"
              f"{row['sf0.1']['rows']}r -> sf1 {row['sf1']['sec']}s/"
              f"{row['sf1']['rows']}r (x{row['ratio']})", flush=True)

    # headline at 10x pages (2M): build link graph + PageRank to 1e-6
    import bench

    t0 = time.time()
    head = bench.headline(1.0)
    res["headline_sf1"] = head
    res["headline_sf1"]["total_sec"] = round(time.time() - t0, 2)
    res["object_store"] = object_store_stats()
    print("HEADLINE sf1:", json.dumps(head), flush=True)
    print(json.dumps(res), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
