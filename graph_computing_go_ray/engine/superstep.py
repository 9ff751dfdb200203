"""Partitioned gather-scatter superstep engine — the [north-rule] iterative
core shared by PageRank, connected components and label propagation.

Design (north_star wording from BASELINE.json):
- Edges are hash-partitioned by ``src`` into per-partition CSR blocks
  (Arrow/Parquet, sorted by src within each partition).
- Vertex state lives as per-partition Parquet, one shard per partition,
  re-written every superstep (checkpoint + exchange medium in one).
- Each superstep is ONE Ray Data pipeline:
    edges.map_batches(gather)  — reads the state shard(s) for the source
      partitions in the block, computes per-edge messages, PRE-AGGREGATES
      them per destination inside the block (combiner), and tags each
      message row with part_dst = hash(dst) % P;
    .groupby("part_dst").map_groups(reduce)  — the single all-to-all
      shuffle; each group sums messages per dst, applies the vertex program
      against the old state shard, writes the new shard, and returns one
      metrics row.
- Skew: a hot dst receives at most (#edge blocks) partial rows, not
  (#in-edges) rows, because of the block-level combiner; the groupby key is
  part_dst (P uniform groups), so no single reducer sees a hot vertex's raw
  fan-in. This is the skew-aware salting of the north rule with the block
  id acting as the salt.
- The driver only sums tiny metrics frames and decides convergence; it
  writes a lineage manifest per superstep (state/checkpoint.py) so a killed
  job resumes mid-iteration.

At 256 nodes / 100 TB: P scales with cluster size (state shard ≈ |V|/P rows
must fit one worker), the workdir becomes an s3:// URI (all state I/O goes through
  pyarrow.fs, see state/checkpoint.py) so the exchange is shared storage,
and the edge Dataset stays materialized in the object store across
supersteps (the standard iterative-graph working set).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..functions.hashing import part_of
from ..state import checkpoint as ckpt


class VertexProgram:
    """Interface for a superstep program. All frames are pandas with exact
    int64 ids; state shards are sorted by id."""

    name = "program"
    message_schema: pa.Schema  # includes part_dst:int64, dst:int64 + payload

    def init_state(self, ids: np.ndarray, out_degree: np.ndarray,
                   in_degree: np.ndarray, n_total: int) -> pd.DataFrame:
        raise NotImplementedError

    def gather(self, edges: pd.DataFrame, state_of: dict[int, pd.DataFrame],
               global_vals: dict) -> pd.DataFrame:
        """edges: (src, dst, part) for one block; state_of: part -> shard."""
        raise NotImplementedError

    # Optional Arrow-native fast path: when a program defines
    #   gather_arrow(t: pa.Table, state_of, global_vals) -> dict[str, np.ndarray]
    # (keys = message payload columns incl. "dst"; part_dst added by the
    # engine) the superstep loop feeds it the zero-copy Arrow edge block
    # directly — no to_pandas copy of the edge columns and no
    # pandas->Arrow round-trip on the message output.
    gather_arrow = None

    def reduce_apply(self, state: pd.DataFrame, msgs: pd.DataFrame,
                     global_vals: dict) -> tuple[pd.DataFrame, dict]:
        """Returns (new_state, metrics). msgs excludes seed rows (dst==-1)."""
        raise NotImplementedError

    def globals_from_metrics(self, metrics: pd.DataFrame, n_total: int) -> dict:
        return {}

    def init_metrics(self, state: pd.DataFrame) -> dict:
        """Extra metrics recorded with the iteration-0 checkpoint (e.g. the
        initial dangling mass for PageRank)."""
        return {}

    def converged(self, metrics: pd.DataFrame) -> bool:
        raise NotImplementedError


def local_col(t: pa.Table, name: str) -> np.ndarray:
    """Column -> PROCESS-LOCAL numpy array (one forced copy). The gather
    kernels scan each column several times (unique/masks/searchsorted);
    over zero-copy views those scans re-read plasma-mmap'd pages, which is
    free on a quiet host but degrades under object-store pressure (the
    arrow-gather regression that motivated this). Interleaved A/B at 40M
    edges, num_cpus=32 (BASELINE §6): copy vs view superstep parity on a
    quiet host (ratio 0.98), views up to 1.3x slower under load — the one
    memcpy per column is cheap insurance, not a claimed speedup."""
    arr = t[name].to_numpy(zero_copy_only=False)
    return np.array(arr, copy=True) if arr.base is not None else arr


def _resolve_gather_arrow(program: VertexProgram):
    """The Arrow fast path is used ONLY when it is at least as derived as
    the pandas gather in the program's MRO. A subclass that overrides
    gather() but not gather_arrow() (e.g. a weighted variant of an
    arrow-enabled base) must get its own gather — an inherited
    gather_arrow would silently shadow the override with the BASE
    semantics (this exact bug shipped once; tests/test_graph_extras.py's
    weighted-PageRank parity test caught it)."""
    cls = type(program)
    ga = getattr(program, "gather_arrow", None)
    if ga is None:
        return None
    mro = cls.__mro__
    ga_owner = next((c for c in mro if "gather_arrow" in c.__dict__), None)
    g_owner = next((c for c in mro if "gather" in c.__dict__), None)
    if ga_owner is None:
        return None
    if g_owner is not None and mro.index(g_owner) < mro.index(ga_owner):
        return None  # pandas gather is more specific — prefer it
    return ga


_STATE_CACHE: dict[tuple, pd.DataFrame] = {}
_STATE_CACHE_MAX = 64


class _StateKeeper:
    """In-memory manifest part -> ObjectRef for the current iterations
    (round-3 verdict #5: vertex shards stay IN THE OBJECT STORE across
    supersteps; parquet is written only every persist_every-th iteration
    for resume). Shards are ray.put with _owner=keeper, so their lifetime
    is the keeper's dict, not the transient reduce worker; the keeper
    itself only serves tiny ref lookups — shard bytes move peer-to-peer
    through plasma. Scale path: keepers shard by part hash (a pool is
    created per run, sized with num_parts), so lookup traffic per keeper
    stays ~(workers x parts/len(pool)) per superstep."""

    def __init__(self):
        self._refs: dict[tuple[str, int, int], object] = {}

    def register(self, run_id: str, iteration: int, part: int,
                 wrapped: list) -> bool:
        self._refs[(run_id, iteration, part)] = wrapped[0]
        return True

    def lookup(self, run_id: str, iteration: int, part: int) -> list:
        return [self._refs.get((run_id, iteration, part))]

    def drop_before(self, run_id: str, iteration: int) -> int:
        old = [k for k in self._refs
               if k[0] == run_id and k[1] < iteration]
        for k in old:
            del self._refs[k]
        return len(old)

    def drop_run(self, run_id: str) -> int:
        old = [k for k in self._refs if k[0] == run_id]
        for k in old:
            del self._refs[k]
        return len(old)


_KEEPER_POOL: list = []


def _make_keepers(num_parts: int) -> list:
    """Session-cached keeper pool: actor startup (~0.5 s for the pool) is
    paid ONCE per Ray session, not per run_supersteps call — short
    superstep runs (katz/WL on small graphs) measured 2x slower with a
    fresh pool per run. Safe to share because every ref key carries the
    run_id nonce and runs drop_run() their keys at exit."""
    import ray as _ray

    global _KEEPER_POOL
    if _KEEPER_POOL:
        try:
            _ray.get([kp.lookup.remote("", -1, -1) for kp in _KEEPER_POOL])
            return _KEEPER_POOL
        except Exception:
            _KEEPER_POOL = []  # stale handles from a previous Ray session

    n = min(4, max(1, num_parts))
    actor = _ray.remote(num_cpus=0)(_StateKeeper)
    keepers = [actor.remote() for _ in range(n)]
    # block until every keeper is ALIVE: ray.put(_owner=keeper) raises
    # "actor not alive, worker_id is empty" if a reduce task races the
    # actor's startup (seen under a saturated test session)
    _ray.get([kp.lookup.remote("", -1, -1) for kp in keepers])
    _KEEPER_POOL = keepers
    return keepers


def _keeper_for(keepers: list, part: int):
    return keepers[part % len(keepers)]


def _read_state_any(workdir: str, iteration: int, part: int,
                    run_id: str, keepers: list | None) -> pd.DataFrame:
    """Shard read with the worker cache in front: object-store ref (via
    keeper lookup) first, parquet fallback (iter-0 seeds, resumed or
    persisted-only iterations)."""
    import ray as _ray

    key = (run_id, workdir, iteration, part)
    hit = _STATE_CACHE.get(key)
    if hit is not None:
        return hit.copy()
    df = None
    if keepers is not None:
        try:
            ref = _ray.get(_keeper_for(keepers, part).lookup.remote(
                run_id, iteration, part))[0]
            if ref is not None:
                obj = _ray.get(ref)
                df = obj.to_pandas() if isinstance(obj, pa.Table) else obj
        except Exception:
            # dead/killed keeper (or a ref it owned): fall back to the
            # last persisted parquet for this iteration — the documented
            # recovery path (tests/test_superstep.py keeper-loss test);
            # non-persisted iterations surface the read_part error below,
            # and a resumed run restarts from the latest manifest
            df = None
    if df is None:
        df = ckpt.read_part(workdir, iteration, part).to_pandas()
    if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
        _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
    _STATE_CACHE[key] = df
    return df.copy()


def _read_state(workdir: str, iteration: int, part: int,
                run_id: str = "legacy") -> pd.DataFrame:
    """Worker-local shard cache: Ray worker processes persist across tasks,
    so blocks of the same partition scheduled on one worker read the shard
    once per iteration. Keys include the run_id nonce (minted at state init)
    and the iteration, so a re-run over a reused workdir with resume=False
    can never serve shards of the previous run (ADVICE r1); a small FIFO
    cap bounds worker heap. Returns a defensive copy so an in-place
    mutating vertex program cannot corrupt the cached shard."""
    key = (run_id, workdir, iteration, part)
    hit = _STATE_CACHE.get(key)
    if hit is not None:
        return hit.copy()
    df = ckpt.read_part(workdir, iteration, part).to_pandas()
    if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
        _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
    _STATE_CACHE[key] = df
    return df.copy()


def _load_graph_meta(workdir: str) -> dict | None:
    """GRAPH.json through the checkpoint fs layer (URI-capable)."""
    import json

    from ..state import checkpoint as ckpt

    path = ckpt.join(workdir, "GRAPH.json")
    if not ckpt.exists(path):
        return None
    f, p = ckpt.get_fs(path)
    with f.open_input_stream(p) as inp:
        return json.loads(inp.read().decode())


def build_graph_partitions(
    edges: Dataset, workdir: str, num_parts: int, symmetrize: bool = False,
    edge_attrs: tuple[str, ...] = (),
) -> dict:
    """Write CSR edge partitions + degree-annotated vertex shards (iter-less
    base layout). Returns {n_vertices, n_edges, num_parts}. workdir may be a
    local path or a filesystem URI (file://, s3://) — state exchange then
    runs against shared storage on a multi-node cluster. `edge_attrs` names
    extra edge columns carried into the partitions (e.g. the HITS direction
    tag); they are visible to gather() alongside src/dst/part. Attrs and
    symmetrize are mutually exclusive (callers that need both prepare the
    doubled edge set themselves)."""
    if symmetrize and edge_attrs:
        raise ValueError("symmetrize and edge_attrs are mutually exclusive")
    ckpt.ensure_dir(workdir)

    def tag(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
                "part": pa.array(part_of(src, num_parts).astype(np.int64))}
        for c in edge_attrs:
            cols[c] = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        return pa.table(cols)

    tagged = edges.select_columns(
        ["src", "dst", *edge_attrs]
    ).map_batches(tag, batch_format="pyarrow")

    def csr_sort(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["src", "dst"], ignore_index=True)

    tagged.groupby("part").map_groups(csr_sort, batch_format="pandas").write_parquet(
        ckpt.join(workdir, "edges"), partition_cols=["part"], mode="overwrite"
    )

    # vertex shards with degrees (multigraph counts, matching engine/entropy)
    from .entropy import degree_table

    e = rd.read_parquet(ckpt.join(workdir, "edges"), columns=["src", "dst"])
    deg = degree_table(e)

    def vtag(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(part_of(ids, num_parts).astype(np.int64)))

    vparts = deg.map_batches(vtag, batch_format="pyarrow")

    def vwrite(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        g = g.sort_values("id", ignore_index=True)
        ckpt.ensure_dir(ckpt.join(workdir, "base"))
        ckpt.write_table_at(
            ckpt.join(workdir, "base", f"part-{p:05d}.parquet"),
            pa.Table.from_pandas(
                g[["id", "in_degree", "out_degree"]], preserve_index=False
            ),
        )
        return pd.DataFrame({"part": [p], "n": [len(g)]})

    stats = vparts.groupby("part").map_groups(vwrite, batch_format="pandas").to_pandas()
    n_vertices = int(stats["n"].sum())
    n_edges = e.count()
    info = {"n_vertices": n_vertices, "n_edges": n_edges, "num_parts": num_parts,
            "parts": sorted(int(p) for p in stats["part"])}
    import json

    fs_, gp = ckpt.get_fs(ckpt.join(workdir, "GRAPH.json"))
    with fs_.open_output_stream(gp) as f:
        f.write(json.dumps(info).encode())
    return info


def load_edge_blocks(workdir: str, num_parts: int) -> Dataset:
    """Materialize the CSR edge partitions with a block count matched to the
    cluster. The per-superstep sort-shuffle's fixed cost grows with the
    number of MESSAGE blocks (= edge blocks), so the many small per-part
    files are coalesced down to max(num_parts, cluster CPUs) blocks —
    measured 3.4x off the superstep floor at sf0.1 (90 blocks -> 32:
    0.99 s -> 0.29 s per superstep). Coalescing never builds oversized
    blocks at scale: the target block count is floored by the dataset's
    byte size over DataContext.target_max_block_size."""
    import ray
    from ray.data import DataContext

    ds = rd.read_parquet(ckpt.join(workdir, "edges")).materialize()
    cpus = 0
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 0))
    floor_blocks = max(num_parts, cpus or num_parts)
    tgt = DataContext.get_current().target_max_block_size or (128 << 20)
    need_for_size = -(-(ds.size_bytes() or 0) // tgt)
    target = max(floor_blocks, int(need_for_size))
    if ds.num_blocks() > target:
        ds = ds.repartition(target).materialize()
    return ds


def _init_state(workdir: str, program: VertexProgram, info: dict) -> str:
    """Seed iter-0 state shards; returns the minted run_id nonce (recorded
    in the manifest so resumed runs key the worker shard cache the same)."""
    import uuid

    run_id = uuid.uuid4().hex
    ckpt.ensure_dir(ckpt.state_dir(workdir, 0))
    n_total = info["n_vertices"]

    def init_part(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p in batch["part"]:
            p = int(p)
            df = ckpt.read_table_at(
                ckpt.join(workdir, "base", f"part-{p:05d}.parquet")
            ).to_pandas()
            st = program.init_state(
                df["id"].to_numpy(), df["out_degree"].to_numpy(),
                df["in_degree"].to_numpy(), n_total,
            )
            ckpt.write_part(workdir, 0, p,
                            pa.Table.from_pandas(st, preserve_index=False))
            m0 = {"part": p, "n": len(st)}
            m0.update(program.init_metrics(st))
            rows.append(m0)
        return pd.DataFrame(rows)

    # distributed seed: one Ray task per part writes its iter-0 shard
    # (the vwrite pattern of build_graph_partitions); the driver only
    # collects the tiny metrics frame — no O(|V|) bytes through one process
    mdf = (
        rd.from_items([{"part": int(p)} for p in info["parts"]])
        .map_batches(init_part, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    metrics_rows = [
        {k: (v.item() if hasattr(v, "item") else v) for k, v in rec.items()}
        for rec in mdf.sort_values("part").to_dict("records")
    ]
    ckpt.write_manifest(
        workdir, 0,
        {"iteration": 0, "parent": None, "program": program.name,
         "run_id": run_id, "metrics": metrics_rows, "converged": False},
    )
    return run_id


def run_supersteps(
    edges_ds: Dataset,
    workdir: str,
    program: VertexProgram,
    info: dict,
    max_iters: int = 50,
    resume: bool = True,
    object_state: bool = True,
    persist_every: int = 8,
) -> dict:
    """Run the program to convergence (or max_iters). Returns run info with
    per-superstep wall-times and edges/sec. Resumes from the latest complete
    checkpoint when `resume`.

    object_state: vertex shards ride the Ray object store between
    supersteps (a _StateKeeper pool maps (iteration, part) -> ObjectRef,
    shards are put with _owner=keeper); parquet state is written only
    every ``persist_every`` iterations plus the final one, and every
    iteration still writes its lineage MANIFEST (with state_persisted
    marking which iterations resume can start from). Loss of the keeper
    (driver restart) falls back to the latest persisted iteration — the
    object layer is a cache, parquet stays the durable medium.
    object_state=False restores the write-every-superstep behavior."""
    num_parts = info["num_parts"]
    parts = info["parts"]
    n_total = info["n_vertices"]
    n_edges = info["n_edges"]

    start_iter = ckpt.latest_complete_iteration(workdir) if resume else None
    if start_iter is None:
        _init_state(workdir, program, info)
        start_iter = 0
    # run_id nonce from the lineage root: resumed runs share it (their
    # shards ARE valid cache entries); fresh runs over a reused workdir get
    # a new one, so workers can never serve the previous run's shards
    run_id = ckpt.read_manifest(workdir, 0).get("run_id", "legacy")
    keepers = _make_keepers(num_parts) if object_state else None

    def _seed_val(name: str, typ: pa.DataType, p: int):
        if name == "part_dst":
            return p
        if name == "dst":
            return -1
        return b"" if (pa.types.is_binary(typ) or pa.types.is_large_binary(typ)
                       or pa.types.is_fixed_size_binary(typ)) else 0

    seed = pa.Table.from_pydict(
        {name: pa.array([_seed_val(name, typ, p) for p in parts], typ)
         for name, typ in zip(program.message_schema.names, program.message_schema.types)},
        schema=program.message_schema,
    )

    manifest = ckpt.read_manifest(workdir, start_iter)
    metrics = pd.DataFrame(manifest["metrics"])
    global_vals = program.globals_from_metrics(metrics, n_total)
    timings = []
    k = start_iter
    converged = manifest.get("converged", False)
    while not converged and k < max_iters:
        t0 = time.time()
        msg_schema = program.message_schema

        arrow_gather = _resolve_gather_arrow(program)

        def gather_fn(t: pa.Table, _k=k, _gv=global_vals) -> pa.Table:
            if arrow_gather is not None:
                part_arr = t["part"].to_numpy(zero_copy_only=False)
                state_of = {
                    int(p): _read_state_any(workdir, _k, int(p), run_id,
                                            keepers)
                    for p in np.unique(part_arr)
                }
                cols = arrow_gather(t, state_of, _gv)
                cols["part_dst"] = part_of(
                    np.asarray(cols["dst"]), num_parts
                ).astype(np.int64)
                return pa.table(
                    {n: pa.array(cols[n], type=msg_schema.field(n).type)
                     for n in msg_schema.names}
                )
            df = t.to_pandas()
            state_of = {
                int(p): _read_state_any(workdir, _k, int(p), run_id, keepers)
                for p in df["part"].unique()
            }
            out = program.gather(df, state_of, _gv)
            out["part_dst"] = part_of(out["dst"].to_numpy(), num_parts).astype(np.int64)
            return pa.Table.from_pandas(
                out[msg_schema.names], preserve_index=False
            ).cast(msg_schema)

        def gather_with_seeds(t: pa.Table, _g=gather_fn) -> pa.Table:
            # every block appends the per-part seed rows (dst=-1), so each
            # part_dst group exists even when a part receives no messages;
            # duplicates are harmless (reduce filters dst != -1) and this
            # saves the per-superstep union stage — one fewer operator in
            # the scheduling floor
            return pa.concat_tables([_g(t), seed])

        # batch_size=None = one batch per BLOCK: the combiner then emits at
        # most (#edge blocks) partial rows per hot dst instead of
        # (#1024-row batches) — maximal pre-shuffle combining (the skew
        # bound tests/test_superstep.py asserts), and edge blocks are
        # already sized by load_edge_blocks to fit worker heaps
        msgs = edges_ds.map_batches(gather_with_seeds, batch_format="pyarrow",
                                    batch_size=None)
        if n_edges == 0:
            # empty edge table -> no gather calls; keep the explicit seed
            msgs = msgs.union(rd.from_arrow(seed))

        persist = (keepers is None) or ((k + 1) % persist_every == 0)

        def reduce_fn(g: pd.DataFrame, _k=k, _gv=global_vals,
                      _persist=persist) -> pd.DataFrame:
            import ray as _ray

            p = int(g["part_dst"].iloc[0])
            real = g[g["dst"] != -1]
            state = _read_state_any(workdir, _k, p, run_id, keepers)
            new_state, m = program.reduce_apply(state, real, _gv)
            # skew observability: the block-level combiner bounds a hot
            # dst's fan-in to (#edge blocks) partial rows; this metric
            # makes that bound assertable (tests/test_superstep.py skew
            # probe) and visible in every lineage manifest
            m["n_msg_rows"] = int(len(real))
            m["max_dst_rows"] = (
                int(real["dst"].value_counts().max()) if len(real) else 0
            )
            tbl = pa.Table.from_pandas(new_state, preserve_index=False)
            if _persist:
                ckpt.write_part(workdir, _k + 1, p, tbl)
            if keepers is not None:
                keeper = _keeper_for(keepers, p)
                ref = _ray.put(tbl, _owner=keeper)
                # block until the keeper holds the ref: the creating
                # worker's reference must outlive the handoff
                _ray.get(keeper.register.remote(run_id, _k + 1, p, [ref]))
            m["part"] = p
            return pd.DataFrame([m])

        metrics = (
            msgs.groupby("part_dst").map_groups(reduce_fn, batch_format="pandas")
            .to_pandas()
        )
        dt = time.time() - t0
        k += 1
        global_vals = program.globals_from_metrics(metrics, n_total)
        converged = program.converged(metrics)
        timings.append(
            {"iteration": k, "sec": dt, "edges_per_sec": n_edges / dt if dt > 0 else None}
        )
        ckpt.write_manifest(
            workdir, k,
            {"iteration": k, "parent": k - 1, "program": program.name,
             "params": getattr(program, "params", {}),
             "metrics": metrics.to_dict("records"),
             "sec": dt, "edges_per_sec": n_edges / max(dt, 1e-9),
             "state_persisted": bool(persist),
             "converged": bool(converged)},
        )
        if keepers is not None:
            # evict shard refs two iterations back (gather of iter k+1
            # reads k; nothing reads k-1 anymore) — frees plasma objects
            for kp in keepers:
                kp.drop_before.remote(run_id, k - 1)

    if keepers is not None and k > start_iter:
        last_manifest = ckpt.read_manifest(workdir, k)
        if not last_manifest.get("state_persisted", True):
            # flush the final in-memory iteration to parquet so
            # final_state() and resume see it (distributed: one task/part)
            def flush_part(batch: pd.DataFrame, _k=k) -> pd.DataFrame:
                import ray as _ray

                rows = []
                for p in batch["part"]:
                    p = int(p)
                    ref = _ray.get(_keeper_for(keepers, p).lookup.remote(
                        run_id, _k, p))[0]
                    ckpt.write_part(workdir, _k, p, _ray.get(ref))
                    rows.append({"part": p})
                return pd.DataFrame(rows)

            (rd.from_items([{"part": int(p)} for p in parts])
             .map_batches(flush_part, batch_format="pandas", batch_size=1)
             .materialize())
            last_manifest["state_persisted"] = True
            ckpt.write_manifest(workdir, k, last_manifest)

    if keepers is not None:
        # release this run's shard refs from the shared session pool
        # (fire-and-forget; objects free once the keeper drops them)
        for kp in keepers:
            kp.drop_run.remote(run_id)

    return {
        "iterations": k, "converged": bool(converged), "timings": timings,
        "final_iter": k, "n_edges": n_edges, "n_vertices": n_total,
    }


def final_state(workdir: str, iteration: int | None = None) -> Dataset:
    it = iteration if iteration is not None else ckpt.latest_complete_iteration(workdir)
    return rd.read_parquet(ckpt.state_dir(workdir, it), file_extensions=["parquet"])
