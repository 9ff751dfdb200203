"""graph_computing_go_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of ``knogen/graph-computing-go``
(reference at /root/reference, read-only) on top of ``ray.data.Dataset``:

- ``sources/``   — readers + the deterministic synthetic web-pages generator
- ``stages/``    — map_batches stages (stateful extractor actor pool, resolution joins)
- ``functions/`` — vectorized scalar kernels (hashing, text stats, entropy math)
- ``engine/``    — graph kernels: degrees, entropies, rank/slice, shrink,
                   partitioned-superstep iteration (PageRank / CC / LPA), triangles
- ``pipelines/`` — composed analyses mirroring the reference's entry points plus
                   training-data ops (dedup, similarity, text analysis)
- ``state/``     — per-partition Parquet checkpoints with lineage manifests

Nothing in this package calls ``ray.init()`` — the caller owns the session.
"""

__version__ = "0.1.0"
