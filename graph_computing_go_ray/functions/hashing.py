"""Stable, vectorized 64-bit hashing used for vertex-id assignment and
hash partitioning.

Vertex ids are derived from url/title strings with a stable 64-bit hash
(``pandas.util.hash_array``, C-vectorized, fixed key) instead of a global
zip-with-index: at 10^12 pages a dense-id assignment is an extra all-to-all
sort, while hashing is embarrassingly parallel and deterministic across
runs/processes — the property the resumable checkpoints rely on.
Partition assignment uses a splitmix64 finalizer so that partition counts
that share factors with the id distribution still spread uniformly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Mask to keep ids positive int64 (the reference treats id>0 as "resolved";
# see /root/reference/internal/wikiEntropy/wikiEntropy.go:266).
_POS63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def hash_strings(values, key: str | None = None) -> np.ndarray:
    """Stable positive int64 hash of an array of strings (vectorized).

    `key` selects an independent 16-byte hash key (second hash channel for
    collision-free dedup grouping without shuffling the raw strings)."""
    arr = np.asarray(values, dtype=object)
    if key is None:
        h = pd.util.hash_array(arr, categorize=False)  # uint64, stable
    else:
        h = pd.util.hash_array(arr, categorize=False, hash_key=key)
    return (h & _POS63).astype(np.int64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain algorithm)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return z


def part_of(ids, num_parts: int) -> np.ndarray:
    """Partition id in [0, num_parts) for int64 vertex ids."""
    u = np.asarray(ids).astype(np.int64).view(np.uint64)
    return (splitmix64(u) % np.uint64(num_parts)).astype(np.int32)


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) coefficient vectors for num_perm universal-hash permutations."""
    rng = np.random.RandomState(seed)
    mersenne = np.uint64((1 << 61) - 1)
    a = rng.randint(1, mersenne, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, mersenne, size=num_perm, dtype=np.uint64)
    return a, b
