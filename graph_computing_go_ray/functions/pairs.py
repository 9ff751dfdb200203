"""Vectorized within-group all-pairs generation.

Generating C(c,2) pairs per group with a Python loop over groups is the
dominant cost of co-occurrence/wedge stages (tens of thousands of tiny
groups). This kernel sorts once, finds group boundaries with np.diff, and
emits pairs per *distinct group size* with broadcast triu indices — pure
numpy, no per-group Python."""

from __future__ import annotations

import numpy as np


def group_starts_counts(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group boundaries of a sorted key array: (starts, counts)."""
    if len(sorted_keys) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    change = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    ends = np.concatenate([change, [len(sorted_keys)]]).astype(np.int64)
    return starts, ends - starts


def allpairs_with_group(
    sorted_keys: np.ndarray, sorted_vals: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """allpairs_by_group, plus per-pair group association: returns
    (a, b, group_size, group_start) so callers can derive per-pair weights
    from the emitting group (e.g. Adamic-Adar 1/log2(deg_center)) without a
    join — group_start indexes into sorted_keys for the group's key."""
    starts, counts = group_starts_counts(sorted_keys)
    out_a, out_b, out_c, out_s = [], [], [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        sel = counts == c
        g_starts = starts[sel]
        iu, iv = np.triu_indices(int(c), k=1)
        idx_a = (g_starts[:, None] + iu[None, :]).ravel()
        idx_b = (g_starts[:, None] + iv[None, :]).ravel()
        out_a.append(sorted_vals[idx_a])
        out_b.append(sorted_vals[idx_b])
        out_c.append(np.full(len(idx_a), c, dtype=np.int64))
        out_s.append(np.repeat(g_starts, len(iu)))
    if not out_a:
        e = np.array([], dtype=sorted_vals.dtype)
        z = np.array([], dtype=np.int64)
        return e, e.copy(), z, z.copy()
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_c), np.concatenate(out_s))


def allpairs_by_group(
    sorted_keys: np.ndarray, sorted_vals: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (vals[i], vals[j]) with i<j within each key-group.

    Inputs must be sorted by key (vals carry the within-group order, so a
    caller wanting canonical u<v pairs sorts vals within groups first).
    Returns (a, b) arrays."""
    starts, counts = group_starts_counts(sorted_keys)
    out_a, out_b = [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        g_starts = starts[counts == c]
        iu, iv = np.triu_indices(int(c), k=1)
        idx_a = (g_starts[:, None] + iu[None, :]).ravel()
        idx_b = (g_starts[:, None] + iv[None, :]).ravel()
        out_a.append(sorted_vals[idx_a])
        out_b.append(sorted_vals[idx_b])
    if not out_a:
        e = np.array([], dtype=sorted_vals.dtype)
        return e, e.copy()
    return np.concatenate(out_a), np.concatenate(out_b)
