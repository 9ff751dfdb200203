"""Deterministic synthetic OpenAlex-style works table (FIXTURES.md F4).

Mirrors worksMongo (/root/reference/internal/openAlexEntropy/model.go:3-12):
id, publication_year, referenced_works (mostly backward-citing with a few
forward-citing edges so the per-year shrink matters,
openAlexEntropy.go:341-363), links_in_works (true global in-degree),
concepts_lv0/1/2 from the 19-subject list
(internal/wikiEntropy/wikiSubjectEntropy.go:14-17)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SUBJECTS = [
    "Mathematics", "Physics", "Chemistry", "Biology", "Computer science",
    "Medicine", "Economics", "Engineering", "Psychology", "Geography",
    "Geology", "History", "Materials science", "Philosophy",
    "Political science", "Sociology", "Art", "Business", "Environmental science",
]


def generate_works(
    out_dir: str, n_works: int = 2000, seed: int = 42,
    year_lo: int = 2000, year_hi: int = 2024, force: bool = False,
    subjects: list[str] | None = None,
) -> str:
    """`subjects` narrows the tag universe (default: all 19) — a small list
    concentrates membership so per-discipline citation subgraphs stay dense
    enough for in-degree gather filters at small n_works."""
    if subjects is None:
        subjects = SUBJECTS
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = f"{n_works}-{seed}-{year_lo}-{year_hi}-s{len(subjects)}-v1"
    if not force and os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    ids = np.arange(1, n_works + 1, dtype=np.int64)
    # more recent works (growth): year drawn with quadratic weight
    w = np.linspace(1, 3, year_hi - year_lo + 1) ** 2
    years = rng.choice(
        np.arange(year_lo, year_hi + 1), size=n_works, p=w / w.sum()
    ).astype(np.int32)
    order = np.argsort(years, kind="stable")
    years = years[order]  # ids stay 1..n; years sorted so refs skew backward

    refs: list[list[int]] = []
    for i in range(n_works):
        k = int(rng.zipf(1.7)) % 8
        if i == 0 or k == 0:
            refs.append([])
            continue
        # cite earlier works (preferential: zipf over index), ~5% forward
        tgt = []
        for _ in range(k):
            if rng.rand() < 0.05 and i < n_works - 1:
                j = int(rng.randint(i + 1, n_works))
            else:
                j = i - 1 - (int(rng.zipf(1.3)) - 1) % max(1, i)
            if j != i:
                tgt.append(int(ids[j]))
        refs.append(sorted(set(tgt)))

    indeg = np.zeros(n_works + 1, dtype=np.int32)
    for r in refs:
        for t in r:
            indeg[t] += 1

    lv0, lv1, lv2 = [], [], []
    for i in range(n_works):
        k = 1 + (int(rng.zipf(2.5)) - 1) % min(3, len(subjects))
        subs = list(rng.choice(len(subjects), size=k, replace=False))
        lv0.append([subjects[s] for s in subs])
        lv1.append([f"{subjects[s]}-L1-{int(rng.randint(0, 4))}" for s in subs])
        lv2.append([f"{subjects[s]}-L2-{int(rng.randint(0, 8))}" for s in subs])

    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "publication_year": pa.array(years, pa.int32()),
        "referenced_works": pa.array(refs, pa.large_list(pa.int64())),
        "links_in_works": pa.array(indeg[1:], pa.int32()),
        "concepts_lv0": pa.array(lv0, pa.large_list(pa.large_string())),
        "concepts_lv1": pa.array(lv1, pa.large_list(pa.large_string())),
        "concepts_lv2": pa.array(lv2, pa.large_list(pa.large_string())),
    })
    pq.write_table(t, os.path.join(out_dir, "works.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir
