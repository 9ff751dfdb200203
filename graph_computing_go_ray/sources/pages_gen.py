"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
    url:large_string, warc_ts:timestamp[us], html:large_binary,
    text:large_string, lang:string

The generator composes each page's ``html`` and the byte-exact expected
extraction ``text`` from the same parts, so "the fixture generator IS the
reference extractor" — the per-url byte-identical invariant of the north
rule is testable against the stored column.

Structure (seed-deterministic):
- out-links drawn Zipf(s≈1.1) over page indices → heavy-hitter dsts
  (exercises skew/salting paths);
- ~5% redirect pages (html carries only a <meta refresh>), redirect chains
  of length 1-4 (so the ≤3-hop chase both resolves and gives up,
  /root/reference/internal/wikiEntropy/wikiEntropy.go:187-231);
- some links use an UPPERCASED path → exact-url lookup misses, normalized
  lookup hits (J1 dual-index semantics);
- a few self-links and links to nonexistent urls (must be dropped,
  wikiEntropy.go:266);
- ~1% malformed pages (no <title>) → extraction-failure side output
  (K2 revision_fail analog);
- warc_ts spread over 2004–2024 (M2 snapshot logic has material);
- ~60% of pages carry 1-3 `core_subject_tag` entries 'lv{L}-{Subject}-{year}'
  (the S4 subject-tag source column, mongoClient.go:139-161), tag year =
  snapshot year.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_SITES = 20
LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr"]
# The reference's 19-subject academic circle
# (/root/reference/internal/wikiEntropy/wikiSubjectEntropy.go:14-17).
SUBJECT_LIST = [
    "Mathematics", "Physics", "Computer science", "Engineering disciplines",
    "Medicine", "Biology", "Chemistry", "Materials science", "Geology",
    "Geography", "Environmental science", "Economics", "Sociology",
    "Psychology", "Political science", "Philosophy", "Business", "Art",
    "History",
]


def subject_tags_of(i: int, seed: int, year: int) -> list[str]:
    """Deterministic core_subject_tag list for page i: ~60% of pages carry
    1-3 tags 'lv{L}-{Subject}-{year}' (S4 source column,
    Get_pages_subject_cats mongoClient.go:139-161). Tag year = the page's
    snapshot year so per-(year, level) subject queries have material.
    Drawn from an rng independent of page_parts so html/text stay stable."""
    rng = np.random.RandomState((seed * 7919 + i * 31 + 7) % (2**31 - 1))
    if rng.rand() >= 0.6:
        return []
    n = 1 + int(rng.randint(0, 3))
    tags = {
        f"lv{1 + int(rng.randint(0, 3))}-{SUBJECT_LIST[int(rng.randint(0, len(SUBJECT_LIST)))]}-{year}"
        for _ in range(n)
    }
    return sorted(tags)
_WORDS = (
    "graph link node edge rank crawl page web data batch arrow stream shuffle "
    "entropy degree cluster label index vertex"
).split()


def url_of(i: int) -> str:
    return f"https://site-{i % N_SITES:02d}.example/p/{i:06d}"


def _upper_path(u: str) -> str:
    # uppercase the path part -> misses exact lookup, hits normalized lookup
    head, _, tail = u.rpartition("/p/")
    return f"{head}/P/{tail}".replace("/p/", "/P/") if not head else f"{head}/P/{tail}"


def page_parts(i: int, n_pages: int, rng: np.random.RandomState,
               redirect_to: int | None, malformed: bool, zipf_s: float,
               cohort: np.ndarray | None = None, intra_p: float = 0.5):
    """Deterministic (html, text, links, lang) for page i. When `cohort`
    (same-snapshot-year page indices) is given, each link targets the
    cohort with probability `intra_p` — so per-year snapshot subgraphs are
    non-trivial (the reference's yearly pipelines operate within a year)."""
    title = f"Page {i:06d} {_WORDS[i % len(_WORDS)]}"
    lang = LANGS[i % len(LANGS)]
    if redirect_to is not None:
        target = url_of(redirect_to)
        html = (
            f'<html><head><title>{title}</title>'
            f'<meta http-equiv="refresh" content="0; url={target}"></head>'
            f"<body></body></html>"
        )
        return html, title, [], lang

    n_para = 1 + int(rng.randint(0, 3))
    paras = []
    for p in range(n_para):
        k = 5 + int(rng.randint(0, 20))
        words = [_WORDS[int(w)] for w in rng.randint(0, len(_WORDS), size=k)]
        paras.append(" ".join(words))

    n_links = 1 + int(rng.zipf(1.6)) % 12
    raw = rng.zipf(zipf_s, size=n_links * 3)
    targets = [int(t) % n_pages for t in raw[raw < n_pages * 8][:n_links]]
    if cohort is not None and len(cohort) > 1:
        targets = [
            int(cohort[rng.zipf(zipf_s) % len(cohort)])
            if rng.rand() < intra_p else t
            for t in targets
        ]
    links = []
    for t in targets:
        r = rng.rand()
        if r < 0.03:
            links.append(f"https://nowhere-{t % 97:02d}.example/missing/{t:06d}")
        elif r < 0.05:
            links.append(url_of(i))  # self link -> dropped downstream
        elif r < 0.15:
            links.append(_upper_path(url_of(t)))  # normalized-lookup case
        else:
            links.append(url_of(t))

    anchors = "".join(f'<a href="{u}">l{j}</a>' for j, u in enumerate(links))
    title_tag = "" if malformed else f"<title>{title}</title>"
    html = (
        f"<html><head>{title_tag}</head><body>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + f"<nav>{anchors}</nav></body></html>"
    )
    text = "\n".join([title] + paras)  # byte-exact expected extraction
    return html, text, links, lang


def generate_pages(
    out_dir: str,
    n_pages: int = 1000,
    seed: int = 42,
    n_files: int = 4,
    zipf_s: float = 1.1,
    force: bool = False,
) -> str:
    """Write the pages table as `n_files` parquet shards; returns out_dir.

    Idempotent cache: skips generation when a _SUCCESS marker exists with the
    same params (resumable-output layout, reference K3 task-ledger analog,
    /root/reference/internal/extractWikipediadump/mongoClient.go:65-79)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = f"{n_pages}-{seed}-{n_files}-{zipf_s}-v5"
    if not force and os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    # redirect plan: ~5% of pages, arranged into chains of length 1..4
    n_red = max(2, n_pages // 20)
    red_ids = rng.choice(np.arange(1, n_pages), size=n_red, replace=False)
    redirect_to: dict[int, int] = {}
    pos = 0
    while pos < n_red:
        chain_len = 1 + int(rng.randint(0, 4))
        chain = red_ids[pos : pos + chain_len]
        pos += chain_len
        # chain: c0 -> c1 -> ... -> final non-redirect target
        final = int(rng.randint(0, n_pages))
        while final in redirect_to or final in set(int(x) for x in red_ids):
            final = int(rng.randint(0, n_pages))
        for j, c in enumerate(chain):
            nxt = int(chain[j + 1]) if j + 1 < len(chain) else final
            redirect_to[int(c)] = nxt
    # one self-redirect (dropped by the chase: redirect_id != page id rule)
    redirect_to[int(red_ids[0])] = int(red_ids[0])

    malformed = set(
        int(x) for x in rng.choice(n_pages, size=max(1, n_pages // 100), replace=False)
    ) - set(redirect_to)

    base_ts = np.datetime64("2004-01-01T00:00:00", "us")
    span_us = (np.datetime64("2024-12-31T23:59:59", "us") - base_ts).astype(np.int64)

    # snapshot-year cohorts (ts is a pure function of (seed, i))
    all_ts = np.array(
        [base_ts + np.int64(hash((seed, i)) % span_us) for i in range(n_pages)]
    )
    years_of = all_ts.astype("datetime64[Y]").astype(int) + 1970
    cohorts: dict[int, np.ndarray] = {
        int(y): np.flatnonzero(years_of == y) for y in np.unique(years_of)
    }

    per_file = (n_pages + n_files - 1) // n_files
    schema = pa.schema(
        [
            ("url", pa.large_string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.large_binary()),
            ("text", pa.large_string()),
            ("lang", pa.string()),
            ("core_subject_tag", pa.large_list(pa.large_string())),
        ]
    )
    for f in range(n_files):
        lo, hi = f * per_file, min(n_pages, (f + 1) * per_file)
        urls, htmls, texts, langs, tss, tags = [], [], [], [], [], []
        for i in range(lo, hi):
            html, text, _links, lang = page_parts(
                i, n_pages, np.random.RandomState(seed * 1_000_003 + i),
                redirect_to.get(i), i in malformed, zipf_s,
                cohort=cohorts[int(years_of[i])],
            )
            urls.append(url_of(i))
            htmls.append(html.encode("utf-8"))
            texts.append(text)
            langs.append(lang)
            tss.append(all_ts[i])
            tags.append(subject_tags_of(i, seed, int(years_of[i])))
        t = pa.table(
            {
                "url": pa.array(urls, pa.large_string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.large_binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
                "core_subject_tag": pa.array(
                    tags, pa.large_list(pa.large_string())
                ),
            },
            schema=schema,
        )
        pq.write_table(t, os.path.join(out_dir, f"part-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
