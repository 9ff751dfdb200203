"""Stateful extraction stage: html → (text, out_links, redirect).

The reference ships wikitext to a gRPC parser from a per-file goroutine
(/root/reference/internal/extractWikipediadump/extractWikipediaDump.go:206-277,
ST1). Here extraction runs IN-PROCESS in an actor pool: the extractor (compiled
regexes) is built once per actor in ``__init__`` and applied per Arrow batch in
``__call__`` — the north-rule "stateful actor-pool extraction stage".

Per-row invariant: extracted ``text`` is byte-identical to the fixture
generator's stored ``text`` per url (BASELINE.json input_hint).

Failure handling replicates K2 (revision_fail side output,
extractWikipediaDump.go:295-309): rows the extractor rejects (no <title>)
are emitted with ok=false and split into an error dataset by the caller —
no exception kills the pipeline.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ray.data import Dataset


class ExtractorActor:
    """Callable class for ``map_batches(..., concurrency=N)`` — one instance
    per actor; regex state compiled once (ST1 analog)."""

    def __init__(self):
        self.title_re = re.compile(r"<title>(.*?)</title>", re.S)
        self.para_re = re.compile(r"<p>(.*?)</p>", re.S)
        self.link_re = re.compile(r'<a href="([^"]+)">')
        self.redirect_re = re.compile(
            r'<meta http-equiv="refresh" content="0; url=([^"]+)">'
        )

    def extract_one(self, html: bytes) -> tuple[str, list[str], str | None, bool]:
        """Pure function of the html bytes (pinned; property-tested)."""
        s = html.decode("utf-8", errors="replace")
        m = self.title_re.search(s)
        if m is None:
            return "", [], None, False  # failed row -> side output
        title = m.group(1)
        red = self.redirect_re.search(s)
        if red is not None:
            return title, [], red.group(1), True
        paras = self.para_re.findall(s)
        text = "\n".join([title] + paras)
        links = self.link_re.findall(s)
        return text, links, None, True

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        texts, links, redirects, oks = [], [], [], []
        for h in htmls:
            t, l, r, ok = self.extract_one(h)
            texts.append(t)
            links.append(l)
            redirects.append(r)
            oks.append(ok)
        # pass through every non-html column (url, warc_ts, lang, ...)
        cols = {n: batch[n] for n in batch.column_names if n != "html"}
        cols["text"] = pa.array(texts, pa.large_string())
        cols["links_out"] = pa.array(links, pa.large_list(pa.large_string()))
        cols["redirect"] = pa.array(redirects, pa.large_string())
        cols["ok"] = pa.array(oks, pa.bool_())
        return pa.table(cols)


def extract_pages(
    pages: Dataset, concurrency: int | tuple[int, int] = 4, batch_size: int = 1024
) -> tuple[Dataset, Dataset]:
    """Run the extractor actor pool; returns (extracted_ok, failed).

    batch_size is kept moderate because html is a wide binary column —
    batch_size × concurrency rows of html must fit each actor's heap."""
    out = pages.map_batches(
        ExtractorActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    ok = out.filter(expr="ok == True").drop_columns(["ok", "warc_ts", "lang"])
    failed = out.filter(expr="ok == False").select_columns(["url"])
    return ok, failed
