"""Vectorized text kernels: normalization, tokenization, quality stats,
language-ID heuristic, fingerprinting.

``title_filter`` replicates the reference normalizer exactly
(/root/reference/internal/wikiEntropy/wikiEntropy.go:116-118):
lower → replace "_" with " " → trim whitespace.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-z0-9]+")

# Tiny stopword marker sets for the n-gram/stopword language heuristic.
# Scores are marker-word occurrence counts; predicted lang = argmax
# (ties broken by fixed language order below).
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"}),
    "es": frozenset({"el", "los", "las", "es", "una", "para", "por", "con", "del", "no"}),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def title_filter(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Arrow-vectorized titleFilter: lower, '_'→' ', trim (wikiEntropy.go:116-118)."""
    out = pc.utf8_lower(col)
    out = pc.replace_substring(out, "_", " ")
    return pc.utf8_trim_whitespace(out)


def title_filter_py(s: str) -> str:
    """Scalar reference implementation (for tests / per-row paths)."""
    return s.lower().replace("_", " ").strip()


def token_count(texts: np.ndarray) -> np.ndarray:
    """Whitespace token count, matching DuckDB length(regexp_extract_all(t,'\\S+'))."""
    return np.fromiter(
        (len(_TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )


def word_tokens(text: str) -> list[str]:
    """Lowercase [a-z0-9]+ word tokens (shingling / langid basis)."""
    return _WORD_RE.findall(text.lower())


def lang_id(texts) -> list[str]:
    """Stopword-marker language heuristic; 'und' (undetermined) when no marker hits."""
    out = []
    for t in texts:
        words = word_tokens(t)
        best_lang, best_score = "und", 0
        for lang in _LANG_ORDER:
            score = sum(1 for w in words if w in LANG_MARKERS[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        out.append(best_lang)
    return out


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring signals: char len, token count, mean token length,
    punctuation ratio, uppercase ratio. All Arrow kernels except the regex
    token count (C-backed via pyarrow count_substring_regex)."""
    t = batch[text_col]
    n_chars = pc.utf8_length(t)
    n_tokens = pc.count_substring_regex(t, r"\S+")
    n_punct = pc.count_substring_regex(t, r"[^\w\s]")
    n_upper = pc.count_substring_regex(t, r"[A-Z]")
    nc = pc.cast(n_chars, pa.float64())
    safe_nc = pc.max_element_wise(nc, pa.scalar(1.0))
    batch = batch.append_column("n_chars_q", n_chars)
    batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    batch = batch.append_column(
        "punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), safe_nc)
    )
    batch = batch.append_column(
        "upper_ratio", pc.divide(pc.cast(n_upper, pa.float64()), safe_nc)
    )
    return batch


def parse_subject_tags(tags: list[str], level: int, subjects: set[str]) -> list[str]:
    """M9: from tags 'lv{L}-{Subject}-{year}' keep level-L tags, re-join the
    middle parts and validate against the subject list
    (/root/reference/internal/wikiEntropy/wikiMultilayersSubjectEntropy.go:47-63)."""
    prefix = f"lv{level}-"
    out = []
    for tag in tags:
        if not tag.startswith(prefix):
            continue
        parts = tag.split("-")
        if len(parts) < 3:
            continue
        subject = "-".join(parts[1:-1])
        if subject in subjects:
            out.append(subject)
    return out


def md5_fingerprint(texts) -> list[str]:
    """Document fingerprint = hex MD5 of the raw text (DuckDB md5() parity)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def rolling_fingerprint(texts, window: int = 8) -> np.ndarray:
    """Rolling polynomial fingerprint (Karp-Rabin style): min over windowed
    hashes of word tokens — a locality-robust document fingerprint."""
    base = np.uint64(1099511628211)
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = word_tokens(t)
        if not ws:
            out[i] = 0
            continue
        hs = np.array(
            [int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16) for w in ws],
            dtype=np.uint64,
        )
        if len(hs) <= window:
            acc = np.uint64(0)
            for h in hs:
                acc = acc * base + h
            out[i] = int(acc & np.uint64(0x7FFFFFFFFFFFFFFF))
            continue
        # rolling windows vectorized via cumulative powers
        n_win = len(hs) - window + 1
        wins = np.zeros(n_win, dtype=np.uint64)
        for k in range(window):
            wins = wins * base + hs[k : k + n_win]
        out[i] = int(wins.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
    return out
