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


def batch_word_tokens(texts) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a whole batch at once: (tokens, doc_idx) where ``tokens``
    is one object ndarray of every word token in batch order and
    ``doc_idx[i]`` indexes the source text. The regex pass per doc IS the
    tokenizer; everything downstream (tf / pair / shingle counting) should
    be ONE vectorized groupby over these arrays per batch — never a
    Python count per document."""
    from itertools import chain

    toks = [_WORD_RE.findall(t.lower()) for t in texts]
    lens = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
    if not int(lens.sum()):
        return np.array([], object), np.array([], np.int64)
    flat = np.array(list(chain.from_iterable(toks)), dtype=object)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return flat, doc_idx


def batch_adjacent_pairs(texts) -> tuple[np.ndarray, np.ndarray]:
    """All adjacent token pairs (a, b) of a batch, doc-boundary-aware:
    vectorized shift + same-doc mask over batch_word_tokens output."""
    tokens, doc_idx = batch_word_tokens(texts)
    if len(tokens) < 2:
        return np.array([], object), np.array([], object)
    mask = doc_idx[1:] == doc_idx[:-1]
    return tokens[:-1][mask], tokens[1:][mask]


def batch_gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """DISTINCT word-n-gram shingle hashes per text, fully vectorized:
    (row_idx, gram_hash) arrays, one row per distinct (text, shingle).

    Each distinct token is hashed ONCE (factorize → hash uniques), window
    hashes combine token hashes with a uint64 polynomial (order-sensitive,
    so 'a b' != 'b a'), and the per-doc distinct pass is one batch-wide
    drop_duplicates. Equivalent to hashing the joined shingle string:
    both identify a shingle by a 63-bit hash; collision probability is the
    same ~2^-63 and the distinct-count semantics match."""
    import pandas as pd

    from .hashing import hash_strings

    tokens, doc_idx = batch_word_tokens(texts)
    if len(tokens) < n:
        return np.array([], np.int64), np.array([], np.int64)
    codes, uniques = pd.factorize(tokens)
    th = hash_strings(uniques)[codes].view(np.uint64)
    valid = doc_idx[n - 1 :] == doc_idx[: len(doc_idx) - n + 1]
    n_win = len(tokens) - n + 1
    base = np.uint64(1099511628211)
    acc = np.zeros(n_win, dtype=np.uint64)
    for k in range(n):
        acc = acc * base + th[k : k + n_win]
    gh = (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)[valid]
    rows = doc_idx[:n_win][valid]
    if not len(gh):
        return np.array([], np.int64), np.array([], np.int64)
    d = pd.DataFrame({"r": rows, "g": gh}).drop_duplicates()
    return d["r"].to_numpy(np.int64), d["g"].to_numpy(np.int64)


def lang_id(texts) -> list[str]:
    """Stopword-marker language heuristic; 'und' (undetermined) when no
    marker hits. Vectorized: tokens factorized once per batch, one isin
    over the distinct vocabulary per language, per-doc scores via bincount.
    Ties keep the earlier language in _LANG_ORDER (argmax-first ==
    the strictly-greater update rule of the scalar form)."""
    import pandas as pd

    n = len(texts)
    tokens, doc_idx = batch_word_tokens(texts)
    if not len(tokens):
        return ["und"] * n
    codes, uniques = pd.factorize(tokens)
    uniq = pd.Series(uniques)
    scores = np.zeros((n, len(_LANG_ORDER)), np.int64)
    for j, lang in enumerate(_LANG_ORDER):
        hit = uniq.isin(LANG_MARKERS[lang]).to_numpy()[codes]
        if hit.any():
            scores[:, j] = np.bincount(doc_idx[hit], minlength=n)
    best = scores.argmax(axis=1)
    has = scores.max(axis=1) > 0
    return [(_LANG_ORDER[k] if h else "und") for k, h in zip(best, has)]


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
    hashes of word tokens — a locality-robust document fingerprint.

    Each DISTINCT token is blake2b-hashed once per batch (factorize) —
    values are identical to hashing per occurrence, the dominant cost is
    not."""
    import pandas as pd

    base = np.uint64(1099511628211)
    out = np.zeros(len(texts), dtype=np.int64)
    tokens, doc_idx = batch_word_tokens(texts)
    if not len(tokens):
        return out
    codes, uniques = pd.factorize(tokens)
    uh = np.array(
        [int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16)
         for w in uniques],
        dtype=np.uint64,
    )
    th = uh[codes]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(doc_idx)) + 1,
                             [len(doc_idx)]])
    present = doc_idx[starts[:-1]]
    for s, e, i in zip(starts[:-1], starts[1:], present):
        hs = th[s:e]
        if len(hs) <= window:
            acc = np.uint64(0)
            for h in hs:
                acc = acc * base + h
            out[i] = int(acc & np.uint64(0x7FFFFFFFFFFFFFFF))
            continue
        n_win = len(hs) - window + 1
        wins = np.zeros(n_win, dtype=np.uint64)
        for k in range(window):
            wins = wins * base + hs[k : k + n_win]
        out[i] = int(wins.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
    return out


def levenshtein_batch(A, B) -> np.ndarray:
    """Unit-cost edit distance for P string pairs at once: the classic DP,
    vectorized ACROSS pairs — the two scalar loops run over character
    positions (bounded by the longest string, ~15 for part names), each
    step an O(P) numpy op, so per-pair work never drops to Python.
    Matches DuckDB levenshtein() exactly (same unit costs)."""
    P = len(A)
    if P == 0:
        return np.array([], np.int64)
    la = np.fromiter((len(s) for s in A), np.int64, P)
    lb = np.fromiter((len(s) for s in B), np.int64, P)
    ma, mb = int(la.max()), int(lb.max())

    def codes(S, m):
        if m == 0:
            return np.zeros((P, 0), np.uint32)
        joined = "".join(s.ljust(m, "\0") for s in S)
        return np.frombuffer(
            joined.encode("utf-32-le"), np.uint32).reshape(P, m)

    ca, cb = codes(A, ma), codes(B, mb)
    prev = np.broadcast_to(
        np.arange(mb + 1, dtype=np.int64), (P, mb + 1)).copy()
    res = lb.copy()  # answer for pairs with empty A
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, mb + 1):
            sub = prev[:, j - 1] + (ca[:, i - 1] != cb[:, j - 1])
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub)
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res
