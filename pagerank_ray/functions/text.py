"""Text-analysis operators for training-data pipelines.

All hot paths are vectorized Arrow kernels (RE2 via pyarrow.compute) —
token / punctuation / stopword counting is one C-level regex scan per
batch column, no per-row Python. DuckDB also uses RE2, so the same
patterns are oracle-SQL-expressible via regexp_extract_all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = r"\S+"
PUNCT_PATTERN = r"[.,;:!?]"

# BPE-ish pre-tokenizer (GPT-2-style segment classes), restricted to
# RE2-expressible constructs: RE2 has no lookahead, so the original
# pattern's trailing-space handling is simplified to a greedy \s+
# class. Both Arrow and DuckDB run RE2, so counts agree exactly and
# the oracle is plain len(regexp_extract_all(...)).
BPE_TOKEN_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                     r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")

# language-ID stopword sets (tiny n-gram-free heuristic; real corpora
# would use char n-gram profiles — the interface stays the same)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "una"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"]


def _word_alternation(words: tuple[str, ...]) -> str:
    """Alternation pattern with word boundaries for ASCII words only —
    RE2's \\b is ASCII-defined, so wrapping CJK stopwords in \\b makes
    them unmatchable; non-ASCII words match as plain substrings."""
    import re as _re

    ascii_words = [w for w in words if w.isascii()]
    other = [_re.escape(w) for w in words if not w.isascii()]
    parts = []
    if ascii_words:
        parts.append(r"\b(" + "|".join(ascii_words) + r")\b")
    if other:
        parts.append("(" + "|".join(other) + ")")
    return "|".join(parts)


STOPWORD_PATTERN = _word_alternation(STOPWORDS_EN)


def token_count(text_col) -> pa.Array:
    """Whitespace token count (count of \\S+ matches)."""
    return pc.cast(pc.count_substring_regex(text_col, TOKEN_PATTERN),
                   pa.int64())


def bpe_token_count(text_col) -> pa.Array:
    """BPE-ish token count: non-overlapping BPE_TOKEN_PATTERN matches
    (one C-level RE2 scan per batch) — the pre-tokenizer segment count
    a byte-pair encoder would start from."""
    return pc.cast(
        pc.count_substring_regex(text_col, BPE_TOKEN_PATTERN),
        pa.int64())


def quality_counts_batch(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """Integer quality signals per document (SQL-parity safe: no floats).

    n_chars, n_tokens, n_punct, n_stopwords — ratio-style quality
    scores are derived downstream (floats cross engines poorly; counts
    hash identically).
    """
    text = batch.column(text_col)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_tokens": token_count(text),
        "n_punct": pc.cast(
            pc.count_substring_regex(text, PUNCT_PATTERN), pa.int64()),
        "n_stopwords": pc.cast(
            pc.count_substring_regex(text, STOPWORD_PATTERN), pa.int64()),
    })


def quality_score_batch(batch: pa.Table,
                        text_col: str = "text") -> pa.Table:
    """Float quality score in [0,1]: stopword density + length band +
    punctuation sanity (a C4-style heuristic composite)."""
    c = quality_counts_batch(batch, text_col)
    n_tok = c.column("n_tokens").to_numpy().astype(np.float64)
    n_stop = c.column("n_stopwords").to_numpy().astype(np.float64)
    n_punct = c.column("n_punct").to_numpy().astype(np.float64)
    n_chars = c.column("n_chars").to_numpy().astype(np.float64)
    tok = np.maximum(n_tok, 1.0)
    stop_ratio = n_stop / tok
    punct_ratio = n_punct / tok
    length_ok = np.clip(n_tok / 50.0, 0.0, 1.0)
    score = (0.4 * np.clip(stop_ratio * 5.0, 0, 1)
             + 0.4 * length_ok
             + 0.2 * (punct_ratio < 0.5))
    out = pa.table({
        "doc_id": batch.column("doc_id"),
        "quality": pa.array(score),
        "n_chars": c.column("n_chars"),
        "n_tokens": c.column("n_tokens"),
    })
    return out


class LangId:
    """Stateful language-ID stage (actor-pool shape: patterns compiled
    once per actor in __init__, one regex scan per language per batch).

    Prediction: argmax of per-language stopword hit counts; tiebreak =
    lexicographically smallest language code; zero hits -> "und".
    """

    def __init__(self, lang_stopwords: dict | None = None):
        table = lang_stopwords or LANG_STOPWORDS
        self.langs = sorted(table)
        self.patterns = [_word_alternation(tuple(table[lg]))
                         for lg in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        counts = np.stack([
            pc.count_substring_regex(text, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            for pat in self.patterns])
        best = np.argmax(counts, axis=0)  # argmax takes FIRST max -> min lang
        hit = counts.max(axis=0) > 0
        langs = np.array(self.langs, dtype=object)
        pred = np.where(hit, langs[best], "und")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred.astype(object), pa.string()),
            "stopword_hits": pa.array(counts.max(axis=0)),
        })


_FP_BASE = np.uint64(1099511628211)  # polynomial base (FNV prime)


def fingerprint64(texts: list[str]) -> np.ndarray:
    """Deterministic 64-bit polynomial rolling-hash fingerprint:
    h = Σ byte_i · B^(n-1-i)  (mod 2^64), vectorized per document via a
    cumulative-product power table. Process-independent (unlike
    Python's salted hash())."""
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            data = np.frombuffer(t.encode("utf-8"),
                                 dtype=np.uint8).astype(np.uint64)
            n = len(data)
            if n == 0:
                out[i] = np.uint64(0)
                continue
            pows = np.full(n, _FP_BASE, dtype=np.uint64)
            pows[0] = np.uint64(1)
            pows = np.multiply.accumulate(pows)  # B^0 .. B^(n-1)
            out[i] = np.sum(data * pows[::-1], dtype=np.uint64)
    return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fp = fingerprint64(batch.column("text").to_pylist())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fp.astype(np.int64)),
    })
