"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.  All vectorized per batch; language ID is an
actor-pool stage (stopword tables + compiled regexes built once per actor).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Whitespace token count + char count, pure Arrow kernels.

    ``n_tokens`` matches the DuckDB oracle
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` (0 for empty/blank).
    """
    text = batch[col]
    trimmed = pc.utf8_trim_whitespace(text)
    # count_substring_regex counts \s+ runs; tokens = runs + 1 on non-empty
    seps = pc.count_substring_regex(trimmed, r"\s+")
    nonempty = pc.not_equal(trimmed, "")
    n_tokens = pc.if_else(nonempty, pc.add(seps, 1), 0)
    return batch.append_column(
        "n_tokens", pc.cast(n_tokens, pa.int64())
    ).append_column("n_chars_m", pc.cast(pc.utf8_length(text), pa.int64()))


_WORD_RE = re.compile(r"[A-Za-z']+")
_PUNCT_RE = re.compile(r"[^\w\s]")

# tiny public stopword lists per language (top function words)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
}


class QualityScorer:
    """Actor-pool quality scoring: length / punctuation ratio / stopword
    ratio / mean word length (the classic pre-training quality heuristics)."""

    def __init__(self):
        self.word = _WORD_RE
        self.punct = _PUNCT_RE
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        words = texts.map(lambda t: self.word.findall(t.lower()))
        n_words = words.map(len)
        batch["n_words"] = n_words.astype(np.int64)
        batch["mean_word_len"] = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0
        )
        batch["punct_ratio"] = texts.map(
            lambda t: len(self.punct.findall(t)) / max(len(t), 1)
        )
        batch["stopword_ratio"] = words.map(
            lambda ws: sum(w in self.stop_en for w in ws) / max(len(ws), 1)
        )
        return batch


class LangId:
    """Stopword-vote n-gram-free language ID over the supported set.

    Deterministic heuristic: the language whose stopword list scores the
    most hits wins; ties (and zero hits) -> 'und'.  Accuracy is asserted
    against the testdata ``lang`` column in tests (not a SQL oracle — the
    heuristic is not SQL-expressible; the driver records rows-only here).
    """

    def __init__(self):
        self.word = _WORD_RE
        self.tables = {k: v for k, v in _STOPWORDS.items()}

    def classify(self, text: str) -> str:
        words = self.word.findall(text.lower())
        if not words:
            return "und"
        scores = {
            lang: sum(w in table for w in words)
            for lang, table in self.tables.items()
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        ordered = sorted(scores.values(), reverse=True)
        if best[1] == 0 or (len(ordered) > 1 and ordered[0] == ordered[1]):
            return "und"
        return best[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = batch["text"].fillna("").map(self.classify)
        return batch


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """64-bit rolling-hash document fingerprint (polynomial rolling hash of
    the whitespace-normalized text) — cheap content identity for lineage."""
    import zlib

    texts = batch[col].to_pylist()
    fps = []
    for t in texts:
        norm = " ".join((t or "").split()).encode()
        # two independent crc32 halves -> 64-bit fp (deterministic, fast)
        lo = zlib.crc32(norm)
        hi = zlib.crc32(norm[::-1])
        fps.append((hi << 32) | lo)
    return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))
