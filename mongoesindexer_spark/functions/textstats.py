"""Text-analysis operators for training-data pipelines: quality scoring,
language ID, token counting, document fingerprinting.

All the per-doc metrics are JVM-side column expressions (whole-stage
codegen); only the rolling-hash fingerprint uses a numpy kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOPWORDS

# Small per-language stopword profiles for the n-gram/stopword language
# heuristic (top function words; public linguistic knowledge).
LANG_PROFILES = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}

# \s+ keeps every whitespace-splitting operator in the engine (dedup
# TOKENS, the __spark_entry__ oracles) in agreement on multi-whitespace text
_TOKENS = r"filter(split(lower({c}), '\\s+'), x -> x != '')"


def _tokens(c: str):
    return F.expr(_TOKENS.format(c=c))


def quality_metrics(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token count, distinct ratio, stopword
    ratio, mean token length — the standard web-corpus quality filters."""
    toks = _tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOPWORDS)])
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias("n_stop"),
        F.length(F.col(text_col)).alias("n_chars"),
    ).select(
        "id", "n_tokens", "n_distinct", "n_stop", "n_chars",
        (F.col("n_distinct") / F.greatest(F.col("n_tokens"), F.lit(1))).alias("distinct_ratio"),
        (F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))).alias("stop_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language function-word
    hit counts; 'und' (undetermined) when no profile matches."""
    toks = F.array_distinct(_tokens(text_col))
    scores = []
    out = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        out = out.withColumn(f"s_{lang}", F.size(F.array_intersect("toks", arr)))
        scores.append(f"s_{lang}")
    best = F.greatest(*[F.col(s) for s in scores])
    pred = F.lit("und")
    # deterministic tie-break: first profile in fixed order wins
    for lang in reversed(list(LANG_PROFILES)):
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return out.select("id", *scores, pred.alias("pred_lang"))


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex count
    (alnum runs + single punctuation marks — an upper bound proxy for
    subword token budgets)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(_tokens(text_col)).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\\\s]', 0)")).alias("bpe_ish_tokens"),
    )


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hash, per-window
    minimum) — the classic local fingerprint for near-dup/plagiarism
    detection (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms
    for Document Fingerprinting", SIGMOD 2003); numpy kernel, Arrow-batched.

    Output: (id, fingerprints array<long> — sorted distinct window minima).
    """

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.uint64(1000003)
        for pdf in it:
            ids, fps = [], []
            for did, text in zip(pdf["id"].values, pdf["text"].values):
                s = np.frombuffer((text or "").lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if s.size < k:
                    ids.append(did)
                    fps.append([])
                    continue
                # rolling polynomial hash of all k-grams, vectorized
                n = s.size - k + 1
                h = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    h = h * base + s[j : j + n]
                if n <= window:
                    mins = np.array([h.min()], dtype=np.uint64)
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(h, window)
                    mins = sw.min(axis=1)
                fp = np.unique(mins).astype(np.int64)
                ids.append(did)
                fps.append(fp.tolist())
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "fingerprints": pd.Series(fps, dtype="object")})

    return (
        df.select(F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(_kernel, schema="id long, fingerprints array<long>")
    )
