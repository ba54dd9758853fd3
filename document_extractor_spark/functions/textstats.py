"""Text analysis for training-data pipelines: tokens, language-ID,
quality scoring, fingerprints. Every Column-returning helper here is
pure JVM expression (codegen path) and has an exact ANSI-SQL twin used
by the DuckDB oracle (__spark_entry__.oracle_sql).

The quality blend generalizes the reference's legacy shell scorer
(common_pdf.sh:85-156: density + stopword-ratio + repetition blend,
weights .5/.3/.2) into deterministic column math.
"""
from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# BPE-ish tokenization: letter/digit runs, plus single punctuation marks
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def ascii_alnum_ratio(text: Column) -> Column:
    """ASCII alnum density — the SQL-twin variant of the reliability
    scorer (the Unicode-exact scorer lives in functions/scoring.py)."""
    return F.when(F.length(text) > 0,
                  F.length(F.regexp_replace(text, "[^0-9A-Za-z]", ""))
                  / F.length(text).cast("double")).otherwise(F.lit(0.0))


def dup_unigram_ratio(text: Column) -> Column:
    """Fraction of repeated words — a Gopher-style repetition signal
    (high ratio = boilerplate/spam). 0.0 for empty text. Pure Column
    expression: stays in whole-stage codegen, no Python in the path."""
    w = F.split(text, " ")
    return F.when(
        F.size(w) > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w).cast("double"),
    ).otherwise(F.lit(0.0))


def dup_bigram_ratio(text: Column) -> Column:
    """Fraction of repeated word-bigrams (catches phrase-level template
    repetition that unigrams miss). 0.0 for texts under two words.

    Built as zip_with(w[:-1], w[1:]) rather than
    transform(sequence(...), i -> element_at(w, i)...): Catalyst
    inlines `w` into each lambda use, so the element_at form
    re-evaluates the split PER ELEMENT — O(words^2) per row, measured
    5.5 s for 5000 short docs. The slice form evaluates the split a
    constant number of times per row (0.3 s same input)."""
    w = F.split(text, " ")
    n = F.size(w)
    grams = F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.when(
        n >= 2,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))


def _occurrences(padded: Column, word: str) -> Column:
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(_occurrences(padded, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Marker-word argmax language-ID; ties break in en>de>fr>es order;
    all-zero -> 'unknown'. (n-gram heuristic class of detectors)."""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"])
               & (s["en"] >= s["es"]) & (s["en"] > 0), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0),
              F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column) -> Column:
    """0.6 * alnum-density(capped at 0.8) + 0.4 * length factor."""
    density = F.least(F.lit(1.0), ascii_alnum_ratio(text) / F.lit(0.8))
    length_factor = F.least(
        F.lit(1.0), token_count(text).cast("double") / F.lit(200.0))
    return F.round(F.lit(0.6) * density + F.lit(0.4) * length_factor, 4)


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: md5 of lower + ws-collapsed.
    Collapse BEFORE trim: trim() strips only spaces, so stray
    tabs/newlines must first become spaces."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


# --------------------------------------------------------------------------
# Winnowing fingerprint (rolling-hash document sketch) — Python-side,
# used via pandas UDF; no SQL twin (rows-only oracle check).
# --------------------------------------------------------------------------
def winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Classic winnowing: k-gram rolling hashes, min per window,
    deduplicated in order. Deterministic md5-based hash."""
    if not text or len(text) < k:
        return []
    grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    hashes = [
        int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
        >> 1  # keep positive in int64
        for g in grams
    ]
    out: list[int] = []
    for i in range(max(1, len(hashes) - window + 1)):
        m = min(hashes[i:i + window])
        if not out or out[-1] != m:
            out.append(m)
    return out


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprint(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: winnow(t) if isinstance(t, str) else [])
