"""Character-bigram language-model scoring (perplexity-proxy filter).

The CCNet/KenLM slot in LLM data pipelines: score each document by
its cross-entropy under a corpus-level language model and filter the
tail. A real KenLM is an external artifact; the from-scratch,
dependency-free analog that preserves the pipeline SHAPE is a
character-bigram LM estimated from the corpus itself:

  pass 1  corpus LM:   explode char bigrams -> count per bigram
                       (one shuffle; cardinality is bounded by
                       charset^2, so the LM is a small dim table)
  pass 2  doc scoring: per-doc bigram counts joined against the
                       BROADCAST LM -> cross-entropy in bits/bigram
                       H(d) = -1/|d| * sum_b n_b(d) * log2 p(b)

Laplace smoothing (add-1 over the observed vocab) keeps unseen
bigrams finite. Gibberish / wrong-language / binary-ish text scores
high bits-per-bigram; fluent text in the corpus's dominant languages
scores low — same decision surface as the reference pipeline's
ascii-density gate (common_pdf.sh scoring block) but
distribution-aware.

Everything is JVM Column work: bigram generation is a
sequence+substring transform, never a Python UDF. At 100 TB the LM
pass is one map-side-combined groupBy on a low-cardinality key and
pass 2 is a broadcast join — no corpus re-shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_bigrams(text_col) -> F.Column:
    """Array of character bigrams of `text_col` (JVM expression).

    A doc with fewer than 2 chars yields an empty array. NULL text
    yields NULL (callers coalesce or filter).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], so the
    # short-text case must be gated explicitly, not clamped
    return F.when(
        F.length(c) >= 2,
        F.transform(F.sequence(F.lit(1), F.length(c) - 1),
                    lambda i: c.substr(i, F.lit(2)))
    ).otherwise(F.when(c.isNotNull(), F.array().cast("array<string>")))


def corpus_bigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1: the corpus bigram count table `(bigram, c)`.

    One shuffle on `bigram`; partial aggregation makes the map side
    emit at most charset^2 rows per task regardless of corpus size.
    """
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(char_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
    )


def bigram_cross_entropy(
    docs: DataFrame,
    lm: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
) -> DataFrame:
    """Pass 2: per-doc cross-entropy in bits/bigram under `lm`.

    `(key_col, n_bigrams, bits_per_bigram)`. Laplace add-1 smoothing
    over the observed vocab V: p(b) = (c_b + 1) / (N + V). Docs with
    no bigrams (empty/NULL text) come back with n_bigrams=0 and NULL
    bits. The LM join is an explicit broadcast — the corpus never
    reshuffles on bigram; the only wide exchange is the per-doc
    groupBy, which reuses the extraction pipeline's doc partitioning.
    """
    # the LM is consumed twice (totals scalar + broadcast join) and
    # is charset^2-bounded: collect it ONCE and rebuild a
    # driver-local frame, so the corpus-wide bigram explode behind
    # it runs exactly one time and nothing stays persisted for the
    # session lifetime (a .persist() here leaked a cached table per
    # invocation in long-lived bench/driver sessions)
    lm_rows = [(r.bigram, int(r.c)) for r in lm.collect()]
    n_total = sum(c for _, c in lm_rows)
    vocab = len(lm_rows)
    denom = float(max(n_total + vocab, 1))  # empty-LM guard
    lm = docs.sparkSession.createDataFrame(
        lm_rows, "bigram string, c long") if lm_rows else lm

    # one occurrence row per bigram, summed per doc directly: the
    # intermediate (doc, bigram) count table would cost a second
    # full-corpus shuffle for nothing — Σ_occurrences bits ==
    # Σ_b n_b·bits_b, and the broadcast LM join happens map-side
    occurrences = docs.select(key_col, F.explode_outer(
        char_bigrams(text_col)).alias("bigram"))
    joined = occurrences.join(F.broadcast(lm), "bigram", "left")
    bits = -F.log2((F.coalesce(F.col("c"), F.lit(0)) + 1) / denom)
    return (
        joined.groupBy(key_col)
        .agg(
            F.sum(F.when(F.col("bigram").isNotNull(), 1)
                  .otherwise(0)).alias("n_bigrams"),
            F.sum(F.when(F.col("bigram").isNotNull(),
                         bits)).alias("_total_bits"))
        .select(
            key_col,
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("_total_bits") / F.col("n_bigrams"),
                        round_dp)).alias("bits_per_bigram"))
    )
