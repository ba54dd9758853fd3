"""Gopher repetition signals (Rae et al. 2021, A.1.1 "repetitious
documents"): duplicate-line fractions and top n-gram character mass,
computed distributively per document.

The Column-side `dup_unigram_ratio`/`dup_bigram_ratio` (textstats)
are cheap in-row approximations; these are the full published
signals, which need per-(doc, line) and per-(doc, n-gram) counts —
expressed as explode -> groupBy, i.e. shuffle-keyed on composite
keys that include the doc id, so the work is uniformly distributed
no matter how repetitious any single document is (a whale doc's
grams hash across partitions; nothing buffers a whole document).

Published rejection thresholds (applied by `gopher_repetition_flags`):
  dup_line_frac        > 0.30
  dup_line_char_frac   > 0.20
  top2_char_frac       > 0.20
  top3_char_frac       > 0.18
  top4_char_frac       > 0.16

Definitions pinned for oracle parity (the paper leaves them loose):
- lines are trimmed, blank lines dropped; a line's duplicate
  occurrences are all occurrences after the first; char fractions
  are over the sum of kept line lengths.
- n-grams are over whitespace-split words (pinned WS class); the
  "top" n-gram mass is max over grams of count * nonspace_chars,
  counted only when count >= 2 (a gram seen once is not repetition);
  fraction is over total non-whitespace chars of the text.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import WS_CLASS

THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
}


def _words(t):
    return F.filter(F.split(t, WS_CLASS + "+"), lambda x: x != "")


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-doc repetition signal table:
    (id, n_lines, dup_line_frac, dup_line_char_frac,
     top2_char_frac, top3_char_frac, top4_char_frac)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col),
        F.length(F.regexp_replace(t, WS_CLASS, "")).cast("double")
        .alias("total_chars"),
        # single-arg lambda on purpose: transform() feeds a 2-arg
        # callable (element, index), and F.trim's second parameter is
        # the trim-CHARACTER-SET — F.transform(col, F.trim) silently
        # trims digits instead of whitespace
        F.filter(F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
                 lambda x: x != "").alias("lines"),
        _words(t).alias("words"),
    )
    # deliberately NOT persisted: the three consumers re-derive the
    # arrays from the scan; at corpus scale a cache of exploded-array
    # projections would not fit executor storage anyway, and the scan
    # is columnar (text column only)

    # --- line duplication: count per (doc, line) ---
    per_line = (
        base.select(id_col, F.explode("lines").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"),
             F.length(F.first("line")).alias("ln"))
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.col("cnt") - 1).alias("dup_occ"),
        F.sum(F.col("cnt") * F.col("ln")).alias("line_chars"),
        F.sum((F.col("cnt") - 1) * F.col("ln")).alias("dup_chars"),
    )

    # --- top n-gram char mass for n = 2, 3, 4 ---
    def grams(n: int):
        return F.when(
            F.size("words") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("words") - (n - 1)),
                lambda i: F.array_join(F.slice("words", i, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    def tagged(n: int):
        # closure, NOT a default-arg lambda: a 2-parameter callable
        # makes transform() pass (element, index) and the index would
        # silently overwrite n
        return F.transform(
            grams(n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")))

    gram_rows = base.select(
        id_col,
        F.explode(F.flatten(F.array(
            tagged(2), tagged(3), tagged(4)))).alias("g"),
    ).select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    per_gram = (
        gram_rows.groupBy(id_col, "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "mass",
            F.when(F.col("cnt") >= 2,
                   F.col("cnt") * F.length(
                       F.regexp_replace(F.col("gram"), " ", "")))
            .otherwise(F.lit(0)))
    )
    gram_stats = (
        per_gram.groupBy(id_col)
        .pivot("n", [2, 3, 4])
        .max("mass")
        .select(id_col,
                F.col("2").alias("m2"), F.col("3").alias("m3"),
                F.col("4").alias("m4"))
    )

    out = (
        base.select(id_col, "total_chars")
        .join(line_stats, id_col, "left")
        .join(gram_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long")
            .alias("n_lines"),
            F.round(F.when(
                F.coalesce(F.col("n_lines"), F.lit(0)) > 0,
                F.col("dup_occ") / F.col("n_lines").cast("double"))
                .otherwise(F.lit(0.0)), 6).alias("dup_line_frac"),
            F.round(F.when(
                F.coalesce(F.col("line_chars"), F.lit(0)) > 0,
                F.col("dup_chars") / F.col("line_chars").cast("double"))
                .otherwise(F.lit(0.0)), 6).alias("dup_line_char_frac"),
            *[
                F.round(F.when(
                    F.col("total_chars") > 0,
                    F.coalesce(F.col(m), F.lit(0)) / F.col("total_chars"))
                    .otherwise(F.lit(0.0)), 6).alias(f"top{n}_char_frac")
                for n, m in ((2, "m2"), (3, "m3"), (4, "m4"))
            ])
    )
    return out


def gopher_repetition_flags(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """repetition_signals + the published pass/fail verdict."""
    sig = repetition_signals(docs, id_col, text_col)
    passes = F.lit(True)
    for col, thr in THRESHOLDS.items():
        passes = passes & (F.col(col) <= thr)
    return sig.withColumn("passes", passes)
