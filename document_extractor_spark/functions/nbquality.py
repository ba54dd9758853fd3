"""Corpus-bootstrapped token quality classifier (the CCNet/fastText
classifier slot).

CCNet-style pipelines train a linear text classifier (fastText over
hashed n-grams, wiki-vs-crawl) and keep docs the classifier likes.
The from-scratch, in-engine analog: bootstrap seed labels from the
already-verified rule-based quality score, then train a multinomial
Naive-Bayes-style token model ON THE CORPUS ITSELF, distributed:

  train:  seed label per doc (quality_score >= cutoff)
          -> token class counts (hi_t, lo_t) in ONE shuffle
          -> per-token weight = the Laplace-smoothed likelihood
             ratio, quantized to an integer lattice:
               w_t = (hi_t+1) * S * (lo_tot+V) div ((lo_t+1) * (hi_tot+V))
  score:  explode tokens -> weight join -> per-doc integer sum;
          predict hi iff score >= n_tokens * S (mean ratio >= 1)

Weights are integer-quantized likelihood RATIOS summed directly
(scale S = 4096), not log-ratios: integer sums are exact and
order-independent, so any engine / any partitioning / any retry
produces bit-identical scores — the property every value-checked
oracle in this repo is built on. (True NB sums logs; the ratio sum
is a documented monotone-ish surrogate with the same decision
direction per token. A deployment that prefers exact NB semantics
can swap float log weights in at the cost of cross-engine
bit-parity.) Unseen-at-scoring tokens get the neutral ratio 1
(= SCALE), i.e. no evidence either way.

Scale shape: training is one token-keyed groupBy (map-side combined)
plus a 3-scalar total; scoring is one explode + weight join + one
doc-keyed groupBy. The weight table is vocab-sized — broadcast it
when it fits (default), or leave a shuffle join for open-vocab
corpora.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col
from .textstats import quality_score

SCALE = 4096


def seed_labels(docs: DataFrame, text_col: str = "text",
                cutoff: float = 0.7) -> DataFrame:
    """Rule-based seed labels: hi = quality_score >= cutoff."""
    return docs.withColumn(
        "hiq", quality_score(F.col(text_col)) >= F.lit(cutoff))


def train_nb_weights(labeled: DataFrame, text_col: str = "text",
                     label_col: str = "hiq") -> DataFrame:
    """Token weight table `(token, w)` from labeled docs.

    One shuffle (token groupBy). The three class totals are pulled
    to the driver at plan-build time (a 1-row aggregate — the same
    pattern as the charlm LM totals and the temperature-mix rate
    table); a 1-row crossJoin would plan as a nested-loop join,
    which this repo's plan guards forbid outright.
    """
    toks = labeled.select(
        F.col(label_col).cast("int").alias("_hi"),
        F.explode(tokens_col(text_col)).alias("token"))
    counts = toks.groupBy("token").agg(
        F.sum("_hi").alias("hi_t"),
        (F.count("*") - F.sum("_hi")).alias("lo_t"))
    # consumed twice (totals scalar + weight projection): persist so
    # the corpus-wide token explode behind it runs once; released
    # below once the weight table is materialized
    counts = counts.persist()
    t = counts.agg(
        F.sum("hi_t").alias("hi_tot"), F.sum("lo_t").alias("lo_tot"),
        F.count("*").alias("v")).collect()[0]
    hi_tot, lo_tot, v = (int(t.hi_tot or 0), int(t.lo_tot or 0),
                         int(t.v or 0))
    # DECIMAL(38,0) arithmetic: the numerator is hi_t * SCALE *
    # (lo_tot + V) ≈ 1e13 * 4e3 * 2e13 ≈ 1e30 at the 100 TB token
    # scale — far past the 9.2e18 BIGINT ceiling (ANSI mode would
    # crash the job; legacy mode would silently wrap and diverge
    # from the HUGEINT oracle). Decimal div is exact integer floor
    # division with 1e38 of headroom; the result always fits a long
    # (it is a ratio near SCALE).
    weights = counts.select(
        "token",
        F.expr(
            f"cast((cast(hi_t as decimal(38,0)) + 1) * {SCALE}"
            f" * {lo_tot + v}"
            f" div ((cast(lo_t as decimal(38,0)) + 1) * {hi_tot + v})"
            f" as long)"
        ).alias("w")).persist()
    weights.count()  # materialize the model from the cached counts
    counts.unpersist()  # release the big intermediate immediately
    # the returned weight table IS the trained model and stays
    # persisted (it feeds one or many scoring joins); the caller
    # owns its lifecycle — weights.unpersist() when done (same
    # contract as similarity.ivf_build / lsh_build)
    return weights


def nb_score(docs: DataFrame, weights: DataFrame,
             key_col: str = "doc_id", text_col: str = "text",
             broadcast_weights: bool = True) -> DataFrame:
    """Score docs under the weight table:
    `(key_col, n_tokens, nb_score, pred_hi)`.

    nb_score is the exact integer sum of token weights (unseen
    tokens take the neutral prior SCALE); pred_hi compares the mean
    ratio against 1. Docs with no tokens keep a row with NULL pred.
    """
    w = F.broadcast(weights) if broadcast_weights else weights
    toks = docs.select(
        F.col(key_col),
        F.explode_outer(tokens_col(text_col)).alias("token"))
    joined = toks.join(w, "token", "left")
    return (
        joined.groupBy(key_col)
        .agg(
            F.sum(F.when(F.col("token").isNotNull(), 1)
                  .otherwise(0)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("token").isNotNull(),
                         F.coalesce(F.col("w"), F.lit(SCALE))))
            .cast("long").alias("nb_score"))
        .select(
            key_col, "n_tokens",
            F.coalesce(F.col("nb_score"), F.lit(0)).alias("nb_score"),
            F.when(F.col("n_tokens") > 0,
                   F.col("nb_score") >= F.col("n_tokens") * SCALE)
            .alias("pred_hi"))
    )
