"""SoftDeDup — frequency-based soft reweighting of near-duplicate
mass (He et al. 2024, "SoftDedup: an Efficient Data Reweighting
Method for Speeding Up Language Model Pre-training",
arXiv:2407.06654).

Hard dedup (the MinHash/SimHash/Bloom family in operators/) REMOVES
documents; SoftDedup instead measures each document's "data
commonness" — the likelihood of its n-grams under the corpus
frequency distribution — and DOWNWEIGHTS common documents in the
sampling mix, preserving distributional coverage while cutting
repeated-token compute. This implementation is the hashed-bigram
variant: bigrams hash into B buckets (the DSIR featurizer's md5
16-bit-prefix lattice, functions/dsir.py), so the frequency model is
a B-row dim table however large the corpus is.

Per document d with occurrence bigram buckets g_1..g_n:

    mean_log_p(d) = round( avg_i ln(cnt(g_i) / N) , 4 )     (nats)
    commonness    = exp(mean_log_p)   [reported in log space]
    soft_weight   = round( mean_log_p / min_log_p , 4 )

where N = total bigram occurrences and min_log_p is the corpus
minimum (the rarest document's mean log prob, the most negative).
soft_weight is the paper's inverse-commonness sampling factor at
sharpness 1, normalized into (0, 1]: the rarest document keeps
weight 1.0, the most duplicated mass gets the smallest weight.
Documents with no bigrams report n_grams=0 and NULL scores.

Float discipline (CLAUDE.md): ln/avg only under bounded aggregation
with 4dp rounding and the identical expression structure in the
DuckDB twin; the final ratio divides two already-4dp-rounded doubles
(IEEE-exact given equal operands) before its own 4dp round.

Scale shape: one corpus explode -> one B-bounded groupBy(bucket)
(map-side combined; the model collects to the driver under the
dim-bounded allowance and broadcasts back) -> one groupBy(doc)
rollup. Two corpus-side exchanges, no joins between corpus-sized
tables, no sorts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import shingles_col, tokens_col

N_BUCKETS = 4096


def bigram_buckets(text_col: str = "text",
                   n_buckets: int = N_BUCKETS) -> F.Column:
    """Array of hashed word-bigram bucket ids (the DSIR lattice:
    16-bit md5 prefix mod B)."""
    return F.transform(
        shingles_col(tokens_col(text_col), 2),
        lambda t: (F.conv(F.substring(F.md5(t), 1, 4), 16, 10)
                   .cast("int") % n_buckets))


def softdedup_weights(docs: DataFrame,
                      key_col: str = "doc_id",
                      text_col: str = "text",
                      n_buckets: int = N_BUCKETS,
                      round_dp: int = 4) -> DataFrame:
    """`(key_col, n_grams, mean_log_p, soft_weight)` per document
    (see module docstring)."""
    spark = docs.sparkSession
    feats = docs.select(
        F.col(key_col),
        F.explode_outer(bigram_buckets(text_col, n_buckets))
        .alias("bucket"))
    feats = feats.persist()
    try:
        model = (feats.filter(F.col("bucket").isNotNull())
                 .groupBy("bucket").agg(F.count("*").alias("cnt"))
                 .collect())
        total = sum(int(r["cnt"]) for r in model)
        if total:
            cnt_df = F.broadcast(spark.createDataFrame(
                [(int(r["bucket"]), int(r["cnt"])) for r in model],
                "bucket int, cnt long"))
            joined = feats.join(cnt_df, "bucket", "left")
        else:
            joined = feats.withColumn("cnt", F.lit(None).cast("long"))
        per_doc = (
            joined.groupBy(key_col)
            .agg(F.count("bucket").alias("n_grams"),
                 F.bround(
                     F.avg(F.log(F.col("cnt").cast("double")
                                 / F.lit(float(total or 1)))),
                     round_dp).alias("mean_log_p"))
        )
        # min over already-rounded values: deterministic, dim-bounded
        min_row = per_doc.agg(
            F.min("mean_log_p").alias("m")).collect()[0]
        min_log = min_row["m"]
        if min_log is None or min_log == 0.0:
            # degenerate corpus (all-empty docs, or a single bucket
            # making every mean_log_p 0): weight 1.0 where defined
            weight = F.when(F.col("mean_log_p").isNotNull(),
                            F.lit(1.0))
        else:
            weight = F.bround(
                F.col("mean_log_p") / F.lit(float(min_log)), round_dp)
        out = per_doc.select(
            key_col, "n_grams", "mean_log_p",
            weight.alias("soft_weight"))
        # materialize before releasing the feature cache
        out = out.localCheckpoint(eager=True)
    finally:
        feats.unpersist()
    return out
