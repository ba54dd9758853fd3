"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

The published recipe for picking pretraining data that "looks like" a
target domain: featurize every document as a bag of HASHED n-grams
(unigrams + word bigrams hashed into B buckets), fit two bag-of-words
category models — p_target over a target/seed corpus and p_raw over
the raw pool — and weight each raw document by its log importance
ratio

    log w(d) = sum_b c_b(d) * ( log2 p_target(b) - log2 p_raw(b) )

then select the top-k documents by weight (the paper resamples via
Gumbel-top-k; the deterministic top-k variant it ablates is the
oracle-checkable one implemented here — no RNG, bit-stable).

In-engine, from scratch, two passes sharing ONE corpus explode:

  pass 1  feature counts: explode hashed n-grams with the seed flag
          -> groupBy(bucket): (ct, cr) target/raw counts in one
          map-side-combined shuffle; cardinality is bounded by B, so
          the model is a dim table collected to the driver (the
          charlm LM pattern).
  pass 2  scoring: the SAME cached feature stream joins the
          broadcast B-row model; per-doc sum of per-occurrence log
          ratios, rounded to 4dp (floats only with bounded
          aggregation + rounding, identical expression structure in
          the DuckDB twin — the exactness rule charlm pinned).

The seed set is bootstrapped in-engine exactly like the NB quality
classifier (functions/nbquality.py): target = docs whose rule-based
`quality_score` clears `seed_cutoff`. A deployment with a real
curated target corpus passes it as `target_docs` instead.

Scale shape: one corpus explode feeding one B-bounded groupBy and one
broadcast join + doc-keyed groupBy; the top-k selection runs on the
4dp score via the skew-safe two-phase top-k (operators/topk.py) — no
global corpus sort. Laplace add-1 over the B buckets keeps unseen
buckets finite on both sides.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import shingles_col, tokens_col
from .textstats import quality_score

N_BUCKETS = 1024


def hashed_ngram_features(text_col: str = "text",
                          n_buckets: int = N_BUCKETS) -> F.Column:
    """Array of feature-bucket ids (int) for a document: word
    unigrams + word bigrams, each hashed to `n_buckets` via the
    16-bit md5 prefix (SQL-reproducible: same arithmetic as the
    DuckDB twin). NULL text yields an empty array."""
    toks = tokens_col(text_col)
    feats = F.concat(
        F.coalesce(toks, F.array().cast("array<string>")),
        shingles_col(toks, 2))
    return F.transform(
        feats,
        lambda t: (F.conv(F.substring(F.md5(t), 1, 4), 16, 10)
                   .cast("int") % n_buckets))


def dsir_weights(docs: DataFrame,
                 key_col: str = "doc_id",
                 text_col: str = "text",
                 n_buckets: int = N_BUCKETS,
                 seed_cutoff: float = 0.7,
                 target_docs: DataFrame | None = None,
                 round_dp: int = 4) -> DataFrame:
    """Per-doc importance weights `(key_col, n_feat, dsir_logw)`.

    `dsir_logw` = sum over feature occurrences of
    log2((ct_b+1)/(Nt+B)) - log2((cr_b+1)/(Nr+B)), rounded to
    `round_dp`; docs with no features get n_feat=0 and NULL weight.
    With `target_docs=None` the target is the in-corpus seed
    (quality_score >= seed_cutoff); the raw model is always estimated
    over `docs` itself.
    """
    if target_docs is None:
        flagged = docs.select(
            key_col,
            (quality_score(F.col(text_col)) >= F.lit(seed_cutoff))
            .cast("int").alias("_hi"),
            F.explode_outer(
                hashed_ngram_features(text_col, n_buckets))
            .alias("bucket"))
        feats = flagged.persist()
        model_src = feats.filter(F.col("bucket").isNotNull()) \
            .groupBy("bucket").agg(
                F.sum("_hi").alias("ct"),
                F.count("*").alias("cr"))
    else:
        # explicit target corpus: its features only feed the target
        # counts; the raw counts still come from `docs`
        tgt = target_docs.select(F.explode(
            hashed_ngram_features(text_col, n_buckets)).alias("bucket")) \
            .groupBy("bucket").agg(F.count("*").alias("ct"))
        feats = docs.select(
            key_col,
            F.explode_outer(
                hashed_ngram_features(text_col, n_buckets))
            .alias("bucket")).persist()
        raw = feats.filter(F.col("bucket").isNotNull()) \
            .groupBy("bucket").agg(F.count("*").alias("cr"))
        model_src = raw.join(tgt, "bucket", "full").select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"))
    rows = [(int(r.bucket), int(r.ct), int(r.cr))
            for r in model_src.collect()]
    nt = sum(ct for _, ct, _ in rows)
    nr = sum(cr for _, _, cr in rows)
    dt = float(nt + n_buckets)
    dr = float(nr + n_buckets)
    spark = docs.sparkSession
    model = spark.createDataFrame(
        rows or [(None, None, None)],
        "bucket int, ct long, cr long").filter(F.col("bucket").isNotNull())
    lw = (F.log2((F.coalesce(F.col("ct"), F.lit(0)) + 1) / F.lit(dt))
          - F.log2((F.coalesce(F.col("cr"), F.lit(0)) + 1) / F.lit(dr)))
    joined = feats.join(F.broadcast(model), "bucket", "left")
    result = (
        joined.groupBy(key_col)
        .agg(
            F.sum(F.when(F.col("bucket").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_feat"),
            F.sum(F.when(F.col("bucket").isNotNull(), lw))
            .alias("_sum_lw"))
        .select(
            key_col, "n_feat",
            F.when(F.col("n_feat") > 0,
                   F.round(F.col("_sum_lw"), round_dp))
            .alias("dsir_logw"))
    ).localCheckpoint(eager=True)
    feats.unpersist(blocking=False)
    return result


def dsir_select(weights: DataFrame, k: int,
                key_col: str = "doc_id") -> DataFrame:
    """`(key_col, n_feat, dsir_logw, selected)` — deterministic
    top-k by (dsir_logw desc, key) over the weighted docs; docs with
    NULL weight are never selected. Selection uses the skew-safe
    two-phase top-k: the global "partition" only ever sorts the
    <= 32*k phase-1 survivors."""
    from ..operators.topk import skew_safe_topk

    ranked = skew_safe_topk(
        weights.filter(F.col("dsir_logw").isNotNull()),
        [], [F.col("dsir_logw").desc(), F.col(key_col)], k=k,
        bucket_col=key_col)
    picked = ranked.select(F.col(key_col), F.lit(True).alias("selected"))
    return (weights.join(picked, key_col, "left")
            .select(key_col, "n_feat", "dsir_logw",
                    F.coalesce(F.col("selected"), F.lit(False))
                    .alias("selected")))
