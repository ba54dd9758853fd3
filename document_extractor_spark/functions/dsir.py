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

In-engine, from scratch, two passes sharing ONE corpus featurization
(the hashed feature ARRAY is materialized per doc BEFORE any explode
— a select that mixes a generator with expensive expressions puts
those expressions in the Project ABOVE Generate, re-evaluating them
once per emitted feature instead of once per doc; measured 5x on
this very operator):

  pass 1  feature counts: explode the cached per-doc arrays with the
          seed flag -> groupBy(bucket): (ct, cr) target/raw counts in
          one map-side-combined shuffle; cardinality is bounded by B,
          so the model is a dim table collected to the driver (the
          charlm LM pattern).
  pass 2  scoring: a ZERO-shuffle projection — the per-bucket log
          ratios are computed JVM-side over the full B-row model
          (F.log2, bit-identical to the join formulation) and ride
          the plan as one B-double array literal; per-doc weight =
          F.aggregate over the cached feature array, rounded to 4dp
          (floats only with bounded aggregation + rounding, identical
          expression structure in the DuckDB twin — the exactness
          rule charlm pinned). No broadcast join, no doc-keyed
          shuffle, no second explode.

The seed set is bootstrapped in-engine exactly like the NB quality
classifier (functions/nbquality.py): target = docs whose rule-based
`quality_score` clears `seed_cutoff`. A deployment with a real
curated target corpus passes it as `target_docs` instead.

Scale shape: one corpus featurization pass (persisted compact — one
int array per doc, NOT the exploded stream), one B-bounded groupBy
over the exploded arrays, then a zero-shuffle scoring projection; the
top-k selection runs on the 4dp score via the skew-safe two-phase
top-k (operators/topk.py) — no global corpus sort. Laplace add-1 over
the B buckets keeps unseen buckets finite on both sides.
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
    # compact per-doc featurization FIRST (one md5 pass, _hi once per
    # doc); everything downstream — model explode and scoring — reads
    # this small persisted table, never the raw text again
    if target_docs is None:
        compact = docs.select(
            key_col,
            (quality_score(F.col(text_col)) >= F.lit(seed_cutoff))
            .cast("int").alias("_hi"),
            hashed_ngram_features(text_col, n_buckets).alias("_farr")
        ).persist()
        model_src = (compact
                     .select("_hi", F.explode("_farr").alias("bucket"))
                     .groupBy("bucket").agg(
                         F.sum("_hi").alias("ct"),
                         F.count("*").alias("cr")))
    else:
        # explicit target corpus: its features only feed the target
        # counts; the raw counts still come from `docs`
        tgt = target_docs.select(F.explode(
            hashed_ngram_features(text_col, n_buckets)).alias("bucket")) \
            .groupBy("bucket").agg(F.count("*").alias("ct"))
        compact = docs.select(
            key_col,
            hashed_ngram_features(text_col, n_buckets).alias("_farr")
        ).persist()
        raw = (compact.select(F.explode("_farr").alias("bucket"))
               .groupBy("bucket").agg(F.count("*").alias("cr")))
        model_src = raw.join(tgt, "bucket", "full").select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"))
    by_bucket = {int(r.bucket): (int(r.ct), int(r.cr))
                 for r in model_src.collect()}
    nt = sum(ct for ct, _ in by_bucket.values())
    nr = sum(cr for _, cr in by_bucket.values())
    dt = float(nt + n_buckets)
    dr = float(nr + n_buckets)
    spark = docs.sparkSession
    # per-bucket log ratio for ALL B buckets, computed by the SAME JVM
    # F.log2 expression the join formulation used (bit-identical
    # doubles), collected as a B-sized dim table (plan-building-scalar
    # allowance) and inlined as one array literal
    model = spark.createDataFrame(
        [(b, *by_bucket.get(b, (0, 0))) for b in range(n_buckets)],
        "bucket int, ct long, cr long")
    lw_rows = model.select(
        "bucket",
        (F.log2((F.col("ct") + 1) / F.lit(dt))
         - F.log2((F.col("cr") + 1) / F.lit(dr))).alias("lw")).collect()
    lw_by_bucket = [0.0] * n_buckets
    for r in lw_rows:
        lw_by_bucket[int(r.bucket)] = float(r.lw)
    lw_arr = F.array(*[F.lit(v) for v in lw_by_bucket])
    farr = F.coalesce(F.col("_farr"), F.array().cast("array<int>"))
    n_feat = F.size(farr).cast("long")
    sum_lw = F.aggregate(
        farr, F.lit(0.0),
        lambda acc, b: acc + F.element_at(lw_arr, b + F.lit(1)))
    result = compact.select(
        key_col,
        n_feat.alias("n_feat"),
        F.when(n_feat > 0, F.round(sum_lw, round_dp))
        .alias("dsir_logw")).localCheckpoint(eager=True)
    compact.unpersist(blocking=False)
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
