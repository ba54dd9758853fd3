"""Char-bigram LM scoring: decision surface + edge cases."""
from __future__ import annotations

import math

from document_extractor_spark.functions.charlm import (
    bigram_cross_entropy,
    char_bigrams,
    corpus_bigram_lm,
)

import pyspark.sql.functions as F


def test_char_bigrams_edges(spark):
    df = spark.createDataFrame(
        [("abcd",), ("ab",), ("a",), ("",), (None,)], "t: string")
    rows = df.select(char_bigrams("t").alias("b")).collect()
    assert rows[0].b == ["ab", "bc", "cd"]
    assert rows[1].b == ["ab"]
    assert rows[2].b == []  # NOT the sequence(1,0)=[1,0] trap
    assert rows[3].b == []
    assert rows[4].b is None


def _corpus(spark):
    fluent = "the quick market report shows strong growth this quarter"
    rows = [(i, fluent) for i in range(20)]
    rows.append((100, "zx qj vk wq xz jq kv qw zzqqxxjj"))  # gibberish
    rows.append((101, None))
    rows.append((102, "a"))  # no bigrams
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gibberish_scores_higher(spark):
    d = _corpus(spark)
    lm = corpus_bigram_lm(d)
    out = {r.doc_id: r for r in bigram_cross_entropy(d, lm).collect()}
    fluent_bits = out[0].bits_per_bigram
    gib_bits = out[100].bits_per_bigram
    assert gib_bits > fluent_bits + 1.0  # clearly separated
    assert out[101].n_bigrams == 0 and out[101].bits_per_bigram is None
    assert out[102].n_bigrams == 0 and out[102].bits_per_bigram is None
    assert len(out) == 23  # every doc keeps a row


def test_unseen_bigrams_finite_via_smoothing(spark):
    train = spark.createDataFrame(
        [(0, "aaaa bbbb")], "doc_id long, text string")
    lm = corpus_bigram_lm(train)
    probe = spark.createDataFrame(
        [(1, "zzzz")], "doc_id long, text string")
    r = bigram_cross_entropy(probe, lm).collect()[0]
    assert r.n_bigrams == 3
    assert r.bits_per_bigram is not None
    assert math.isfinite(r.bits_per_bigram)
    # unseen bigram probability is exactly 1/(N+V)
    n_v = (lm.agg(F.sum("c")).collect()[0][0]
           + lm.count())
    assert abs(r.bits_per_bigram - round(-math.log2(1.0 / n_v), 4)) < 1e-9


def test_no_python_stage_and_single_lm_broadcast(spark):
    d = _corpus(spark)
    lm = corpus_bigram_lm(d)
    plan = bigram_cross_entropy(d, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_fused_self_scoring_equals_explicit_lm(spark):
    d = _corpus(spark)
    lm = corpus_bigram_lm(d)
    explicit = {r.doc_id: (r.n_bigrams, r.bits_per_bigram)
                for r in bigram_cross_entropy(d, lm).collect()}
    fused = {r.doc_id: (r.n_bigrams, r.bits_per_bigram)
             for r in bigram_cross_entropy(d).collect()}
    assert fused == explicit
    # fused result is a checkpoint scan: no lingering cached pairs
    from pyspark import StorageLevel
    # (indirect check: a second fused call still works and matches)
    assert {r.doc_id: r.bits_per_bigram
            for r in bigram_cross_entropy(d).collect()} \
        == {k: v[1] for k, v in fused.items()}


def test_tertile_histogram_equals_ntile_on_skew(spark):
    """The r5 histogram-cutoff formulation must equal the literal
    `ntile(3) OVER (PARTITION BY lang ORDER BY score, doc_id)` on a
    fixture engineered for the hard cases: one dominant language
    (the 100 TB skew scenario), massive tie-groups that STRADDLE both
    tertile cutoffs (forcing the boundary row_number path), and
    languages with n=1,2,3,4 (ntile remainder semantics)."""
    from pyspark.sql import Window
    from document_extractor_spark.functions.charlm import (
        ccnet_tertile_buckets)

    rows = []
    # dominant lang: 1000 docs, only 5 distinct scores → every
    # tie-group is huge and both cutoffs (334/667) land inside one
    for i in range(1000):
        rows.append((i, "big", round(1.0 + (i % 5) * 0.0001, 4)))
    # all-ties language: one score for all 30 docs (both cutoffs
    # inside the single group)
    for i in range(30):
        rows.append((2000 + i, "tied", 2.5))
    # remainder semantics
    for n, lang in [(1, "n1"), (2, "n2"), (3, "n3"), (4, "n4")]:
        for i in range(n):
            rows.append((3000 + 10 * n + i, lang,
                         round(3.0 + (i % 2) * 0.1, 4)))
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, bits_per_bigram double")

    w = Window.partitionBy("lang").orderBy("bits_per_bigram", "doc_id")
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    want = {
        (r.doc_id): r.bucket
        for r in scored.withColumn(
            "bucket", F.element_at(names, F.ntile(3).over(w))).collect()}
    got = {r.doc_id: r.bucket
           for r in ccnet_tertile_buckets(scored).collect()}
    assert got == want
    # and the plan never sorts a lang-wide partition: no ntile window
    plan = ccnet_tertile_buckets(
        scored)._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()


def test_ccnet_buckets_semantics(spark):
    """head bucket = most fluent third per language; empty docs get
    NULL bucket; tertile sizes differ by at most 1 per lang."""
    import __spark_entry__ as em

    got = em.q_ccnet_buckets(spark, "/root/testdata/sf0.001").toPandas()
    assert set(got.bucket.dropna()) <= {"head", "middle", "tail"}
    for lang, grp in got[got.bucket.notna()].groupby("lang"):
        sizes = grp.bucket.value_counts()
        assert sizes.max() - sizes.min() <= 1, (lang, sizes)
        assert (grp[grp.bucket == "head"].bits_per_bigram.max()
                <= grp[grp.bucket == "tail"].bits_per_bigram.min())
    assert got[got.n_bigrams == 0].bucket.isna().all()
