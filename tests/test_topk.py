"""Skew-safe two-phase top-k: exact equivalence with the naive
per-group window, on fixtures engineered for the failure modes."""
from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from document_extractor_spark.operators.topk import skew_safe_topk


def _naive(df, k):
    w = Window.partitionBy("source").orderBy(
        F.col("q").desc(), F.col("doc_id"))
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _rows(df):
    return sorted(
        (r.source, r.rank, r.doc_id, r.q)
        for r in df.select("source", "rank", "doc_id", "q").collect())


def test_equals_naive_on_dominant_source(spark):
    """One source holds ~90% of rows (the skew scenario), with heavy
    score ties so ranks depend on the doc_id tie-break; a source
    smaller than k; and a singleton source."""
    rows = []
    for i in range(900):
        rows.append((i, "whale", float(i % 7)))  # many exact ties
    for i in range(900, 960):
        rows.append((i, "mid", float(i % 11)))
    for i in range(960, 963):
        rows.append((i, "tiny", 1.0))  # fewer rows than k
    rows.append((999, "single", 5.0))
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")

    for k in (1, 5, 20):
        got = _rows(skew_safe_topk(
            df, ["source"], [F.col("q").desc(), F.col("doc_id")], k=k))
        want = _rows(_naive(df, k))
        assert got == want, k


def test_bucket_count_does_not_change_result(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float((i * 37) % 13)) for i in range(200)],
        "doc_id long, source string, q double")
    base = _rows(_naive(df, 4))
    for n_buckets in (1, 2, 7, 64):
        got = _rows(skew_safe_topk(
            df, ["source"], [F.col("q").desc(), F.col("doc_id")], k=4,
            n_buckets=n_buckets))
        assert got == base, n_buckets


def test_no_group_wide_sort_in_phase_one(spark):
    """Plan shape: the first (corpus-touching) window partitions by
    (source, bucket), never by source alone — the group-wide sort
    only ever sees the <= B*k survivors."""
    df = spark.createDataFrame(
        [(i, "only", float(i)) for i in range(50)],
        "doc_id long, source string, q double")
    out = skew_safe_topk(
        df, ["source"], [F.col("q").desc(), F.col("doc_id")], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two windows total; the inner one keys on the synthetic bucket
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
    assert "_tkb" in plan


def test_degenerate_params_raise(spark):
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id long, source string, q double")
    with pytest.raises(ValueError):
        skew_safe_topk(df, ["source"], [F.col("q")], k=0)
    with pytest.raises(ValueError):
        skew_safe_topk(df, ["source"], [F.col("q")], k=1, n_buckets=0)


def test_empty_input(spark):
    df = spark.createDataFrame(
        [], "doc_id long, source string, q double")
    assert skew_safe_topk(
        df, ["source"], [F.col("q").desc(), F.col("doc_id")],
        k=5).count() == 0
