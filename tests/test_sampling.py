"""hash_sample / stratified_hash_sample: determinism, rates, plan."""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from document_extractor_spark.functions.sampling import (
    hash_sample,
    hash_threshold,
    stratified_hash_sample,
)


def test_threshold_edges():
    assert hash_threshold(1.0) == "g"
    assert hash_threshold(0.0) == ""
    assert hash_threshold(0.5) == "8000"
    assert hash_threshold(0.25, precision=2) == "40"


def test_deterministic_and_repeatable(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    b = sorted(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    assert a == b
    # rate is approximately honored (md5 uniformity)
    assert 0.25 < len(a) / 2000 < 0.35


def test_nested_rates(spark):
    """rate 0.1 sample is a strict subset of the rate 0.3 sample —
    the property that makes hash sampling resumable/incremental."""
    df = spark.range(2000).withColumnRenamed("id", "k")
    small = set(r["k"] for r in hash_sample(df, "k", 0.1).collect())
    big = set(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    assert small <= big


def test_rate_one_keeps_all_rate_zero_none(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 1.0).count() == 100
    assert hash_sample(df, "k", 0.0).count() == 0


def test_matches_duckdb(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    got = sorted(r["k"] for r in hash_sample(df, "k", 0.2).collect())
    con = duckdb.connect()
    exp = [r[0] for r in con.execute(
        "SELECT k FROM range(500) t(k) WHERE"
        " substr(md5(CAST(k AS VARCHAR)), 1, 4) < ? ORDER BY k",
        [hash_threshold(0.2)]).fetchall()]
    assert got == exp


def test_stratified_rates(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string"))
        .alias("grp"))
    out = stratified_hash_sample(
        df, "k", "grp", {"s0": 0.9, "s1": 0.1}).groupBy("grp").count()
    counts = {r["grp"]: r["count"] for r in out.collect()}
    assert 1600 < counts["s0"] <= 2000
    assert counts["s1"] < 400


def test_pure_filter_plan(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit("s0").alias("grp"))
    plan = (stratified_hash_sample(df, "k", "grp", {"s0": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "Join"):
        assert marker not in plan
