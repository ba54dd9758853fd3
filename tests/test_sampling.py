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


# ------------------------------------------------------- token budget ----
def _budget_docs(spark, n=60):
    import hashlib
    rows = [(i, f"s{i % 3}", 10 + (i % 7)) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id: long, source: string, n_tokens: long")


def test_token_budget_inclusive_walk_order(spark):
    from document_extractor_spark.functions.sampling import (
        token_budget_sample)
    import hashlib

    d = _budget_docs(spark)
    out = token_budget_sample(d, "doc_id", "source", "n_tokens",
                              budget=50).collect()
    # recompute expectation in plain Python: md5 walk order per
    # stratum, inclusive cumsum <= budget
    by_src: dict[str, list] = {}
    for r in d.collect():
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_src.setdefault(r["source"], []).append(
            (h, r["doc_id"], r["n_tokens"]))
    expect = {}
    for src, items in by_src.items():
        cum = 0
        for h, did, nt in sorted(items):
            cum += nt
            expect[did] = (cum, cum <= 50)
    got = {r["doc_id"]: (r["cum_tokens"], r["kept"]) for r in out}
    assert got == expect


def test_token_budget_two_phase_equals_naive_window(spark):
    from pyspark.sql import Window
    from document_extractor_spark.functions.sampling import (
        token_budget_sample)

    d = _budget_docs(spark, n=200)
    two = token_budget_sample(d, "doc_id", "source", "n_tokens",
                              budget=300, bucket_chars=1)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")))
    naive = d.withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    ).withColumn("kept", F.col("cum_tokens") <= 300)
    a = sorted(tuple(r) for r in two.collect())
    b = sorted(tuple(r) for r in
               naive.select(*two.columns).collect())
    assert a == b


def test_token_budget_nested_subset_and_overrides(spark):
    from document_extractor_spark.functions.sampling import (
        token_budget_sample)

    d = _budget_docs(spark)
    small = {r["doc_id"] for r in token_budget_sample(
        d, "doc_id", "source", "n_tokens", budget=40).collect()
        if r["kept"]}
    big = {r["doc_id"] for r in token_budget_sample(
        d, "doc_id", "source", "n_tokens", budget=120).collect()
        if r["kept"]}
    assert small <= big  # nested-subset property
    # per-stratum override: s1 budget 0 -> nothing kept from s1
    z = token_budget_sample(d, "doc_id", "source", "n_tokens",
                            budget=120, budgets={"s1": 0}).collect()
    assert not any(r["kept"] for r in z if r["source"] == "s1")
    assert any(r["kept"] for r in z if r["source"] == "s0")


def test_temperature_mix_rebalances_toward_tail(spark):
    from document_extractor_spark.functions.sampling import (
        temperature_mix_sample)

    # dominant stratum 900 docs, tail stratum 100 docs
    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "small") for i in range(100)])
    d = spark.createDataFrame(rows, "doc_id long, source string")
    dec = temperature_mix_sample(d, "doc_id", "source")
    per = {r.source: r for r in
           dec.groupBy("source").agg(
               F.first("keep_thr").alias("t"),
               F.sum(F.col("kept").cast("int")).alias("k"),
               F.count("*").alias("n")).collect()}
    # alpha=0.5: keep RATE for the tail stratum must exceed the
    # dominant one's (sqrt re-weighting), and realized counts track
    # the thresholds
    assert (per["small"].t / 65536) > (per["big"].t / 65536)
    assert per["small"].k / per["small"].n > per["big"].k / per["big"].n
    # overall target ~ 1/2 of the corpus (lattice + hash noise)
    kept = sum(p.k for p in per.values())
    assert 380 <= kept <= 620
    # exact integer thresholds: recompute in Python
    import math
    n_tot = 1000
    w = {"big": math.isqrt(900 * 10**6), "small": math.isqrt(100 * 10**6)}
    s = sum(w.values())
    for src, n in [("big", 900), ("small", 100)]:
        assert per[src].t == min(
            65536, (n_tot // 2) * w[src] * 65536 // (s * n))


def test_temperature_mix_determinism_and_single_stratum(spark):
    from document_extractor_spark.functions.sampling import (
        temperature_mix_sample)

    d = spark.createDataFrame(
        [(i, "only") for i in range(200)], "doc_id long, source string")
    a = {r.doc_id: r.kept
         for r in temperature_mix_sample(d, "doc_id", "source").collect()}
    b = {r.doc_id: r.kept
         for r in temperature_mix_sample(
             d.repartition(7), "doc_id", "source").collect()}
    assert a == b  # partitioning-independent
    # single stratum degenerates to plain target_frac sampling
    kept = sum(a.values())
    assert 60 <= kept <= 140


def test_temperature_mix_empty_input(spark):
    from document_extractor_spark.functions.sampling import (
        temperature_mix_sample)

    d = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_mix_sample(d, "doc_id", "source").count() == 0


def test_temperature_mix_null_stratum(spark):
    from document_extractor_spark.functions.sampling import (
        temperature_mix_sample)

    rows = [(i, "a" if i % 2 else None) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    dec = temperature_mix_sample(d, "doc_id", "source")
    out = dec.collect()
    assert len(out) == 100
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # the NULL stratum is a real bucket: counted and thresholded
    assert len(by_src[None]) == 50
    assert all(r.n_d == 50 for r in by_src[None])
    assert all(r.keep_thr > 0 for r in out)


def test_exact_stratum_holdout(spark):
    from document_extractor_spark.functions.sampling import (
        exact_stratum_holdout)

    rows = [(i, "s%d" % (i % 3)) for i in range(60)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    got = exact_stratum_holdout(df, "doc_id", "stratum", k=5).toPandas()
    sizes = got.groupby("stratum").size()
    assert sizes["s0"] == sizes["s1"] == sizes["s2"] == 5
    assert sizes["tiny"] == 1          # min(k, n)
    # deterministic across runs and partitionings
    again = exact_stratum_holdout(
        df.repartition(7), "doc_id", "stratum", k=5).toPandas()
    assert (set(map(tuple, got.values.tolist()))
            == set(map(tuple, again.values.tolist())))
    # nested property: k=3 selection is a subset of k=5
    k3 = exact_stratum_holdout(df, "doc_id", "stratum", k=3).toPandas()
    assert set(k3.doc_id) <= set(got.doc_id)
    # empty frame
    empty = spark.createDataFrame([], "doc_id long, stratum string")
    assert exact_stratum_holdout(empty, "doc_id", "stratum", 5).count() == 0


def test_token_budget_null_stratum_and_duplicate_keys(spark):
    """NULL strata are a legitimate group (missing lang id): every
    input row must appear in the decision table; duplicate keys must
    not make cum_tokens order retry-dependent (key tiebreaker)."""
    from document_extractor_spark.functions.sampling import (
        token_budget_sample)

    rows = [("a", None, 100), ("b", None, 200), ("c", "en", 300),
            ("dup", "en", 50), ("dup", "en", 70)]
    df = spark.createDataFrame(rows, "k string, s string, nt long")
    got = token_budget_sample(df, "k", "s", "nt", budget=250).toPandas()
    assert len(got) == 5                    # NULL-stratum rows present
    nulls = got[got.s.isna()]
    assert len(nulls) == 2 and nulls.cum_tokens.max() == 300
    # determinism across partitionings incl. the duplicate-key pair
    again = token_budget_sample(
        df.repartition(7), "k", "s", "nt", budget=250).toPandas()
    key = ["k", "s", "nt"]
    a = got.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
