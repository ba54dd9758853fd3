"""As-of join and binned range join: hand-computed semantics, tie
handling, null fill, and plan-shape guards (no nested-loop joins)."""
import pandas as pd

from pyspark.sql import functions as F


def test_asof_backward_with_ties_and_nulls(spark):
    from document_extractor_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 10), (3, "u", 20), (4, "v", 7)],
        "event_id long, user_id string, us long")
    right = spark.createDataFrame(
        [("u", 10, 1.0),    # equal ts -> matches (>= semantics)
         ("u", 12, 2.0),
         ("w", 1, 9.0)],    # other key, never matches
        "user_id string, us long, value double")
    got = (
        asof_join(left, right, on="us", by="user_id",
                  value_cols=("value",))
        .orderBy("event_id").toPandas()
    )
    assert got.value.isna().iloc[0]          # 5 < first right ts
    assert got.value.iloc[1] == 1.0          # tie at 10 matches
    assert got.value.iloc[2] == 2.0          # latest <= 20
    assert got.value.isna().iloc[3]          # v has no right rows
    assert list(got.event_id) == [1, 2, 3, 4]  # all left rows kept


def test_asof_matches_pandas_merge_asof(spark):
    from document_extractor_spark.operators.temporal import asof_join

    e = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp_ltz")))
    )
    left = e.filter("event_type = 'click'").select(
        "event_id", "user_id", "us")
    right = e.filter("event_type = 'purchase'").select(
        "user_id", "us", "value")
    got = (
        asof_join(left, right, on="us", by="user_id",
                  value_cols=("value",))
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("us")
    rp = right.toPandas().sort_values("us")
    want = (
        pd.merge_asof(lp, rp, on="us", by="user_id",
                      direction="backward")
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got.value, want.value)


def test_asof_value_col_clash_raises(spark):
    from document_extractor_spark.operators.temporal import asof_join

    df = spark.createDataFrame([(1, "u", 1, 0.0)],
                               "event_id long, user_id string, "
                               "us long, value double")
    try:
        asof_join(df, df, on="us", by="user_id", value_cols=("value",))
        assert False, "expected ValueError"
    except ValueError as exc:
        assert "clash" in str(exc)


def test_range_join_bins_exact(spark):
    from document_extractor_spark.operators.temporal import range_join_bins

    intervals = spark.createDataFrame(
        [(1, 10, 20), (2, 15, 40), (3, 100, 100)],
        "iid long, start long, end long")
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([9, 10, 15, 20, 21, 40, 100, 101])],
        "pid long, p long")
    got = range_join_bins(points, intervals, "p", "start", "end",
                          bin_width=7).toPandas()
    pairs = set(zip(got.iid, got.p))
    assert pairs == {(1, 10), (1, 15), (1, 20),
                     (2, 15), (2, 20), (2, 21), (2, 40),
                     (3, 100)}
    # no duplicate (interval, point) pairs from bin spanning
    assert not got.duplicated(["iid", "pid"]).any()


def test_temporal_plans_never_nested_loop(spark):
    from document_extractor_spark.operators.temporal import (
        asof_join, range_join_bins,
    )

    left = spark.createDataFrame([(1, "u", 5)],
                                 "event_id long, user_id string, us long")
    right = spark.createDataFrame([("u", 1, 1.0)],
                                  "user_id string, us long, value double")
    p1 = asof_join(left, right, on="us", by="user_id",
                   value_cols=("value",))._jdf.queryExecution() \
        .executedPlan().toString()
    intervals = spark.createDataFrame([(1, 10, 20)],
                                      "iid long, start long, end long")
    points = spark.createDataFrame([(1, 15)], "pid long, p long")
    p2 = range_join_bins(points, intervals, "p", "start", "end",
                         10)._jdf.queryExecution().executedPlan().toString()
    for plan in (p1, p2):
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan


def test_asof_join_attaches_rows_atomically(spark):
    """A right row with NULL values must still WIN as the latest row
    (merge_asof semantics) — per-column last(ignorenulls) would carry
    stale values and tear multiple columns across different right rows
    (review finding)."""
    import pandas as pd

    left = spark.createDataFrame(
        [(1, 3), (1, 10)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, 1, 1.0, None), (1, 2, None, 2.0), (1, None, 9.0, 9.0)],
        "user_id long, ts long, a double, b double")
    from document_extractor_spark.operators.temporal import asof_join

    got = (asof_join(left, right, on="ts", by="user_id",
                     value_cols=("a", "b"))
           .toPandas().sort_values("ts").reset_index(drop=True))
    # latest right row at ts<=3 is ts=2 -> (a=NULL, b=2.0) as a UNIT
    assert pd.isna(got.loc[0, "a"])
    assert got.loc[0, "b"] == 2.0
    assert pd.isna(got.loc[1, "a"]) and got.loc[1, "b"] == 2.0
    # pandas twin agrees
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().dropna(subset=["ts"]).sort_values("ts")
    rp["ts"] = rp.ts.astype("int64")
    want = pd.merge_asof(lp, rp, on="ts", by="user_id",
                         direction="backward")
    assert pd.isna(want.loc[0, "a"]) and want.loc[0, "b"] == 2.0


def test_asof_join_null_right_key_excluded(spark):
    """Right rows with NULL `on` must not be inherited by anyone."""
    from document_extractor_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 0)], "user_id long, ts long")
    right = spark.createDataFrame(
        [(1, None, 9.0)], "user_id long, ts long, value double")
    got = asof_join(left, right).toPandas()
    assert got.value.isna().all()
