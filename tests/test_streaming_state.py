"""Stateful streaming sessionization vs the batch window computation.

The applyInPandasWithState operator must produce exactly the sessions
the batch lag/cumsum sessionizer finds — closed sessions after the
stream drains (final open sessions stay in state unless timed out;
the comparison accounts for that)."""
import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "value")
        .limit(2000)
    )
    events.coalesce(2).write.mode("overwrite").parquet(str(d / "in"))
    return str(d)


def _batch_sessions(spark, path):
    """Window-function twin (same GAP) incl. the open last session."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = (
        spark.read.parquet(path)
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    w = Window.partitionBy("user_id").orderBy("us")
    sess = (
        e.withColumn(
            "new_s",
            ((F.col("us") - F.lag("us").over(w) >= 1_800_000_000)
             | F.lag("us").over(w).isNull()).cast("int"))
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    return sess


def test_stateful_sessions_match_batch(spark, events_dir):
    from document_extractor_spark.streaming_state import stateful_sessions

    in_dir = os.path.join(events_dir, "in")
    out_dir = os.path.join(events_dir, "out")
    ckpt = os.path.join(events_dir, "ckpt")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(in_dir)
    )
    q = (
        stateful_sessions(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir).toPandas()
    want = _batch_sessions(spark, in_dir).toPandas()
    assert len(got) > 0

    # the stream emits only CLOSED sessions; every emitted session must
    # exactly match a batch session (same start/end/count/sum)
    key = ["user_id", "session_start_us"]
    merged = got.merge(want, on=key, suffixes=("", "_b"), how="left")
    assert merged.session_end_us_b.notna().all()
    assert (merged.session_end_us == merged.session_end_us_b).all()
    assert (merged.n_events == merged.n_events_b).all()
    assert ((merged.total_value - merged.total_value_b).abs() < 1e-9).all()

    # per user, the stream may hold back at most the final open session
    got_n = got.groupby("user_id").size()
    want_n = want.groupby("user_id").size()
    joined = pd.concat([got_n, want_n], axis=1).fillna(0)
    joined.columns = ["got", "want"]
    assert ((joined["want"] - joined["got"]).isin([0, 1])).all()
