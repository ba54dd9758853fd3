"""Bucketed tables co-locate joins: the at-scale answer to "this join
shuffles both sides every run". Writing both sides bucketed on the
join key lets Spark's FileSourceScanExec report the bucket
partitioning, so the join plans with ZERO Exchange on either side —
the property a 10^12-row url-keyed join pipeline relies on when the
same key joins across many stages."""
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "lang")
    scores = docs.select(
        "doc_id", (F.col("doc_id") % 7).alias("score"))
    import shutil
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for t in ("b_docs", "b_scores"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # orphaned location
    (docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
         .mode("overwrite").saveAsTable("b_docs"))
    (scores.write.bucketBy(8, "doc_id").sortBy("doc_id")
           .mode("overwrite").saveAsTable("b_scores"))
    # tiny test tables would broadcast (which also disables bucketed
    # scans); force the shuffle-vs-bucketed comparison the claim is
    # actually about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_docs").join(
            spark.table("b_scores"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: no hash/range repartition of either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Exchange rangepartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == docs.count()
        # contrast: the same join over plain (unbucketed) scans pays
        # a full shuffle of both sides
        plain = docs.join(scores, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("b_docs", "b_scores"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
