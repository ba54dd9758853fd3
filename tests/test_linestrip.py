"""strip_boilerplate_lines: CCNet-style corpus-frequency line removal."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.operators.dedup import (
    strip_boilerplate_lines,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_hot_lines_removed_everywhere(spark):
    boiler = "Subscribe to our newsletter"
    rows = [(i, f"{boiler}\nunique body {i}\n  {boiler}  ")
            for i in range(5)]
    out = {r["doc_id"]: r for r in
           strip_boilerplate_lines(_mk(spark, rows),
                                   min_doc_count=4).collect()}
    assert len(out) == 5
    for i in range(5):
        # both copies of the hot line struck, whitespace-variant too
        # (frequency is counted on the trimmed form)
        assert out[i]["cleaned"] == f"unique body {i}"
        assert out[i]["n_kept"] == 1
        assert out[i]["n_dropped"] == 2


def test_below_threshold_lines_survive(spark):
    shared = "seen in three docs only"
    rows = [(i, f"{shared}\nbody {i}") for i in range(3)]
    rows += [(10, "solo doc line")]
    out = {r["doc_id"]: r for r in
           strip_boilerplate_lines(_mk(spark, rows),
                                   min_doc_count=4).collect()}
    for i in range(3):
        assert out[i]["cleaned"] == f"{shared}\nbody {i}"
        assert out[i]["n_dropped"] == 0
    assert out[10]["cleaned"] == "solo doc line"


def test_all_boilerplate_doc_yields_empty(spark):
    hot = "cookie banner"
    rows = [(i, hot) for i in range(4)]
    out = {r["doc_id"]: r for r in
           strip_boilerplate_lines(_mk(spark, rows),
                                   min_doc_count=4).collect()}
    assert len(out) == 4
    for i in range(4):
        assert out[i]["cleaned"] == ""
        assert out[i]["n_kept"] == 0
        assert out[i]["n_dropped"] == 1


def test_duplicate_within_one_doc_not_hot(spark):
    """Frequency is DISTINCT docs: 10 copies inside one doc != hot."""
    rows = [(1, "\n".join(["refrain"] * 10) + "\nbody")]
    out = strip_boilerplate_lines(_mk(spark, rows),
                                  min_doc_count=4).collect()
    assert out[0]["cleaned"].count("refrain") == 10
    assert out[0]["n_dropped"] == 0


def test_blank_lines_dropped_order_kept(spark):
    rows = [(1, "a\n\n  \nb\nc")]
    out = strip_boilerplate_lines(_mk(spark, rows),
                                  min_doc_count=4).collect()
    assert out[0]["cleaned"] == "a\nb\nc"
    assert out[0]["n_kept"] == 3


def test_null_text_docs_absent(spark):
    rows = [(1, None), (2, "keep me")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = strip_boilerplate_lines(df, min_doc_count=4).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_no_python_stage_and_shuffle_budget(spark):
    """Plan shape: pure JVM, <= 4 hash exchanges at this size."""
    rows = [(i, f"x\nbody {i}") for i in range(8)]
    plan = (strip_boilerplate_lines(_mk(spark, rows), min_doc_count=4)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan
