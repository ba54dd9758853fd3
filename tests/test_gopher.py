"""gopher_quality: the published Gopher A.1.1 rule set, rule by rule."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.functions.textstats import (
    GOPHER_STOPWORDS,
    gopher_quality,
)

# 60 words, mean length in range, 2 stopwords, no symbols/bullets
GOOD = ("the quick brown fox jumps over lazy dogs and keeps running "
        "through green fields " * 5).strip()


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text: string")
    return df.select(gopher_quality(F.col("text")).alias("g")).first()["g"]


def test_good_doc_passes(spark):
    g = _one(spark, GOOD)
    assert g["passes"] is True
    assert g["n_words"] == 70
    assert g["stop_hits"] >= 2
    assert g["alpha_ratio"] == 1.0


def test_too_short_fails(spark):
    g = _one(spark, "the and short doc")
    assert g["n_words"] == 4
    assert g["passes"] is False


def test_symbol_ratio_rule(spark):
    g = _one(spark, GOOD + " " + "# " * 20)
    assert g["symbol_ratio"] > 0.1
    assert g["passes"] is False


def test_ellipsis_counted_as_symbol(spark):
    g = _one(spark, GOOD + " wait... more... dots... " * 4)
    assert g["symbol_ratio"] > 0.1
    assert g["passes"] is False


def test_bullet_lines_rule(spark):
    bullets = "\n".join(f"- item {i}" for i in range(20))
    g = _one(spark, GOOD.replace(" ", " ")[:0] + bullets + "\n" + GOOD)
    # 20 of 21 non-blank lines are bullets > 0.9
    assert g["bullet_ratio"] > 0.9
    assert g["passes"] is False


def test_ellipsis_line_endings_rule(spark):
    lines = "\n".join([GOOD, "read more...", "continued...",
                       "loading…"])
    g = _one(spark, lines)
    assert g["ellipsis_ratio"] == 0.75
    assert g["passes"] is False


def test_alpha_ratio_rule(spark):
    digits = " ".join(str(i) for i in range(40))
    g = _one(spark, GOOD + " " + digits)
    assert g["alpha_ratio"] < 0.8
    assert g["passes"] is False


def test_stopword_rule(spark):
    # long alpha text with zero required stopwords
    g = _one(spark, "lorem ipsum dolor sit amet " * 20)
    assert g["stop_hits"] == 0
    assert g["passes"] is False
    assert len(GOPHER_STOPWORDS) == 8


def test_mean_word_length_rule(spark):
    g = _one(spark, "a b c d e " * 20 + "the be")
    assert g["mean_word_len"] < 3.0
    assert g["passes"] is False


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "text: string")
    rows = df.select(gopher_quality(F.col("text")).alias("g")).collect()
    for r in rows:
        assert r["g"]["n_words"] == 0
        assert r["g"]["passes"] is False
        assert r["g"]["mean_word_len"] == 0.0


def test_pure_column_plan(spark):
    df = spark.range(5).select(F.lit(GOOD).alias("text"))
    plan = (df.select(gopher_quality(F.col("text")).alias("g"))
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
