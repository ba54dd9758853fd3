"""script_profile: codepoint-range script classes + dominant pick."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.functions.textstats import (
    SCRIPT_CLASSES,
    script_profile,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text: string")
    return df.select(script_profile(F.col("text")).alias("s")).first()["s"]


def test_latin_dominant():
    assert SCRIPT_CLASSES[0][0] == "latin"  # tie-break priority pinned


def test_pure_english(spark):
    s = _one(spark, "hello world")
    assert s["n_latin"] == 10
    assert s["dominant"] == "latin"
    assert s["dominant_share"] == 1.0


def test_cyrillic_dominant(spark):
    s = _one(spark, "Привет мир ok")
    assert s["n_cyrillic"] == 9
    assert s["n_latin"] == 2
    assert s["dominant"] == "cyrillic"


def test_cjk_family_pooled(spark):
    # han + hiragana + hangul pool into one cjk count
    s = _one(spark, "你好 こんにちは 안녕")
    assert s["n_cjk"] == 9
    assert s["dominant"] == "cjk"


def test_mixed_tie_breaks_by_priority(spark):
    # 2 latin letters vs 2 cyrillic letters: latin listed first wins
    s = _one(spark, "ab Пр")
    assert s["n_latin"] == 2 and s["n_cyrillic"] == 2
    assert s["dominant"] == "latin"


def test_no_letters_unknown(spark):
    s = _one(spark, "12345 .,!? 99")
    assert s["n_letters"] == 0
    assert s["dominant"] == "unknown"
    assert s["dominant_share"] == 0.0


def test_null_text(spark):
    df = spark.createDataFrame([(None,)], "text: string")
    s = df.select(script_profile(F.col("text")).alias("s")).first()["s"]
    assert s["dominant"] == "unknown"
    assert s["n_letters"] == 0


def test_arabic_greek_devanagari(spark):
    s = _one(spark, "مرحبا Γειά नमस्ते")
    assert s["n_arabic"] == 5
    assert s["n_greek"] == 4
    assert s["n_devanagari"] > 0
