"""repetition_signals / gopher_repetition_flags."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.operators.repetition import (
    gopher_repetition_flags,
    repetition_signals,
)


def _sig(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    return repetition_signals(df).first()


def test_clean_doc_zero_signals(spark):
    s = _sig(spark, "every word here is used exactly once today")
    assert s["dup_line_frac"] == 0.0
    assert s["dup_line_char_frac"] == 0.0
    assert s["top2_char_frac"] == 0.0
    assert s["n_lines"] == 1


def test_duplicate_lines_counted(spark):
    # 4 lines, "spam line" twice -> 1 duplicate occurrence of 4 lines
    s = _sig(spark, "spam line\nunique a\nspam line\nunique bb")
    assert s["n_lines"] == 4
    assert s["dup_line_frac"] == 0.25
    # dup chars = 9 over total = 9+8+9+9 = 35
    assert abs(s["dup_line_char_frac"] - 9 / 35) < 1e-6


def test_lines_trimmed_and_blanks_dropped(spark):
    s = _sig(spark, "  x  \nx\n\n   \nx")
    assert s["n_lines"] == 3
    assert abs(s["dup_line_frac"] - 2 / 3) < 1e-6


def test_top_bigram_mass(spark):
    # "ab cd" occurs twice: mass = 2 * 4 chars = 8; total non-ws
    # chars = 10
    s = _sig(spark, "ab cd ab cd ef")
    assert abs(s["top2_char_frac"] - 8 / 10) < 1e-6


def test_single_occurrence_gram_is_not_repetition(spark):
    s = _sig(spark, "one two three four")
    assert s["top2_char_frac"] == 0.0
    assert s["top3_char_frac"] == 0.0
    assert s["top4_char_frac"] == 0.0


def test_trigram_and_fourgram(spark):
    text = "a b c d " * 3  # "a b c" x3, "a b c d" x3 (overlapping)
    s = _sig(spark, text.strip())
    assert s["top3_char_frac"] > 0
    assert s["top4_char_frac"] > 0


def test_flags_thresholds(spark):
    bad = "spam spam spam spam spam spam spam spam"
    good = ("the quick brown fox jumps over a lazy dog and then keeps "
            "going through very green fields forever onward")
    df = spark.createDataFrame([(1, bad), (2, good)],
                               "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in gopher_repetition_flags(df).collect()}
    assert out[1]["passes"] is False
    assert out[2]["passes"] is True


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r["n_lines"] == 0
        assert r["dup_line_frac"] == 0.0
        assert r["top2_char_frac"] == 0.0


def test_short_doc_fewer_words_than_n(spark):
    s = _sig(spark, "only three words")
    assert s["top4_char_frac"] == 0.0
