"""DSIR importance weights + selection: edge cases, explicit-target
mode, determinism."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.functions.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_array_shapes(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = df.select(
        "doc_id",
        F.size(hashed_ngram_features()).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    # "a b c": 3 unigrams + 2 bigrams; "solo": 1 + 0; "": 0
    assert got[1] == 5 and got[2] == 1 and got[3] == 0
    # NULL text -> empty feature array (coalesced), not NULL
    assert got[4] == 0


def test_null_and_empty_docs_get_rows_never_selected(spark):
    good = ("the quick brown fox jumps over the lazy dog and keeps "
            "going through the green fields ") * 5
    df = _docs(spark, [(0, good), (1, good + "extra"), (2, ""),
                       (3, None)])
    out = dsir_select(dsir_weights(df), k=1).toPandas() \
        .set_index("doc_id")
    assert set(out.index) == {0, 1, 2, 3}
    assert out.loc[2, "n_feat"] == 0 and not out.loc[2, "selected"]
    assert out.loc[3, "n_feat"] == 0 and not out.loc[3, "selected"]
    assert out.selected.sum() == 1


def test_k_exceeds_weighted_docs(spark):
    df = _docs(spark, [(0, "alpha beta"), (1, None)])
    out = dsir_select(dsir_weights(df), k=100).toPandas() \
        .set_index("doc_id")
    assert bool(out.loc[0, "selected"]) and not out.loc[1, "selected"]


def test_explicit_target_shifts_weights(spark):
    """Docs sharing the explicit target corpus's n-grams must
    outweigh docs that don't."""
    target = _docs(spark, [(100, "spark query engine optimizer "
                                 "catalyst plan execution")])
    raw = _docs(spark, [
        (0, "spark query engine optimizer catalyst"),   # target-like
        (1, "bananas oranges apples pears grapes"),     # unrelated
    ])
    w = dsir_weights(raw, target_docs=target).toPandas() \
        .set_index("doc_id")
    assert w.loc[0, "dsir_logw"] > w.loc[1, "dsir_logw"]


def test_deterministic_across_partitioning(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} common words here {i % 5}")
            for i in range(60)]
    a = dsir_select(dsir_weights(_docs(spark, rows)), k=10)
    b = dsir_select(
        dsir_weights(_docs(spark, rows).repartition(16)), k=10)
    ca = sorted(map(tuple, a.collect()))
    cb = sorted(map(tuple, b.collect()))
    assert ca == cb


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert dsir_select(dsir_weights(df), k=5).count() == 0
