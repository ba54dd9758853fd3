"""SoftDedup reweighting: commonness ordering, weight normalization,
edge cases."""
from __future__ import annotations

import math

from document_extractor_spark.functions.softdedup import (
    softdedup_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_common_docs_get_lower_weight(spark):
    # doc 1-3 repeat the same text (common bigrams); doc 4 is unique
    df = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "zymurgy xylophone quartz vortex blitz"),
    ])
    got = {r["doc_id"]: r for r in softdedup_weights(df).collect()}
    assert got[1]["mean_log_p"] == got[2]["mean_log_p"]
    # the repeated doc's grams are 3x more frequent -> less negative
    assert got[1]["mean_log_p"] > got[4]["mean_log_p"]
    # rarest doc anchors the normalized weight at exactly 1.0
    assert got[4]["soft_weight"] == 1.0
    assert 0 < got[1]["soft_weight"] < 1.0


def test_mean_log_p_value(spark):
    # two docs, fully disjoint bigrams, each bigram occurs once:
    # p = 1/N for every gram -> mean_log_p = ln(1/N)
    df = _docs(spark, [(1, "a b c"), (2, "x y z")])
    rows = {r["doc_id"]: r for r in softdedup_weights(df).collect()}
    n_total = 4  # 2 bigrams per doc
    want = round(math.log(1.0 / n_total), 4)
    assert rows[1]["mean_log_p"] == want == rows[2]["mean_log_p"]
    assert rows[1]["n_grams"] == 2
    assert rows[1]["soft_weight"] == 1.0 == rows[2]["soft_weight"]


def test_empty_and_single_token_docs(spark):
    df = _docs(spark, [
        (1, "a b c d"), (2, ""), (3, None), (4, "solo"),
    ])
    got = {r["doc_id"]: (r["n_grams"], r["mean_log_p"],
                         r["soft_weight"])
           for r in softdedup_weights(df).collect()}
    assert got[1][0] == 3
    for did in (2, 3, 4):  # no bigrams -> counted, never scored
        assert got[did] == (0, None, None)


def test_degenerate_all_empty(spark):
    df = _docs(spark, [(1, ""), (2, None)])
    got = {r["doc_id"]: r["soft_weight"]
           for r in softdedup_weights(df).collect()}
    assert got == {1: None, 2: None}


def test_weights_in_unit_interval(spark):
    df = _docs(spark, [
        (i, f"shared prefix tokens number {i} tail {i % 3}")
        for i in range(30)
    ])
    for r in softdedup_weights(df).collect():
        assert 0.0 < r["soft_weight"] <= 1.0
        assert r["mean_log_p"] <= 0.0


def test_degenerate_single_bucket_twin_parity(spark):
    # every bigram in ONE bucket -> p=1 -> mean_log_p=0.0 -> min_log
    # 0.0: the Spark side emits weight 1.0 where defined; the DuckDB
    # twin must take the SAME degenerate branch (pinned: the branch
    # was originally Spark-only and the twins diverged via 0.0/0.0)
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    rows = [(1, "a a a"), (2, "a a"), (3, "")]
    got = {r["doc_id"]: (r["mean_log_p"], r["soft_weight"])
           for r in softdedup_weights(_docs(spark, rows)).collect()}
    assert got[1] == (0.0, 1.0) and got[2] == (0.0, 1.0)
    assert got[3] == (None, None)

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    odf = con.execute(entry.oracle_sql()["softdedup_weights"]).fetchdf()
    oracle = {
        int(r.doc_id): (
            None if pd.isna(r.mean_log_p) else float(r.mean_log_p),
            None if pd.isna(r.soft_weight) else float(r.soft_weight))
        for r in odf.itertuples()}
    assert oracle == got
