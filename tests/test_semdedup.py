"""SemDeDup: integer k-means + within-cluster cosine dedup."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_extractor_spark.operators.semdedup import (
    _trunc_div,
    kmeans_assign,
    semdedup,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, list(map(int, v))) for i, v in rows],
        "doc_id long, embedding array<long>")


def test_trunc_div_matches_sql_case_semantics():
    # CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3   # Python -7 // 2 would be -4
    assert _trunc_div(-6, 3) == -2
    assert _trunc_div(0, 5) == 0


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs far apart; init picks doc 0 (blob A) and doc 1
    # (blob B), so one iteration already separates them
    rows = [(0, [0, 0]), (1, [100, 100]), (2, [1, 0]), (3, [99, 100]),
            (4, [0, 1]), (5, [100, 99])]
    got = {r.doc_id: r.cluster
           for r in kmeans_assign(_emb(spark, rows), k=2).collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_fewer_docs_than_k(spark):
    rows = [(0, [1, 1]), (1, [5, 5])]
    out = kmeans_assign(_emb(spark, rows), k=8).collect()
    assert len(out) == 2


def test_kmeans_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, embedding array<long>")
    assert kmeans_assign(empty, k=3).count() == 0


def test_kmeans_degenerate_params(spark):
    df = _emb(spark, [(0, [1])])
    with pytest.raises(ValueError):
        kmeans_assign(df, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(df, k=1, iters=0)


def test_kmeans_deterministic_across_partitioning(spark):
    rows = [(i, [(i * 7) % 13, (i * 3) % 5, i % 4]) for i in range(50)]
    a = sorted(map(tuple, kmeans_assign(_emb(spark, rows), k=3).collect()))
    b = sorted(map(tuple, kmeans_assign(
        _emb(spark, rows).repartition(16), k=3).collect()))
    assert a == b


def test_semdedup_collapses_exact_duplicates(spark):
    text = ("the quick brown fox jumps over the lazy dog and keeps "
            "moving through very green fields ") * 3
    other = ("completely different content about spark catalyst "
             "query optimization and shuffle exchange planning ") * 3
    docs = spark.createDataFrame(
        [(0, text), (1, text), (2, other), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in semdedup(docs, dim=16, k=2).collect()}
    # exact dups share an embedding -> cos 1 -> one component
    assert out[0].component == 0 and out[1].component == 0
    assert out[0].is_keeper and not out[1].is_keeper
    # distinct content keeps itself; empty doc (zero vector) never pairs
    assert out[2].is_keeper and out[2].component == 2
    assert out[3].is_keeper and out[3].component == 3
    # same cluster for the dup pair
    assert out[0].cluster == out[1].cluster


def test_semdedup_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert semdedup(docs).count() == 0


def test_semdedup_null_text(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "real content here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in semdedup(docs, k=1).collect()}
    # NULL text -> zero vector -> dot 0 -> never a near-dup
    assert out[0].is_keeper and out[1].is_keeper


def test_kmeans_null_embedding_goes_to_cluster_zero(spark):
    """A NULL embedding must deterministically land in cluster 0 (the
    when-chain's historical behavior) and must not crash the centroid
    update's int() collect on a NULL cluster label."""
    from document_extractor_spark.operators.semdedup import kmeans_assign

    emb = spark.createDataFrame(
        [(1, [3, -1]), (2, [0, 4]), (3, None), (4, [-2, -2])],
        "doc_id: long, embedding: array<long>")
    out = {r["doc_id"]: r["cluster"]
           for r in kmeans_assign(emb, k=2, iters=2).collect()}
    assert out[3] == 0
    assert set(out) == {1, 2, 3, 4}
