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


def test_kmeans_kernel_matches_expression_path(spark, monkeypatch):
    """The Arrow argmin kernel (k >= _KERNEL_MIN_K) must be
    bit-identical to the literal-centroid expression path on every
    row — including the tie -> lowest-cluster and NULL -> cluster 0
    rules — across multiple centroid-update iterations."""
    import document_extractor_spark.operators.semdedup as sd

    # seeded adversarial mix: clusterable blobs, exact ties (identical
    # vectors), zero vectors, negatives, one NULL embedding
    rows = []
    for i in range(400):
        v = [((i * 7 + d * 13) % 29) - 14 for d in range(6)]
        if i % 17 == 0:
            v = [0] * 6                    # zero vectors tie everywhere
        if i % 50 == 3:
            v = [5, -5, 5, -5, 5, -5]      # repeated identical vectors
        rows.append((i, v))
    emb = _emb(spark, rows).unionByName(spark.createDataFrame(
        [(999, None)], "doc_id long, embedding array<long>"))

    k = max(40, sd._KERNEL_MIN_K + 8)
    assert k >= sd._KERNEL_MIN_K
    kern = sorted(map(tuple,
                      kmeans_assign(emb, k=k, iters=3).collect()))
    monkeypatch.setattr(sd, "_KERNEL_MIN_K", 10 ** 9)
    expr = sorted(map(tuple,
                      kmeans_assign(emb, k=k, iters=3).collect()))
    assert kern == expr
    assert dict(kern)[999] == 0  # NULL embedding -> cluster 0


def test_semdedup_pair_kernel_matches_expression_path(spark, monkeypatch):
    """Full semdedup with the Arrow pair kernel (k >= _KERNEL_MIN_K)
    must equal the expression pair-join path row for row — near-dup
    groups, exact duplicates, empty docs and all."""
    import document_extractor_spark.operators.semdedup as sd

    rows = []
    for i in range(200):
        base = f"alpha beta w{i % 9} gamma delta common tokens here"
        if i % 3 == 0:
            base += f" extra{i % 5}"
        if i % 23 == 0:
            base = ""          # zero vectors never pair
        rows.append((i, base))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k = max(40, sd._KERNEL_MIN_K + 8)
    kern = sorted(map(tuple,
                      semdedup(docs, dim=16, k=k, iters=2).collect()))
    monkeypatch.setattr(sd, "_KERNEL_MIN_K", 10 ** 9)
    expr = sorted(map(tuple,
                      semdedup(docs, dim=16, k=k, iters=2).collect()))
    assert kern == expr
    # sanity: the corpus really produces near-dup components
    assert any(not r[3] for r in kern)


def test_kmeans_kernel_int64_fallback_exact(spark, monkeypatch):
    """Values past the float64-exact bound must take the int64 matmul
    branch and still match the expression path."""
    import document_extractor_spark.operators.semdedup as sd

    big = sd._f64_exact_bound(3) * 4
    rows = [(i, [big + i, -big - 2 * i, i * 3]) for i in range(80)]
    emb = _emb(spark, rows)
    k = max(40, sd._KERNEL_MIN_K)
    kern = sorted(map(tuple, kmeans_assign(emb, k=k, iters=2).collect()))
    monkeypatch.setattr(sd, "_KERNEL_MIN_K", 10 ** 9)
    expr = sorted(map(tuple, kmeans_assign(emb, k=k, iters=2).collect()))
    assert kern == expr


def _cbs(spark, rows, **kw):
    from document_extractor_spark.operators.semdedup import (
        cluster_balanced_sample)
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return cluster_balanced_sample(df, **kw)


def test_cluster_balance_caps_each_cluster(spark):
    rows = [(i, f"alpha beta w{i % 7} w{i % 3}") for i in range(60)]
    out = _cbs(spark, rows, cap=5, dim=8, k=3).collect()
    assert len(out) == 60
    from collections import Counter
    kept = Counter(r["cluster"] for r in out if r["keep"])
    assert all(v <= 5 for v in kept.values())
    # a cluster with <= cap members keeps all of them
    sizes = Counter(r["cluster"] for r in out)
    for c, n in sizes.items():
        assert kept[c] == min(n, 5)


def test_cluster_balance_matches_naive_window(spark):
    """skew_safe two-phase selection == the naive per-cluster
    row_number window on the same md5 priority."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from document_extractor_spark.operators.semdedup import (
        kmeans_assign)
    from document_extractor_spark.functions.embed import (
        hashed_embeddings)

    rows = [(i, f"tok{i % 11} tok{i % 5} filler text") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["cluster"], r["keep"])
           for r in _cbs(spark, rows, cap=7, dim=8, k=4).collect()}
    emb = hashed_embeddings(df, dim=8)
    cl = kmeans_assign(emb, k=4, iters=2)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
               16, 10).cast("long")
    w = Window.partitionBy("cluster").orderBy(h.asc(),
                                              F.col("doc_id").asc())
    want = {r["doc_id"]: (r["cluster"], r["rn"] <= 7)
            for r in cl.withColumn("rn", F.row_number().over(w))
            .collect()}
    assert got == want


def test_cluster_balance_edges(spark):
    import pytest as _pytest
    # empty corpus
    out = _cbs(spark, [], cap=3, dim=8, k=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "cluster", "keep"]
    # cap=1: exactly one keeper per non-empty cluster
    rows = [(i, "same text everywhere") for i in range(10)]
    res = _cbs(spark, rows, cap=1, dim=8, k=2).collect()
    from collections import Counter
    kept = Counter(r["cluster"] for r in res if r["keep"])
    assert all(v == 1 for v in kept.values())
    # NULL text embeds as zeros and still gets clustered + flagged
    res2 = _cbs(spark, [(1, None), (2, "x")], cap=5, dim=8, k=2).collect()
    assert len(res2) == 2 and all(r["keep"] for r in res2)
    with _pytest.raises(ValueError):
        _cbs(spark, rows, cap=0, dim=8, k=2)
