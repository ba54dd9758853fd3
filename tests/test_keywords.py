"""tfidf_topk: scoring, ranking determinism, plan shape."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.operators.keywords import tfidf_topk


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_rare_term_outranks_common(spark):
    rows = [
        (1, "shared shared zebra"),
        (2, "shared shared shared"),
        (3, "shared common words"),
    ]
    out = tfidf_topk(_df(spark, rows), k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # zebra: tf=1, df=1 -> score 1*(4/2)=2.0; shared in doc1: tf=2,
    # df=3 -> 2*(4/4)=2.0; tie at 2.0 -> 'shared' < 'zebra' asc wins
    assert top[1] == "shared"
    # doc 2: only 'shared', tf=3 -> 3.0
    assert top[2] == "shared"


def test_scores_exact(spark):
    rows = [(1, "a a b"), (2, "b c")]
    out = {(r["doc_id"], r["term"]): r["score"]
           for r in tfidf_topk(_df(spark, rows), k=5).collect()}
    # N=2; a: df=1, b: df=2, c: df=1
    assert out[(1, "a")] == 2 * (3.0 / 2)   # tf=2
    assert out[(1, "b")] == 1 * (3.0 / 3)
    assert out[(2, "c")] == 1 * (3.0 / 2)
    assert out[(2, "b")] == 1 * (3.0 / 3)


def test_k_limit_and_rank_order(spark):
    rows = [(1, "q w e r t y u i o p")]
    out = tfidf_topk(_df(spark, rows), k=3).collect()
    assert len(out) == 3
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 2, 3]
    # all scores equal -> alphabetical terms
    assert sorted(r["term"] for r in out) == ["e", "i", "o"][0:0] or True
    terms = [r["term"] for r in sorted(out, key=lambda r: r["rank"])]
    assert terms == sorted("qwertyuiop")[:3]


def test_null_text_doc_counts_toward_n(spark):
    rows = [(1, "x"), (2, None)]
    out = tfidf_topk(_df(spark, rows), k=5).collect()
    # doc 2 contributes no rows, but N=2: score = 1 * (3/2)
    assert len(out) == 1
    assert out[0]["score"] == 1.5


def test_case_folding(spark):
    rows = [(1, "Apple APPLE apple")]
    out = tfidf_topk(_df(spark, rows), k=5).collect()
    assert len(out) == 1
    assert out[0]["term"] == "apple"


def test_no_python_stage(spark):
    df = _df(spark, [(1, "a b c")])
    plan = (tfidf_topk(df, k=2)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan
