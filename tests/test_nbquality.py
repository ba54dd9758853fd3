"""NB-style quality classifier: weight direction, exact integer
scores, unseen-token neutrality, degenerate inputs."""
from __future__ import annotations

import pyspark.sql.functions as F

from document_extractor_spark.functions.nbquality import (
    SCALE,
    nb_score,
    seed_labels,
    train_nb_weights,
)


def _labeled(spark):
    hi = "excellent thorough analysis report excellent analysis"
    lo = "zzz spam spam zzz click click"
    rows = ([(i, hi, True) for i in range(10)]
            + [(100 + i, lo, False) for i in range(10)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, hiq boolean")


def test_weight_direction(spark):
    w = {r.token: r.w
         for r in train_nb_weights(_labeled(spark)).collect()}
    # tokens exclusive to hi docs weigh above the neutral lattice,
    # tokens exclusive to lo docs below it
    assert w["excellent"] > SCALE > w["spam"]
    assert w["analysis"] > SCALE > w["zzz"]


def test_score_separates_and_is_exact(spark):
    d = _labeled(spark)
    weights = train_nb_weights(d)
    out = {r.doc_id: r for r in nb_score(d, weights).collect()}
    assert out[0].pred_hi is True
    assert out[100].pred_hi is False
    # integer score = sum of per-token weights, recomputed exactly
    w = {r.token: r.w for r in weights.collect()}
    toks = "excellent thorough analysis report excellent analysis".split()
    assert out[0].nb_score == sum(w[t] for t in toks)
    assert out[0].n_tokens == len(toks)


def test_unseen_token_neutral_and_empty_doc(spark):
    d = _labeled(spark)
    weights = train_nb_weights(d)
    probe = spark.createDataFrame(
        [(1, "unseen wording entirely"), (2, None), (3, "   ")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in nb_score(probe, weights).collect()}
    assert out[1].nb_score == 3 * SCALE  # neutral ratio each
    assert out[1].pred_hi is True  # >= is inclusive at neutrality
    for k in (2, 3):
        assert out[k].n_tokens == 0
        assert out[k].nb_score == 0
        assert out[k].pred_hi is None


def test_seed_labels_threshold(spark):
    docs = spark.createDataFrame(
        [(0, "word " * 300), (1, "@@@@ ####")],
        "doc_id long, text string")
    out = {r.doc_id: r.hiq for r in seed_labels(docs).collect()}
    assert out[0] is True and out[1] is False


def test_no_python_stage(spark):
    d = _labeled(spark)
    plan = nb_score(d, train_nb_weights(d))._jdf.queryExecution() \
        .executedPlan().toString()
    for m in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert m not in plan
