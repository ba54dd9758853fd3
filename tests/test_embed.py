"""Feature-hashing embeddings: exactness, normalization, ANN
compatibility, degenerate inputs."""
from __future__ import annotations

import hashlib
import math

from document_extractor_spark.functions.embed import hashed_embeddings


def _ref_vector(text: str, dim: int) -> list[int]:
    """Independent pure-Python twin."""
    import re
    v = [0] * dim
    for tok in [t for t in re.split("[ \t\n\x0b\f\r]+", text.lower())
                if t]:
        h = hashlib.md5(tok.encode()).hexdigest()
        for d in range(dim):
            bit = (int(h[d // 4], 16) >> (d % 4)) & 1
            v[d] += 2 * bit - 1
    return v


def test_matches_pure_python_reference(spark):
    texts = {0: "alpha beta alpha GAMMA", 1: "the the the", 2: None,
             3: "", 4: "solo"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    out = {r.doc_id: list(r.embedding)
           for r in hashed_embeddings(docs, dim=32).collect()}
    for k, t in texts.items():
        assert out[k] == _ref_vector(t or "", 32), k
    assert out[2] == [0] * 32 and out[3] == [0] * 32


def test_token_limit_boundary_fast_vs_legacy_fold(spark):
    """The nibble-packed fold is guarded to < 32768 tokens; docs at
    and past the boundary take the legacy per-dim fold. Both must
    match the pure-Python reference exactly."""
    vocab = [f"w{i}" for i in range(37)]
    long_doc = " ".join(vocab[i % 37] for i in range(32768))
    just_under = " ".join(vocab[i % 31] for i in range(32767))
    docs = spark.createDataFrame(
        [(0, long_doc), (1, just_under), (2, "tiny doc")],
        "doc_id long, text string")
    out = {r.doc_id: list(r.embedding)
           for r in hashed_embeddings(docs, dim=16).collect()}
    assert out[0] == _ref_vector(long_doc, 16)
    assert out[1] == _ref_vector(just_under, 16)
    assert out[2] == _ref_vector("tiny doc", 16)


def test_normalized_unit_vectors_feed_ann(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
         (2, "totally different words here"), (3, None)],
        "doc_id long, text string")
    out = {r.doc_id: list(r.embedding)
           for r in hashed_embeddings(
               docs, dim=32, normalized=True).collect()}
    for k in (0, 1, 2):
        assert math.isclose(sum(x * x for x in out[k]), 1.0,
                            rel_tol=1e-9)
    assert out[3] == [0.0] * 32  # all-zero stays all-zero
    # identical docs -> identical vectors; cosine(0,2) < 1
    assert out[0] == out[1]
    cos = sum(a * b for a, b in zip(out[0], out[2]))
    assert cos < 0.9


def test_dim_bounds(spark):
    import pytest
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_embeddings(docs, dim=65)
    with pytest.raises(ValueError):
        hashed_embeddings(docs, dim=0)


def test_normalized_norm_evaluated_once_per_row(spark):
    """The unit-normalize epilogue must keep the O(dim) norm in its
    own projection: a lambda-captured norm gets re-inlined by Catalyst
    once PER ELEMENT (O(dim^2) expression evals per row). Pin exactly
    one `aggregate(`/`SQRT` in the optimized plan."""
    docs = spark.createDataFrame([(0, "x y z")],
                                 "doc_id long, text string")
    plan = hashed_embeddings(docs, dim=64, normalized=True) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 1, plan
    assert plan.upper().count("SQRT") == 1, plan


def test_no_python_stage(spark):
    docs = spark.createDataFrame([(0, "x y z")],
                                 "doc_id long, text string")
    plan = hashed_embeddings(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    for m in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert m not in plan
