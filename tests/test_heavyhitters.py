"""Space-Saving heavy hitters: exact regime, bounds in the lossy
regime, guaranteed capture above N/k, merge correctness."""
from __future__ import annotations

import collections
import random

from document_extractor_spark.operators.heavyhitters import (
    heavy_hitters,
    space_saving,
)


def _zipf_docs(spark, n_docs=60, seed=5):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(50)]
    docs, truth = [], collections.Counter()
    for i in range(n_docs):
        toks = [vocab[min(int(rng.paretovariate(1.2)) - 1, 49)]
                for _ in range(40)]
        truth.update(toks)
        docs.append((i, " ".join(toks)))
    return spark.createDataFrame(docs, "doc_id long, text string"), truth


def test_exact_regime_equals_true_counts(spark):
    d, truth = _zipf_docs(spark)
    out = heavy_hitters(d, capacity=4096, k=10).collect()
    expected = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.token, r.upper) for r in
           sorted(out, key=lambda r: (-r.upper, r.token))]
    assert got == expected
    assert all(r.upper == r.lower for r in out)  # no evictions


def test_lossy_regime_bounds_and_capture(spark):
    d, truth = _zipf_docs(spark, n_docs=80)
    n_total = sum(truth.values())
    cap = 25  # < 50 distinct: forces evictions
    out = {r.token: r for r in
           heavy_hitters(d.repartition(4), capacity=cap, k=50).collect()}
    for tok, r in out.items():
        assert r.lower <= truth[tok] <= r.upper, tok
    # every token with true count > N/cap must be present
    for tok, n in truth.items():
        if n > n_total / cap:
            assert tok in out, (tok, n)


def test_partitioning_changes_bounds_not_exact_results(spark):
    d, truth = _zipf_docs(spark)
    a = {(r.token, r.upper) for r in
         heavy_hitters(d.repartition(1), capacity=4096, k=10).collect()}
    b = {(r.token, r.upper) for r in
         heavy_hitters(d.repartition(13), capacity=4096, k=10).collect()}
    assert a == b  # exact regime is partitioning-independent


def test_space_saving_unit_eviction():
    counts = {}
    update, evicted = space_saving(counts, capacity=2)
    for t in ["a", "a", "b"]:
        update(t)
    assert not evicted()  # full but never evicted
    update("c")
    assert evicted()
    # c evicted b (min counter 1) and inherited its mass as error
    assert counts["a"] == (2, 0)
    assert counts["c"] == (2, 1)
    assert "b" not in counts


def test_null_and_empty_docs(spark):
    d = spark.createDataFrame(
        [(0, None), (1, ""), (2, "x x y")], "doc_id long, text string")
    out = {r.token: (r.upper, r.lower)
           for r in heavy_hitters(d, capacity=64, k=5).collect()}
    assert out == {"x": (2, 2), "y": (1, 1)}
