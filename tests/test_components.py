"""connected_components / dedup_decision: closure, determinism, plan."""
from __future__ import annotations

from pyspark.sql import functions as F

from document_extractor_spark.operators.components import (
    connected_components,
    dedup_decision,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a: long, b: long")


def test_chain_collapses_to_one_component(spark):
    # 0-1-2-3-4: transitive closure must label all with 0
    cc = connected_components(
        _edges(spark, [(i, i + 1) for i in range(4)]))
    got = {r["node"]: r["comp"] for r in cc.collect()}
    assert got == {i: 0 for i in range(5)}


def test_two_components_stay_apart(spark):
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["node"]: r["comp"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_bridge_edge_fuses_clusters(spark):
    # two chains fused by one long-range edge
    edges = [(1, 2), (2, 3), (20, 21), (21, 22), (3, 20)]
    cc = connected_components(_edges(spark, edges))
    comps = {r["comp"] for r in cc.collect()}
    assert comps == {1}


def test_deterministic_across_runs_and_partitioning(spark):
    edges = [(i, (i * 7) % 50) for i in range(0, 50, 3)]
    df1 = _edges(spark, edges)
    df2 = _edges(spark, edges).repartition(16)
    a = sorted(map(tuple, connected_components(df1).collect()))
    b = sorted(map(tuple, connected_components(df2).collect()))
    assert a == b


def test_dedup_decision_keeper_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)],
                                 "doc_id: long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)],
                                  "id_a: long, id_b: long")
    out = {r["doc_id"]: r for r in
           dedup_decision(docs, pairs).collect()}
    assert out[1]["component"] == 1 and out[1]["is_keeper"]
    assert out[3]["component"] == 1 and not out[3]["is_keeper"]
    assert out[5]["component"] == 1 and not out[5]["is_keeper"]
    for solo in (0, 2, 4):
        assert out[solo]["component"] == solo
        assert out[solo]["is_keeper"]


def test_no_nested_loops(spark):
    cc = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    plan = cc._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unconverged_cap_raises(spark):
    """Exhausting max_rounds must raise, not return split clusters."""
    import pytest as _pt
    edges = _edges(spark, [(i, i + 1) for i in range(6)])
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)


def test_corpus_build_reason_precedence(spark, tmp_path):
    """Composed decision: duplicate outranks quality, quality
    outranks sampling; keepers of a dup cluster fall through to the
    later gates."""
    import __spark_entry__ as em
    rows = []
    good = ("the quick brown fox jumps over a lazy dog and then keeps "
            "moving through very green fields forever onward ") * 3
    # 0 and 1: near-identical docs (one cluster); 0 keeps, 1 duplicate
    rows.append((0, good + "alpha", "en", "src0", len(good)))
    rows.append((1, good + "alpha", "en", "src0", len(good)))
    # 2: too short -> quality
    rows.append((2, "the tiny doc", "en", "src0", 12))
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string,"
              " n_chars: long")
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in
           em.q_training_corpus_build(spark, sf).collect()}
    assert out[1]["reason"] == "duplicate"
    assert out[2]["reason"] == "quality"
    # doc 0 survived dedup; src0 rate is 1.0 so never sampled_out
    assert out[0]["reason"] in (None, "repetition")


def test_cycle_graph_converges(spark):
    """Cycles must not prevent convergence detection."""
    cc = connected_components(
        _edges(spark, [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5)]))
    got = {r["node"]: r["comp"] for r in cc.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_adversarial_long_chain_converges_fast(spark):
    """The r4-verdict scenario: a deep duplicate chain (scraped
    pagination series). Min-label propagation needs one round per
    hop — 2000 hops would blow any sane cap; large-star/small-star
    must close a 2001-node path inside the default 50-round cap
    (expected ~log^2: under 20)."""
    n = 2000
    cc = connected_components(
        _edges(spark, [(i, i + 1) for i in range(n)]))
    agg = cc.agg(F.count("*").alias("n"),
                 F.sum(F.col("comp")).alias("s")).first()
    assert agg["n"] == n + 1 and agg["s"] == 0  # all labeled 0


def _unionfind(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per node
    return {x: find(x) for x in list(parent)}


def test_equals_union_find_on_random_graphs(spark):
    """Seeded random graphs (mixed chains, stars, cycles, isolated
    self-loops) vs an independent driver-side union-find."""
    import random
    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        nodes = list(range(120))
        pairs = [(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(90)]
        got = {r["node"]: r["comp"]
               for r in connected_components(_edges(spark, pairs))
               .collect()}
        want = _unionfind(pairs)
        assert got == want, seed


def test_keep_best_null_quality_loses(spark):
    """NULLS-LAST pin: a NULL-quality member must never beat a scored
    one (struct-min would otherwise sort NULL first), and an all-NULL
    cluster falls back to the min-id keeper."""
    from document_extractor_spark.operators.components import (
        dedup_decision_keep_best)

    docs = spark.createDataFrame(
        [(1, 0.2), (2, None), (3, 0.9),      # cluster 1-2-3
         (10, None), (11, None)],            # all-NULL cluster
        "doc_id: long, q: double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long")
    out = {r["doc_id"]: r["is_keeper"]
           for r in dedup_decision_keep_best(
               docs, pairs, quality_col="q").collect()}
    assert out == {1: False, 2: False, 3: True,   # 0.9 wins, not NULL
                   10: True, 11: False}           # all-NULL -> min id
