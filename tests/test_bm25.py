"""bm25_topk + quality-keeper dedup: scoring math, determinism,
edge cases (empty/NULL text, absent terms), keeper tie-breaks."""
from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from document_extractor_spark.operators.bm25 import (
    bm25_topk, corpus_term_stats)
from document_extractor_spark.operators.components import (
    dedup_decision_keep_best)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _ref_bm25(docs: dict[int, str], terms: list[str]) -> dict[int, float]:
    """Independent rational-arithmetic reference (Fraction — exact),
    mirroring the documented formula, converted to float at the end
    term by term in the same order."""
    toks = {i: [t for t in txt.lower().split() if t]
            for i, txt in docs.items() if txt is not None}
    n = len(docs)
    t_total = sum(len(v) for v in toks.values())
    scores = {}
    for i in docs:
        ts = toks.get(i, [])
        dl = len(ts)
        s = 0.0
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            tf = sum(1 for x in ts if x == term)
            num = (2 * n - 2 * df + 1) * 22 * t_total * tf
            den = (2 * df + 1) * (10 * tf * t_total + 3 * t_total
                                  + 9 * dl * n)
            s = s + (num / den if den else 0.0)
        scores[i] = s
    return scores


def test_scores_match_reference(spark):
    docs = {
        1: "spark scan vector vector merge",
        2: "vector stream stream stream",
        3: "merge merge merge scan table",
        4: "table scan row column",
    }
    terms = ["vector", "stream"]
    rows = sorted(docs.items())
    out = bm25_topk(_df(spark, rows), terms, k=10).collect()
    ref = _ref_bm25(docs, terms)
    got = {r["doc_id"]: r["bm25"] for r in out}
    # doc 4 and doc 3 have no query terms -> excluded
    assert set(got) == {1, 2}
    for i, v in got.items():
        # raw double out; same int lattice + same IEEE fold order as
        # the Fraction-exact reference -> bit-identical
        assert v == ref[i]
    # ranking: doc 2 (3x stream + 1x vector) beats doc 1
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[2] == 1 and ranks[1] == 2


def test_monotone_tf_and_df(spark):
    # more occurrences of a rare term -> strictly higher score
    rows = [(1, "x y y"), (2, "x x y"), (3, "y y y")]
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(_df(spark, rows), ["x"], k=5).collect()}
    assert out[2] > out[1]
    assert 3 not in out


def test_null_and_empty_text(spark):
    rows = [(1, "vector win"), (2, None), (3, ""), (4, "   ")]
    out = bm25_topk(_df(spark, rows), ["vector"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]
    stats = corpus_term_stats(_df(spark, rows), ["vector"])
    assert stats["n"] == 4 and stats["t"] == 2
    assert stats["df"] == {"vector": 1}


def test_term_absent_everywhere(spark):
    rows = [(1, "a b"), (2, "c d")]
    out = bm25_topk(_df(spark, rows), ["zzz"], k=5).collect()
    assert out == []


def test_empty_corpus(spark):
    out = bm25_topk(_df(spark, []), ["x"], k=5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "rank", "bm25"]


def test_k_truncates_with_deterministic_ties(spark):
    # identical docs -> identical scores; tiebreak doc_id asc
    rows = [(i, "vector alpha") for i in range(10)]
    out = bm25_topk(_df(spark, rows), ["vector"], k=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_precomputed_stats_path(spark):
    rows = [(1, "vector"), (2, "scan")]
    df = _df(spark, rows)
    stats = corpus_term_stats(df, ["vector"])
    a = bm25_topk(df, ["vector"], k=5, stats=stats).collect()
    b = bm25_topk(df, ["vector"], k=5).collect()
    assert a == b


def test_int64_lattice_exactness(spark):
    """The num/den products must stay exact: compare against Fraction
    arithmetic (infinite precision) for a corpus with larger counts."""
    docs = {i: ("vector " * (i % 7 + 1) + "pad " * (i % 13))
            for i in range(50)}
    rows = sorted(docs.items())
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(_df(spark, rows), ["vector"], k=50)
           .collect()}
    toks = {i: txt.split() for i, txt in docs.items()}
    n, t_total = 50, sum(len(v) for v in toks.values())
    df = sum(1 for v in toks.values() if "vector" in v)
    for i, got in out.items():
        tf = toks[i].count("vector")
        dl = len(toks[i])
        exact = (Fraction((2 * n - 2 * df + 1) * 22 * t_total * tf,
                          (2 * df + 1) * (10 * tf * t_total
                                          + 3 * t_total + 9 * dl * n)))
        assert abs(got - float(exact)) < 5e-7


# --- quality-keeper dedup ------------------------------------------------


def _keeper(spark, docs_rows, pair_rows):
    d = spark.createDataFrame(docs_rows, "doc_id: long, q: double")
    p = spark.createDataFrame(pair_rows, "id_a: long, id_b: long")
    return {r["doc_id"]: r for r in
            dedup_decision_keep_best(d, p).collect()}


def test_keeper_is_best_quality(spark):
    out = _keeper(spark,
                  [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.7)],
                  [(1, 2), (2, 3)])
    assert out[2]["is_keeper"] and not out[1]["is_keeper"] \
        and not out[3]["is_keeper"]
    assert out[4]["is_keeper"]  # singleton keeps itself
    assert out[1]["component"] == out[2]["component"] \
        == out[3]["component"]


def test_keeper_tie_breaks_min_id(spark):
    out = _keeper(spark, [(5, 0.5), (6, 0.5), (7, 0.1)],
                  [(5, 6), (6, 7)])
    assert out[5]["is_keeper"]
    assert not out[6]["is_keeper"] and not out[7]["is_keeper"]


def test_keeper_transitive_closure(spark):
    # chain 1-2, 2-3, 3-4: one cluster, exactly one keeper
    out = _keeper(spark, [(i, float(i) / 10) for i in range(1, 5)],
                  [(1, 2), (2, 3), (3, 4)])
    keepers = [i for i, r in out.items() if r["is_keeper"]]
    assert keepers == [4]  # highest q
    assert len({r["component"] for r in out.values()}) == 1


def test_keeper_empty_pairs(spark):
    out = _keeper(spark, [(1, 0.3), (2, 0.4)], [])
    assert all(r["is_keeper"] for r in out.values())


def test_inverted_index_postings_and_cap(spark):
    from document_extractor_spark.operators.bm25 import inverted_index

    rows = [(1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple banana banana"),
            (4, None)]
    out = {r["term"]: (r["df"], r["postings"])
           for r in inverted_index(_df(spark, rows), max_df=2).collect()}
    # banana (df=3) exceeds the cap and is dropped entirely
    assert set(out) == {"apple", "cherry"}
    assert out["apple"] == (2, "1:2 3:1")
    assert out["cherry"] == (1, "2:1")


def test_inverted_index_edges(spark):
    import pytest as _pytest
    from document_extractor_spark.operators.bm25 import inverted_index

    assert inverted_index(_df(spark, []), max_df=5).collect() == []
    out = inverted_index(_df(spark, [(7, None), (8, "")]),
                         max_df=5).collect()
    assert out == []  # NULL/empty text contributes no terms
    with _pytest.raises(ValueError):
        inverted_index(_df(spark, [(1, "x")]), max_df=0)


def test_inverted_index_matches_python_reference(spark):
    """Seeded-random corpora (pinned whitespace class, odd separators
    \\x0B/\\f/\\r included) vs an independent driver-side reference."""
    import random
    import re

    ws = re.compile("[ \t\n\x0b\f\r]+")
    vocab = ["Alpha", "beta", "GAMMA", "délta", "x1", "--", "?"]
    seps = [" ", "\t", "\n", "\x0b", "\f", "\r", "  "]
    from document_extractor_spark.operators.bm25 import inverted_index

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        docs = {}
        for i in range(60):
            n = rng.randrange(0, 12)
            parts = []
            for _ in range(n):
                parts.append(rng.choice(vocab))
                parts.append(rng.choice(seps))
            docs[i] = "".join(parts)
        cap = rng.randrange(1, 50)
        # reference
        ref: dict[str, dict[int, int]] = {}
        for i, txt in docs.items():
            for tok in ws.split(txt.lower()):
                if tok:
                    ref.setdefault(tok, {}).setdefault(i, 0)
                    ref[tok][i] += 1
        want = {
            t: (len(p), " ".join(f"{d}:{c}"
                                 for d, c in sorted(p.items())))
            for t, p in ref.items() if len(p) <= cap}
        got = {r["term"]: (r["df"], r["postings"])
               for r in inverted_index(
                   _df(spark, sorted(docs.items())), max_df=cap)
               .collect()}
        assert got == want, (seed, cap)
