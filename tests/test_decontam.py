"""Unit tests for span-level substring dedup (dup_window_spans) and
benchmark decontamination (operators/decontam.py) on hand-built docs
where the expected spans/flags are enumerable by eye."""
from pyspark.sql import functions as F

from document_extractor_spark.operators import decontam as DC
from document_extractor_spark.operators import dedup as DD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


# --------------------------------------------------------------- spans ----
def test_dup_window_spans_merges_overlapping_windows(spark):
    # d1/d2 share the 4-token run "a b c d" -> two k=3 windows each,
    # overlapping, so each doc gets ONE merged span covering the run
    d = _docs(spark, [
        (1, "a b c d e f"),
        (2, "x x a b c d y"),
        (3, "totally unrelated text here"),
    ])
    rows = {r["doc_id"]: r for r in
            DD.dup_window_spans(d, k=3).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1]["span_start"], rows[1]["span_end"],
            rows[1]["n_windows"]) == (0, 4, 2)
    assert (rows[2]["span_start"], rows[2]["span_end"],
            rows[2]["n_windows"]) == (2, 6, 2)


def test_dup_window_spans_distinct_docs_required(spark):
    # a phrase repeated WITHIN one doc only is not cross-doc
    # duplication (countDistinct >= 2), and sub-k docs have no windows
    d = _docs(spark, [
        (1, "p q r s p q r s"),
        (2, "a b"),
        (3, "c d e f g"),
    ])
    assert DD.dup_window_spans(d, k=3).count() == 0


def test_dup_window_spans_separate_islands(spark):
    # two shared runs separated by unique middles -> two span rows
    d = _docs(spark, [
        (1, "a b c m1 m2 m3 m4 x y z"),
        (2, "a b c n1 n2 n3 n4 x y z"),
    ])
    out = DD.dup_window_spans(d, k=3).collect()
    spans = sorted((r["doc_id"], r["span_start"], r["span_end"])
                   for r in out)
    assert spans == [(1, 0, 3), (1, 7, 10), (2, 0, 3), (2, 7, 10)]


def test_dup_window_spans_case_insensitive_tokens(spark):
    # tokens_col lowers, so case variants are the same window
    d = _docs(spark, [(1, "Foo Bar Baz tail1"), (2, "foo bar baz tail2")])
    out = DD.dup_window_spans(d, k=3).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} \
        == {(1, 0, 3), (2, 0, 3)}


# ----------------------------------------------------------- decontam ----
def test_decontaminate_flags_overlapping_docs(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text: string")
    d = _docs(spark, [
        (1, "intro words the quick brown fox jumps outro"),
        (2, "no overlap with anything at all"),
        (3, "too short"),
        (4, None),
    ])
    bg = DC.benchmark_ngram_set(bench, n=3)
    rows = {r["doc_id"]: r for r in
            DC.decontaminate_marks(d, bg, n=3).collect()}
    assert set(rows) == {1, 2, 3, 4}  # every doc present
    # bench has 3 trigrams; doc 1 contains all of them
    assert rows[1]["n_hits"] == 3 and rows[1]["contaminated"]
    for i in (2, 3, 4):
        assert rows[i]["n_hits"] == 0 and not rows[i]["contaminated"]


def test_decontaminate_hits_are_distinct_grams(spark):
    # a doc repeating one leaked gram 3x scores 1, not 3
    bench = spark.createDataFrame([("u v w",)], "text: string")
    d = _docs(spark, [(1, "u v w pad u v w pad u v w")])
    row = DC.decontaminate_marks(
        d, DC.benchmark_ngram_set(bench, n=3), n=3).collect()[0]
    assert row["n_hits"] == 1 and row["contaminated"]


def test_decontaminate_broadcast_no_corpus_side_blowup(spark):
    # the bench-gram probe must be a broadcast hash join
    bench = spark.createDataFrame([("a b c",)], "text: string")
    d = _docs(spark, [(1, "a b c d")])
    plan = DC.decontaminate_marks(
        d, DC.benchmark_ngram_set(bench, n=3), n=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_strip_dup_spans_rewrites_and_counts(spark):
    d = _docs(spark, [
        (1, "a b c d e f"),
        (2, "x x a b c d y"),
        (3, "short one"),
        (4, None),
    ])
    rows = {r["doc_id"]: r for r in
            DD.strip_dup_spans(d, k=3).collect()}
    assert set(rows) == {1, 2, 3}  # NULL text absent by contract
    assert tuple(rows[1])[1:] == ("e f", 2, 4)
    assert tuple(rows[2])[1:] == ("x x y", 3, 4)
    assert tuple(rows[3])[1:] == ("short one", 2, 0)


def test_strip_dup_spans_fully_duplicated_doc_present(spark):
    d = _docs(spark, [(1, "a b c"), (2, "a b c")])
    rows = {r["doc_id"]: tuple(r)[1:] for r in
            DD.strip_dup_spans(d, k=3).collect()}
    assert rows == {1: ("", 0, 3), 2: ("", 0, 3)}


def test_fuzz_cross_engine_parity_seeded(spark):
    """Seeded random corpora (tiny vocab -> dense window collisions)
    through BOTH engines for dup_window_spans / strip_dup_spans /
    token_budget_sample: the driver checks one fixed corpus; this
    sweeps 4 adversarial ones (repeats, near-misses, short docs,
    NULLs) against the exact oracle SQL the driver runs."""
    import random

    import duckdb
    import pandas as pd

    import __spark_entry__ as em

    oracles = em.oracle_sql()
    qfns = em.queries()
    vocab = ["alpha", "beta", "gamma", "delta", "x", "y9", "Z", "tok"]
    for seed in (1, 7, 42, 20260817):
        rng = random.Random(seed)
        rows = []
        for i in range(40):
            if i % 13 == 12:
                text = None
            else:
                n = rng.randrange(0, 40)
                text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append((i, text, f"s{i % 3}", "en", len(text or "")))
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "source", "lang", "n_chars"])
        sdir = f"/tmp/des_fuzz_{seed}"
        sdf = spark.createDataFrame(
            pdf, "doc_id: long, text: string, source: string, "
                 "lang: string, n_chars: long")
        sdf.write.mode("overwrite").parquet(f"{sdir}/documents.parquet")
        con = duckdb.connect()
        con.register("documents", pdf)
        for q in ("dup_window_spans", "strip_dup_spans",
                  "token_budget_sample"):
            got = sorted(tuple(r) for r in qfns[q](spark, sdir).collect())
            want = sorted(tuple(r) for r in
                          con.sql(oracles[q]).fetchall())
            assert got == want, (q, seed)
        con.close()
