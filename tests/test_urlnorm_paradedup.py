"""URL canonicalization + paragraph-level dedup tests."""
import pandas as pd
import pytest

from pyspark.sql import functions as F

from document_extractor_spark.functions.urlnorm import (
    canonical_url,
    canonical_url_py,
)

CASES = [
    ("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&q=1#frag",
     "https://example.com/Path?q=1"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/a/", "http://example.com:8080/a"),
    ("https://example.com/a?utm_campaign=spring", "https://example.com/a"),
    ("https://example.com/a?b=2&fbclid=xyz", "https://example.com/a?b=2"),
    ("https://example.com/a?gclid=1&b=2", "https://example.com/a?b=2"),
    ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),
    ("not a url", "not a url"),
    ("https://example.com", "https://example.com"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_py_cases(raw, want):
    assert canonical_url_py(raw) == want


def test_canonical_url_column_matches_python(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id long, url string")
    got = (df.select("id", canonical_url(F.col("url")).alias("c"))
           .toPandas().set_index("id").c)
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want == canonical_url_py(raw), raw


def test_paragraph_dedup_marks(spark):
    from document_extractor_spark.operators.dedup import (
        paragraph_dedup_marks,
    )

    rows = [
        ("a", 0, "alpha one\nshared para\nalpha three"),
        ("b", 0, "shared para\nbeta two"),
        ("b", 1, "beta page2\nshared para\n\n  \nbeta tail"),
        ("c", 0, "unique only"),
    ]
    df = spark.createDataFrame(rows, "url string, pg long, text string")
    got = paragraph_dedup_marks(df, order_cols=["url", "pg"]).toPandas()
    # blanks dropped
    assert len(got) == 9
    shared = got[got.para_hash == got[
        (got.url == "a") & (got.para_idx == 1)].para_hash.iloc[0]]
    assert len(shared) == 3
    # only the corpus-first occurrence (a, pg 0, idx 1) is kept
    firsts = shared[shared.is_first]
    assert len(firsts) == 1
    assert (firsts.iloc[0].url, firsts.iloc[0].pg) == ("a", 0)
    # every non-shared paragraph is first
    others = got[~got.para_hash.isin(shared.para_hash)]
    assert others.is_first.all()


def test_tracking_params_anchored_to_boundary():
    """A param merely CONTAINING a tracker name must survive —
    un-anchored stripping would merge distinct urls (review finding)."""
    keep = [
        ("https://h/p?afbclid=1", "https://h/p?afbclid=1"),
        ("https://h/p?x_gclid=2", "https://h/p?x_gclid=2"),
        ("https://h/p?q=utm_source%3Dx", "https://h/p?q=utm_source%3Dx"),
    ]
    strip = [
        ("https://h/p?fbclid=1", "https://h/p"),
        ("https://h/p?a=1&fbclid=2&b=3", "https://h/p?a=1&b=3"),
        ("https://h/p?utm_a=1&utm_b=2", "https://h/p"),
    ]
    for raw, want in keep + strip:
        assert canonical_url_py(raw) == want, raw


def test_tracking_anchor_column_parity(spark):
    cases = ["https://h/p?afbclid=1", "https://h/p?fbclid=1",
             "https://h/p?a=1&fbclid=2&b=3", "https://h/p?utm_a=1&utm_b=2"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(cases)],
                               "id long, url string")
    got = (df.select("id", canonical_url(F.col("url")).alias("c"))
           .toPandas().set_index("id").c)
    for i, u in enumerate(cases):
        assert got[i] == canonical_url_py(u), u
