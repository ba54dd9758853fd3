"""Link-graph operators: href extraction, domain resolution, degree
stats, and PageRank against closed-form expectations."""
from __future__ import annotations

import pytest

from document_extractor_spark.operators.linkgraph import (
    degree_stats,
    domain_edges,
    extract_outlinks,
    pagerank,
)


def _pages(spark):
    rows = [
        ("http://a.example.com/p1",
         '<a href="http://b.example.com/x">1</a>'
         '<a href="//c.example.com/y">2</a>'
         '<a href="/local">3</a>'
         '<a href="#frag">4</a>'
         '<a href="">5</a>'
         '<a href="http://b.example.com/z">6</a>'),
        ("https://B.example.com/p2",
         '<a href="http://a.example.com/">back</a>'),
        ("http://d.example.com/p3", "no links here"),
    ]
    return spark.createDataFrame(rows, "url string, html_text string")


def test_extract_outlinks_counts_occurrences(spark):
    links = extract_outlinks(_pages(spark)).collect()
    by_url = {}
    for r in links:
        by_url.setdefault(r.url, []).append(r.href)
    assert len(by_url["http://a.example.com/p1"]) == 6  # dups + empty kept
    assert "http://d.example.com/p3" not in by_url  # no rows, not null


def test_domain_edges_resolution(spark):
    edges = {(r.src_domain, r.dst_domain): r.n_links
             for r in domain_edges(extract_outlinks(_pages(spark)))
             .collect()}
    # two absolute links to b (occurrence-weighted), one
    # protocol-relative to c, one relative -> self; fragment and
    # empty hrefs dropped; host casing folded
    assert edges[("a.example.com", "b.example.com")] == 2
    assert edges[("a.example.com", "c.example.com")] == 1
    assert edges[("a.example.com", "a.example.com")] == 1
    assert edges[("b.example.com", "a.example.com")] == 1
    assert len(edges) == 4


def test_degree_stats(spark):
    stats = {r.domain: r for r in degree_stats(
        domain_edges(extract_outlinks(_pages(spark)))).collect()}
    a = stats["a.example.com"]
    assert (a.out_degree, a.in_degree) == (3, 2)  # self-edge on both
    assert a.out_links == 4
    c = stats["c.example.com"]
    assert (c.out_degree, c.in_degree) == (0, 1)  # sink domain


def test_pagerank_star_graph_closed_form(spark):
    # hub -> {s1, s2, s3}; spokes are dangling. With damping a and
    # N=4, one iteration from uniform: spokes get
    # (1-a)/N + a*(hub_rank/3 + dangling/N); verify 2 iterations
    # against a tiny python reference implementation.
    edges = spark.createDataFrame(
        [("hub", f"s{i}", 1) for i in range(3)],
        "src_domain string, dst_domain string, n_links long")
    got = {r.domain: r.rank
           for r in pagerank(edges, iterations=2).collect()}

    a, n = 0.85, 4
    ranks = {d: 1.0 / n for d in ("hub", "s0", "s1", "s2")}
    for _ in range(2):
        dangling = sum(ranks[s] for s in ("s0", "s1", "s2"))
        base = (1.0 - a) / n + a * dangling / n
        new = {d: base for d in ranks}
        for s in ("s0", "s1", "s2"):
            new[s] += a * (ranks["hub"] * 1 / 3)
        ranks = new
    for d in ranks:
        assert got[d] == pytest.approx(ranks[d], abs=1e-12)
    assert got["s0"] == got["s1"] == got["s2"]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame(
        [], "src_domain string, dst_domain string, n_links long")
    assert pagerank(edges, iterations=1).count() == 0


def test_extract_anchors_positional_pairing(spark):
    from document_extractor_spark.operators.linkgraph import (
        anchor_text_index, extract_anchors)

    pages = spark.createDataFrame(
        [("http://a.example.com/p",
          '<a href="http://b.example.com/1">first</a>'
          '<a class="x" href="http://b.example.com/2">second</a>'
          '<a href="/rel">third</a>')],
        "url string, html_text string")
    got = {(r.href, r.anchor) for r in extract_anchors(pages).collect()}
    assert got == {("http://b.example.com/1", "first"),
                   ("http://b.example.com/2", "second"),
                   ("/rel", "third")}
    idx = {r.dst_domain: r for r in
           anchor_text_index(extract_anchors(pages)).collect()}
    assert idx["b.example.com"].n_anchors == 2
    assert idx["b.example.com"].n_distinct_anchors == 2
    assert idx["b.example.com"].top_anchor == "first"
    assert idx["a.example.com"].top_anchor == "third"  # rel -> self


def test_opaque_scheme_links_do_not_become_self_edges(spark):
    from document_extractor_spark.operators.linkgraph import (
        anchor_text_index, domain_edges, extract_outlinks)

    pages = spark.createDataFrame(
        [("http://a.example.com/p",
          '<a href="mailto:x@y.com">contact</a>'
          '<a href="javascript:void(0)">js</a>'
          '<a href="tel:+15551234">call</a>'
          '<a href="/real">real</a>')],
        "url string, html_text string")
    links = extract_outlinks(pages)
    edges = {(r.src_domain, r.dst_domain): r.n_links
             for r in domain_edges(links).collect()}
    # only the genuine relative link survives
    assert edges == {("a.example.com", "a.example.com"): 1}
    idx = {r.dst_domain: r.n_anchors
           for r in anchor_text_index(
               __import__("document_extractor_spark.operators.linkgraph",
                          fromlist=["extract_anchors"])
               .extract_anchors(pages)).collect()}
    assert idx == {"a.example.com": 1}


def test_pagerank_preserves_caller_persisted_edges(spark):
    from pyspark import StorageLevel

    from document_extractor_spark.operators.linkgraph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1)], "src_domain string, dst_domain string, "
                         "n_links long").persist()
    try:
        edges.count()
        pagerank(edges, iterations=1)
        assert edges.storageLevel != StorageLevel.NONE  # still cached
    finally:
        edges.unpersist()
