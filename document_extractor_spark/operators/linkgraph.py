"""Link-graph analysis over crawled HTML: outlink extraction, the
domain edge graph, degree stats, and PageRank.

Web-corpus quality work leans on the link structure the extractor
already holds in its hands: outlinks feed crawl frontiers, domain
in-degree feeds reputation priors (a RefinedWeb-style complement to
content scores), and PageRank-family centrality is the classic
web-scale signal. All of it derives from one cheap pass over the
`html` column — no second fetch.

Operators:

- :func:`extract_outlinks` — per-page `href` targets, a pure Column
  ``regexp_extract_all`` projection (zero shuffle). The pattern is
  in the Java∩RE2 common subset, the repo's rule for every regex
  that an oracle twin must evaluate identically.
- :func:`domain_edges` — (src_domain, dst_domain) edge counts; one
  groupBy shuffle. Relative hrefs resolve to the source's own
  domain (same-site edges), protocol-relative `//host/...` and
  absolute `scheme://host/...` take the target host.
- :func:`degree_stats` — in/out-degree per domain from the edge
  table (dim-sized input: two small groupBys + one outer join).
- :func:`pagerank` — power iteration on the domain graph with the
  standard damping/dangling treatment. Each iteration is one join +
  one groupBy on the edge table, lineage cut via localCheckpoint
  every few rounds (components.py precedent). Ranks are floats; the
  driver oracle mirrors the unrolled iterations expression-for-
  expression and compares at 6 dp.

Scale: the edge EXTRACTION is embarrassingly parallel; the domain
graph is dim-sized relative to the corpus (≤ #domains² observed
pairs), so everything after the first groupBy runs on a table many
orders smaller than the input.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# href="..." — straight double-quoted form only: identical semantics
# in Java regex and RE2 (DuckDB), no backrefs, no lookaround
HREF_PATTERN = r'href="([^"]*)"'


def extract_outlinks(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html_text") -> DataFrame:
    """`(url, href)` — one row per href occurrence in the decoded
    HTML string column. Duplicate hrefs on a page are kept (edge
    weights count occurrences); pages with no links emit no rows.
    Pure Column work, zero shuffle."""
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(
                F.expr(f"regexp_extract_all({html_col}, "
                       f"'{HREF_PATTERN}', 1)")).alias("href"))
    )


# the ONE shared host parser (functions/urlnorm.py) — do not fork it
from ..functions.urlnorm import has_opaque_scheme, host_of as _host_of


def _fetchable_links(df: DataFrame, url_col: str,
                     href_col: str) -> DataFrame:
    """Rows whose href is a FETCHABLE link target, with the resolved
    destination domain attached as `_dst`: fragment-only/empty hrefs
    and scheme-without-authority links (mailto:/javascript:/tel:) are
    dropped; relative hrefs resolve to the source's own domain.  ONE
    shared implementation — domain_edges and anchor_text_index both
    build on it, so link-target semantics can never drift between the
    edge graph and the anchor index."""
    src = _host_of(F.col(url_col))
    dst = F.coalesce(_host_of(F.col(href_col)), src)
    return (
        df.filter((F.col(href_col) != "")
                  & ~F.col(href_col).startswith("#")
                  & ~has_opaque_scheme(F.col(href_col)))
        .withColumn("_src", src).withColumn("_dst", dst)
    )


def domain_edges(outlinks: DataFrame, url_col: str = "url",
                 href_col: str = "href") -> DataFrame:
    """`(src_domain, dst_domain, n_links)` — the domain-level edge
    list. Relative hrefs (no scheme) stay on the source domain;
    fragment-only/empty hrefs AND scheme-without-authority links
    (`mailto:` / `javascript:` / `tel:`) are dropped — coalescing
    those to the source would fabricate self-edges. One shuffle."""
    return (
        _fetchable_links(outlinks, url_col, href_col)
        .select(F.col("_src").alias("src_domain"),
                F.col("_dst").alias("dst_domain"))
        .filter(F.col("src_domain").isNotNull())
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """`(domain, out_degree, in_degree, out_links, in_links)` —
    distinct-neighbor degrees plus link-weighted totals, per domain.
    The edge table is dim-sized: two small groupBys + one outer
    join."""
    out_d = edges.groupBy(F.col("src_domain").alias("domain")).agg(
        F.count("*").alias("out_degree"),
        F.sum("n_links").alias("out_links"))
    in_d = edges.groupBy(F.col("dst_domain").alias("domain")).agg(
        F.count("*").alias("in_degree"),
        F.sum("n_links").alias("in_links"))
    return (
        out_d.join(in_d, "domain", "full_outer")
        .select(
            "domain",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"))
    )


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85,
             checkpoint_every: int = 4) -> DataFrame:
    """`(domain, rank)` after `iterations` of standard power
    iteration with uniform damping over the node set N:

        r'(d) = (1-a)/N + a * (sum_{s->d} r(s)*w(s,d)/W(s)
                                + dangling_mass/N)

    where W(s) is s's total out-link weight and dangling_mass is the
    rank held by nodes with no out-edges. Each iteration: one join
    edge⋈rank (broadcast rank when dim-sized) + one groupBy; lineage
    is cut with localCheckpoint every `checkpoint_every` iterations
    so deep plans don't accrete (components.py precedent).
    """
    # edges / nodes / out-weights are consumed once per iteration:
    # persist them (dim-sized) so the corpus-side extraction behind
    # `edges` runs once, and cut the FINAL plan with an eager
    # checkpoint so none of the per-iteration lineage survives into
    # the caller's plan. Only caches WE created are released — a
    # caller-persisted `edges` must come back still cached
    # (unpersist is not a no-op the way re-persist is).
    from pyspark import StorageLevel

    own_edges = edges.storageLevel == StorageLevel.NONE
    if own_edges:
        edges = edges.persist()
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
        .persist()
    )
    try:
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0))
        out_w = edges.groupBy("src_domain").agg(
            F.sum("n_links").alias("w_total")).persist()
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for i in range(iterations):
            contrib = (
                edges.join(ranks, edges.src_domain == ranks.domain)
                .join(out_w, "src_domain")
                .select(
                    F.col("dst_domain").alias("domain"),
                    (F.col("rank") * F.col("n_links")
                     / F.col("w_total")).alias("c"))
                .groupBy("domain").agg(F.sum("c").alias("c"))
            )
            dangling = (
                ranks.join(out_w, ranks.domain == out_w.src_domain,
                           "left_anti")
                .agg(F.sum("rank")).collect()[0][0] or 0.0)
            base = (1.0 - damping) / n + damping * dangling / n
            ranks = (
                nodes.join(contrib, "domain", "left")
                .select(
                    "domain",
                    (F.lit(base)
                     + F.lit(damping)
                     * F.coalesce(F.col("c"), F.lit(0.0)))
                    .alias("rank"))
            )
            if (i + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
        return ranks.localCheckpoint(eager=True)
    finally:
        if own_edges:
            edges.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        try:
            out_w.unpersist(blocking=False)
        except NameError:
            pass


ANCHOR_PATTERN = r'href="([^"]*)"[^>]*>([^<]*)<'


def extract_anchors(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html_text") -> DataFrame:
    """`(url, href, anchor)` — href plus its anchor text, per `<a>`
    occurrence. Anchor text is the label the linking page assigns
    the target — a classic weak-supervision signal for training
    data (title/summary pairs) and for target-domain reputation.

    Pure Column: `regexp_extract_all` is evaluated once per capture
    group over the SAME pattern, and the two aligned match lists are
    zipped — Spark's extract_all returns one group at a time, but
    both calls see identical match boundaries, so pairing by
    position is exact (the DuckDB twin does the same). Zero shuffle.
    """
    pairs = F.arrays_zip(
        F.expr(f"regexp_extract_all({html_col}, "
               f"'{ANCHOR_PATTERN}', 1)").alias("href"),
        F.expr(f"regexp_extract_all({html_col}, "
               f"'{ANCHOR_PATTERN}', 2)").alias("anchor"))
    return (
        pages.select(F.col(url_col).alias("url"),
                     F.explode(pairs).alias("p"))
        .select("url", F.col("p.href").alias("href"),
                F.col("p.anchor").alias("anchor"))
    )


def anchor_text_index(anchors: DataFrame) -> DataFrame:
    """`(dst_domain, n_anchors, n_distinct_anchors, top_anchor)` —
    the anchor-text profile per target domain. `top_anchor` is the
    lexicographic min (a deterministic representative, engine-
    portable; a frequency argmax would need a second shuffle).
    Relative hrefs resolve to the source's own domain; fragment-only
    and scheme-without-authority (`mailto:` etc.) links are dropped.
    One shuffle over the anchor rows; output is domain-bounded."""
    return (
        _fetchable_links(anchors, "url", "href")
        .select(F.col("_dst").alias("dst_domain"), "anchor")
        .filter(F.col("dst_domain").isNotNull())
        .groupBy("dst_domain")
        .agg(F.count("*").alias("n_anchors"),
             F.countDistinct("anchor").alias("n_distinct_anchors"),
             F.min("anchor").alias("top_anchor"))
    )
