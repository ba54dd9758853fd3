"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship: the full HTML main-content
extraction pipeline (document_extractor_spark.pipeline) over pages
synthesized JVM-side from the sf0.001 `documents` table — every text
is wrapped in boilerplate-laden HTML, pushed through sniff -> cascade
-> score -> gate, and must come back byte-identical.

`queries()` / `oracle_sql()` cover every SQL-expressible operator from
SURVEY.md §2 plus the training-data operators (dedup / similarity /
text analysis). Keys map to SURVEY.md operator ids in each docstring.
Non-SQL-expressible ops (simhash blocking, LSH ANN, winnowing, the
binary-payload pipeline) have no oracle entry -> rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from document_extractor_spark.functions import textstats as TS
from document_extractor_spark.operators import dedup as DD
from document_extractor_spark.operators import similarity as SIM

_CUTOFF = 0.8  # ascii-density gate used by several SQL-twin queries


def _pin_utc(spark: SparkSession) -> None:
    """Assert the engine-wide UTC timestamp convention on a session the
    engine did not build (the driver gate constructs its own).  Every
    timestamp-sensitive query calls this with the SAME value, and
    build_session pins it at construction — so there is no divergent
    session-global state for later queries to inherit (ADVICE r3)."""
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the sf documents table is ONE parquet row group = ONE
    # scan split, so without this every query's first stage (usually
    # the expensive tokenize/score pass) runs on a single core no
    # matter how many the session has (guide §2.6/§6). At real scale
    # the scan has plenty of splits and the round-robin is a no-op
    # (widen_narrow_input only fires when splits < parallelism).
    return DD.widen_narrow_input(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _docs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UN-widened scan for cheap plan-building references (counts,
    # id-only edge projections): those pay the widen exchange without
    # any parallel-compute payoff (measured +3.4s on
    # quality_keeper_dedup from three such references)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _pin_utc(spark)
    return DD.widen_narrow_input(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.widen_narrow_input(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _ratio():
    return TS.ascii_alnum_ratio(F.col("text"))


# ===========================================================================
# flagship: HTML wrap -> full extraction pipeline -> byte-identical text
# ===========================================================================
def _boilerplate_html(text_col) -> F.Column:
    """Boilerplate-laden HTML around `text_col`, JVM-side."""
    return F.concat(
        F.lit(
            "<!DOCTYPE html>\n<html><head><title>Doc | Site</title></head>\n"
            "<body>\n<nav><ul><li><a href=\"/\">Home</a></li>"
            "<li><a href=\"/about\">About us page</a></li></ul></nav>\n"
            "<main><article>\n<p>"),
        text_col,
        F.lit(
            "</p>\n</article></main>\n<footer><p>Copyright 2026 Example "
            "Corp. All rights reserved.</p></footer>\n</body></html>"),
    )


def _wrap_documents_as_pages(docs: DataFrame) -> DataFrame:
    """Render each document into boilerplate-laden HTML, JVM-side."""
    html = _boilerplate_html(F.col("text"))
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def q_extract_html_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (north_star): boilerplate strip must return each
    document's text byte-identically (ws-normalized identity oracle)."""
    from document_extractor_spark.config import PipelineConfig
    from document_extractor_spark.pipeline import run_extraction

    pages = _wrap_documents_as_pages(_docs(spark, sf_dir))
    res = run_extraction(spark, pages, PipelineConfig())
    # no status filter: the oracle pins status='OK' and method='html_text'
    # for EVERY wrapped page, so any document that falls off the strict
    # path (short block, low reliability, lenient fallback) surfaces as a
    # localized value mismatch instead of a silently dropped row.
    return res.extracted.select(
        "url", F.col("text").alias("extracted_text"), "method", "status")


_ORACLE_ROUNDTRIP = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS extracted_text,
       'html_text' AS method,
       'OK' AS status
FROM documents
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_extract_html_roundtrip(spark, "/root/testdata/sf0.001")


# ===========================================================================
# TPC-H-style relational coverage
# ===========================================================================
def q_pricing_summary(spark, sf_dir):
    """Scan+filter+groupBy aggregate (Q1 pattern)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    _pin_utc(spark)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_nations(spark, sf_dir):
    """Multi-join with broadcast dims (orders x customer x nation)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
    )


_ORACLE_TOP_NATIONS = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ===========================================================================
# SURVEY.md §2 operator queries over `documents` / `events`
# ===========================================================================
def q_route_dispatch(spark, sf_dir):
    """R1 format dispatch as a CASE router."""
    route = (
        F.when(F.col("lang").isin("en"), F.lit("native"))
        .when(F.col("lang").isin("de", "fr", "es"), F.lit("latin_eu"))
        .when(F.col("lang") == "zh", F.lit("cjk"))
        .otherwise(F.lit("unsupported"))
    )
    return (
        _docs(spark, sf_dir).select(route.alias("route"))
        .groupBy("route").agg(F.count("*").alias("n_docs"))
    )


_ORACLE_ROUTE = """
SELECT CASE WHEN lang IN ('en') THEN 'native'
            WHEN lang IN ('de','fr','es') THEN 'latin_eu'
            WHEN lang = 'zh' THEN 'cjk'
            ELSE 'unsupported' END AS route,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""

_SQL_RATIO = (
    "CASE WHEN length(text) > 0 THEN length(regexp_replace(text, "
    "'[^0-9A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE) "
    "ELSE 0.0 END"
)


def q_reliability_by_lang(spark, sf_dir):
    """A1 reliability scoring aggregated per lang (ASCII SQL-twin)."""
    return (
        _docs(spark, sf_dir)
        .select("lang", _ratio().alias("r"))
        .groupBy("lang")
        .agg(F.round(F.avg("r"), 6).alias("avg_rel"),
             F.count("*").alias("n_docs"))
    )


_ORACLE_RELIABILITY = f"""
SELECT lang, round(avg({_SQL_RATIO}), 6) AS avg_rel, count(*) AS n_docs
FROM documents GROUP BY lang
"""


def q_median_gate(spark, sf_dir):
    """A3/R5: exact median per group + accept/escalate gate."""
    return (
        _docs(spark, sf_dir).select("source", _ratio().alias("r"))
        .groupBy("source")
        .agg(F.round(F.median("r"), 6).alias("median_rel"))
        .withColumn("accepted", F.col("median_rel") >= F.lit(_CUTOFF))
    )


_ORACLE_MEDIAN_GATE = f"""
SELECT source, round(median({_SQL_RATIO}), 6) AS median_rel,
       round(median({_SQL_RATIO}), 6) >= {_CUTOFF} AS accepted
FROM documents GROUP BY source
"""



def q_max_score_fallback(spark, sf_dir):
    """A4: doc score fallback = max per-page reliability."""
    return (
        _docs(spark, sf_dir).select("source", _ratio().alias("r"))
        .groupBy("source")
        .agg(F.round(F.max("r"), 6).alias("max_rel"),
             F.round(F.min("r"), 6).alias("min_rel"))
    )


_ORACLE_MAX_FALLBACK = f"""
SELECT source, round(max({_SQL_RATIO}), 6) AS max_rel,
       round(min({_SQL_RATIO}), 6) AS min_rel
FROM documents GROUP BY source
"""


def q_coverage_summary(spark, sf_dir):
    """A5/A6: counts, good-doc coverage %, median chars, pct >= gate."""
    return (
        _docs(spark, sf_dir)
        .select("source", "n_chars", _ratio().alias("r"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum((F.col("n_chars") >= 300).cast("long")).alias("good_docs"),
            F.round(100 * F.avg((F.col("n_chars") >= 300).cast("double")), 4)
            .alias("coverage_pct"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.median(F.col("n_chars").cast("double")), 4)
            .alias("median_chars"),
            F.round(100 * F.avg((F.col("r") >= _CUTOFF).cast("double")), 4)
            .alias("pct_above_gate"),
        )
    )


_ORACLE_COVERAGE = f"""
SELECT source, count(*) AS docs,
       CAST(sum(CAST(n_chars >= 300 AS BIGINT)) AS BIGINT) AS good_docs,
       round(100 * avg(CAST(n_chars >= 300 AS DOUBLE)), 4) AS coverage_pct,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(median(CAST(n_chars AS DOUBLE)), 4) AS median_chars,
       round(100 * avg(CAST(({_SQL_RATIO}) >= {_CUTOFF} AS DOUBLE)), 4)
           AS pct_above_gate
FROM documents GROUP BY source
"""


def q_granularity_switch(spark, sf_dir):
    """A7: per-doc vs per-page predicate (size/page thresholds)."""
    d = _docs(spark, sf_dir).withColumn(
        "per_page",
        (F.col("n_chars") >= 400)
        | (TS.token_count(F.col("text")).cast("long") >= 80))
    return d.groupBy("source", "per_page").agg(F.count("*").alias("n_docs"))


_ORACLE_GRANULARITY = f"""
SELECT source,
       (n_chars >= 400 OR
        CAST(len(regexp_extract_all(text, '{TS.TOKEN_PATTERN}')) AS BIGINT)
        >= 80) AS per_page,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q_chunk_pack_cumsum(spark, sf_dir):
    """A9: windowed cumulative-sum chunk assignment (SQL twin of the
    greedy packer in operators/chunker.py)."""
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = _docs(spark, sf_dir).withColumn(
        "chunk_id",
        (F.floor((F.sum("n_chars").over(w) - 1) / F.lit(5000)) + 1)
        .cast("long"))
    return d.groupBy("source").agg(
        F.max("chunk_id").alias("n_chunks"),
        F.sum("n_chars").alias("total_chars"))


_ORACLE_CHUNK = """
WITH c AS (
  SELECT source, n_chars,
         CAST(floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - 1) / 5000) + 1 AS BIGINT)
         AS chunk_id
  FROM documents)
SELECT source, max(chunk_id) AS n_chunks,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM c GROUP BY source
"""


def q_resume_anti_join(spark, sf_dir):
    """S10: idempotent resume = anti-join vs committed manifest."""
    d = _docs(spark, sf_dir)
    committed = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (
        d.join(committed, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("remaining"),
             F.sum("n_chars").alias("remaining_chars"))
    )


_ORACLE_RESUME = """
SELECT lang, count(*) AS remaining,
       CAST(sum(n_chars) AS BIGINT) AS remaining_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents c
                  WHERE c.doc_id % 7 = 0 AND c.doc_id = d.doc_id)
GROUP BY lang
"""


def q_cascade_union(spark, sf_dir):
    """R5 cascade as filtered unions: pass1 / pass2 / quarantine."""
    d = _docs(spark, sf_dir).withColumn("r", _ratio())
    b1 = d.filter(F.col("r") >= 0.82).withColumn("method", F.lit("pass1"))
    b2 = d.filter((F.col("r") < 0.82) & (F.col("n_chars") >= 200)) \
        .withColumn("method", F.lit("pass2"))
    b3 = d.filter((F.col("r") < 0.82) & (F.col("n_chars") < 200)) \
        .withColumn("method", F.lit("quarantine"))
    return (
        b1.unionByName(b2).unionByName(b3)
        .groupBy("method")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


_ORACLE_CASCADE = f"""
WITH d AS (SELECT *, {_SQL_RATIO} AS r FROM documents),
u AS (
  SELECT 'pass1' AS method, n_chars FROM d WHERE r >= 0.82
  UNION ALL
  SELECT 'pass2', n_chars FROM d WHERE r < 0.82 AND n_chars >= 200
  UNION ALL
  SELECT 'quarantine', n_chars FROM d WHERE r < 0.82 AND n_chars < 200)
SELECT method, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM u GROUP BY method
"""


def q_explode_sentences(spark, sf_dir):
    """Page/frame explode analog (E12/S7): doc -> sentence rows."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\. ")).alias("sentence"))
    return d.filter(F.col("sentence") != "").select(
        "doc_id", "sentence",
        F.length("sentence").cast("long").alias("sentence_chars"))


_ORACLE_EXPLODE = """
SELECT * FROM (
  SELECT doc_id, unnest(string_split_regex(text, '\\. ')) AS sentence,
         CAST(length(unnest(string_split_regex(text, '\\. '))) AS BIGINT)
             AS sentence_chars
  FROM documents)
WHERE sentence <> ''
"""


def q_best_doc_per_source(spark, sf_dir):
    """A8 best-of-variants argmax via deterministic row_number."""
    w = Window.partitionBy("source").orderBy(
        F.col("r").desc(), F.col("doc_id"))
    return (
        _docs(spark, sf_dir).withColumn("r", _ratio())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", F.round("r", 6).alias("best_rel"))
    )


_ORACLE_BEST_DOC = f"""
SELECT source, doc_id, round(r, 6) AS best_rel FROM (
  SELECT source, doc_id, {_SQL_RATIO} AS r,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_SQL_RATIO} DESC, doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


def q_training_filter_pipeline(spark, sf_dir):
    """The composed training-data gate: language + quality + repetition
    + length filters in one pass (what the individual signals exist
    for). One scan, all predicates fused by Catalyst into a single
    whole-stage filter; per-source pass/fail counts for observability."""
    d = _docs(spark, sf_dir)
    passed = (
        (F.col("lang").isin("en", "de", "fr", "es"))
        & (TS.quality_score(F.col("text")) >= 0.3)
        & (TS.dup_unigram_ratio(F.col("text")) <= 0.8)
        & (F.length("text") >= 80)
    )
    return (
        # coalesce: a NULL-text row makes the predicate NULL, which
        # avg() would silently skip while the oracle's CASE counts it
        # as a fail — NULL text IS a fail
        d.withColumn("pass", F.coalesce(passed.cast("int"), F.lit(0)))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("pass").alias("n_pass"),
             F.round(F.avg("pass"), 6).alias("pass_rate"))
    )


def q_percentile_stats(spark, sf_dir):
    """Exact interpolated percentiles of event value per event_type
    (Spark `percentile` == DuckDB `quantile_cont`). The approximate
    sketch twin (approx_percentile / HLL) is checked for error bounds
    in pytest — sketches can't be value-matched across engines."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"))


_ORACLE_PERCENTILE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q_approx_distinct_stats(spark, sf_dir):
    """Mergeable-sketch cardinality: HLL++ approx_count_distinct per
    event_type beside the exact count. At 10^12 rows the exact
    countDistinct is a full shuffle of the distinct keys; the HLL
    sketch is constant memory per group and merges map-side. Error
    bound (<5% at rsd=0.02) asserted in pytest; rows-only for the
    driver (sketch estimates differ across engines)."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"))


def q_asof_join_purchases(spark, sf_dir):
    """As-of join: each click event annotated with the user's most
    recent purchase value at-or-before it (one shuffle on user_id —
    union + window, never an inequality join). Verified against
    DuckDB's native ASOF JOIN."""
    from document_extractor_spark.operators.temporal import asof_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros(
            F.col("ts").cast("timestamp_ltz")).alias("us"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(
            F.col("ts").cast("timestamp_ltz")).alias("us"),
        F.col("value").alias("last_purchase_value"))
    joined = asof_join(clicks, purchases, on="us", by="user_id",
                       value_cols=("last_purchase_value",))
    return joined.select(
        "event_id", "user_id",
        F.round("last_purchase_value", 6).alias("last_purchase_value"))


_ORACLE_ASOF = """
WITH clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, epoch_us(ts) AS us, value
  FROM events WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
       round(p.value, 6) AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.us >= p.us
"""


def q_range_join_session_overlap(spark, sf_dir):
    """Range join via interval binning: per-user 12h-gap activity
    sessions vs ALL events (any user) falling inside each interval —
    an equi-join on 6h bins plus an exact containment re-check, never
    a BroadcastNestedLoopJoin. Verified against DuckDB's BETWEEN join."""
    from document_extractor_spark.operators.temporal import range_join_bins

    e = _events(spark, sf_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp_ltz")))
    w = Window.partitionBy("user_id").orderBy("us")
    sess = (
        e.withColumn(
            "new_s",
            F.when(F.col("us") - F.lag("us").over(w) >= 43_200_000_000, 1)
            .otherwise(0)
            + F.when(F.lag("us").over(w).isNull(), 1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    pts = e.select(F.col("event_id"), F.col("us"))
    overlap = range_join_bins(pts, sess, point_col="us",
                              start_col="start_us", end_col="end_us",
                              bin_width=21_600_000_000)
    return (
        overlap.groupBy("user_id", "sid")
        .agg(F.count("*").alias("n_overlapping"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum("n_overlapping").alias("overlapping_events"))
    )


_ORACLE_RANGE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
m AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= 43200000000 THEN 1 ELSE 0 END
         + CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
                     IS NULL THEN 1 ELSE 0 END AS new_s
  FROM e),
s AS (
  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us
  FROM (SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
        FROM m)
  GROUP BY user_id, sid),
o AS (
  SELECT s.user_id, s.sid, count(*) AS n_overlapping
  FROM s JOIN e ON e.us BETWEEN s.start_us AND s.end_us
  GROUP BY s.user_id, s.sid)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(n_overlapping) AS BIGINT) AS overlapping_events
FROM o GROUP BY user_id
"""


def q_sessionize_events(spark, sf_dir):
    """Streaming-analog sessionization: 30-min-gap sessions per user."""
    # parquet naive timestamps load as TIMESTAMP_NTZ; with the session
    # tz pinned to UTC this cast matches DuckDB's epoch_us exactly
    e = _events(spark, sf_dir).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp_ltz")))
    w = Window.partitionBy("user_id").orderBy("us")
    newsess = F.when(
        F.col("us") - F.lag("us").over(w) >= 1_800_000_000, 1
    ).otherwise(0) + F.when(F.lag("us").over(w).isNull(), 1).otherwise(0)
    return (
        e.withColumn("new_session", newsess)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("sessions"),
             F.count("*").alias("events"))
    )


_ORACLE_SESSIONS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= 1800000000 THEN 1 ELSE 0 END
         + CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
                     IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions,
       count(*) AS events
FROM e GROUP BY user_id
"""


def q_hourly_rollup(spark, sf_dir):
    """Tumbling-window aggregate (hour x event_type)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts")))
            .alias("hour_us"),
            "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )


_ORACLE_HOURLY = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def q_json_props(spark, sf_dir):
    """Semi-structured projection: JSON field extract + aggregate."""
    e = _events(spark, sf_dir).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long"))
    return e.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.count("*").alias("n"))


_ORACLE_JSON = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
           AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# ===========================================================================
# training-data pipeline operators
# ===========================================================================
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: content-hash groups with keeper (TODO.md:20)."""
    return DD.exact_dedup_groups(_docs(spark, sf_dir))


_ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, count(*) AS n_docs,
       min(doc_id) AS keeper_id
FROM documents GROUP BY 1
"""


def q_ngram_jaccard(spark, sf_dir):
    """Word-3-gram shingle Jaccard near-dup pairs, hot-shingle capped
    (df <= 500) so no single boilerplate phrase can make a join bucket
    quadratic at scale; the oracle applies the same cap."""
    return DD.ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.03, max_shingle_df=500)


_ORACLE_JACCARD = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substring(md5(unnest(
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              for i in range(1, len(t) - 1)])), 1, 15)) AS BIGINT)
         AS shingle
  FROM toks WHERE len(t) >= 3),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0
                    GROUP BY shingle HAVING count(*) <= 500)),
-- set sizes over the FULL universe; only intersections are df-capped
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE), 6) >= 0.03
"""


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=8), md5-derived — SQL-reproducible."""
    return DD.minhash_signatures(_docs(spark, sf_dir), k=8)


def _sql_seed_hash(expr: str, seed: int) -> str:
    return (f"CAST(('0x' || substring(md5({expr} || ':{seed}'), 1, 15)) "
            f"AS BIGINT)")


_ORACLE_MINHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            t -> t <> '')) AS tok
  FROM documents)
SELECT doc_id, {mins}
FROM toks GROUP BY doc_id
""".format(mins=", ".join(
    f"min({_sql_seed_hash('tok', s)}) AS mh_{s}" for s in range(8)))


def q_minhash_lsh_buckets(spark, sf_dir):
    """MinHash-LSH banding: candidate buckets with >1 doc."""
    return DD.minhash_band_buckets(_docs(spark, sf_dir), k=8, bands=4)


_ORACLE_LSH = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            t -> t <> '')) AS tok
  FROM documents),
sigs AS (SELECT doc_id, {mins} FROM toks GROUP BY doc_id),
bands AS (
  {bands_union})
SELECT band, band_sig, count(*) AS n_docs, min(doc_id) AS min_id
FROM bands GROUP BY 1, 2 HAVING count(*) > 1
""".format(
    mins=", ".join(
        f"min({_sql_seed_hash('tok', s)}) AS mh_{s}" for s in range(8)),
    bands_union="\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(CAST(mh_{2*b} AS VARCHAR) || ',' || "
        f"CAST(mh_{2*b+1} AS VARCHAR)) AS band_sig FROM sigs"
        for b in range(4)),
)


def q_token_stats(spark, sf_dir):
    """Token counting (BPE-ish regex) per lang."""
    d = _docs(spark, sf_dir).withColumn(
        "tc", TS.token_count(F.col("text")).cast("long"))
    return d.groupBy("lang").agg(
        F.sum("tc").alias("total_tokens"),
        F.round(F.avg("tc"), 4).alias("avg_tokens"))


_ORACLE_TOKENS = f"""
SELECT lang,
       CAST(sum(CAST(len(regexp_extract_all(text, '{TS.TOKEN_PATTERN}'))
           AS BIGINT)) AS BIGINT) AS total_tokens,
       round(avg(CAST(len(regexp_extract_all(text, '{TS.TOKEN_PATTERN}'))
           AS BIGINT)), 4) AS avg_tokens
FROM documents GROUP BY lang
"""


def q_langid(spark, sf_dir):
    """Marker-word language-ID vs the labeled lang."""
    d = _docs(spark, sf_dir).withColumn(
        "predicted", TS.predict_lang(F.col("text")))
    return d.groupBy("lang", "predicted").agg(F.count("*").alias("n"))


def _sql_occurrences(word: str) -> str:
    pad = f"' ' || lower(text) || ' '"
    needle = f" {word} "
    return (f"CAST((length({pad}) - length(replace({pad}, '{needle}', '')))"
            f" / {len(needle)} AS BIGINT)")


_SQL_LANG_SCORES = {
    lang: " + ".join(_sql_occurrences(w) for w in words)
    for lang, words in TS.LANG_MARKERS.items()
}

_ORACLE_LANGID = f"""
WITH s AS (
  SELECT lang,
         {_SQL_LANG_SCORES['en']} AS s_en,
         {_SQL_LANG_SCORES['de']} AS s_de,
         {_SQL_LANG_SCORES['fr']} AS s_fr,
         {_SQL_LANG_SCORES['es']} AS s_es
  FROM documents)
SELECT lang,
       CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                 AND s_en > 0 THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
            WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
            WHEN s_es > 0 THEN 'es'
            ELSE 'unknown' END AS predicted,
       count(*) AS n
FROM s GROUP BY 1, 2
"""


def q_quality_scores(spark, sf_dir):
    """Quality scoring (density + length blend) per source."""
    d = _docs(spark, sf_dir).withColumn(
        "q", TS.quality_score(F.col("text")))
    return d.groupBy("source").agg(
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.min("q").alias("min_quality"),
        F.max("q").alias("max_quality"))


_SQL_QUALITY = (
    f"round(0.6 * least(1.0, ({_SQL_RATIO}) / 0.8) + 0.4 * least(1.0, "
    f"CAST(len(regexp_extract_all(text, '{TS.TOKEN_PATTERN}')) AS DOUBLE)"
    f" / 200.0), 4)"
)


def q_legacy_reliability(spark, sf_dir):
    """A2: the reference's legacy rich scorer (common_pdf.sh:85-156) —
    density/stopword/repetition blend at weights .5/.3/.2 — as pure
    Column math, per document."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", TS.legacy_reliability(F.col("text")).alias("legacy_rel"))


_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in TS.LEGACY_STOPWORDS) + "]"

_ORACLE_LEGACY = f"""
WITH b AS (
  SELECT doc_id,
    regexp_replace(coalesce(text, ''), '[ \\t\\n\\x0B\\f\\r]', '', 'g')
        AS nonws,
    list_filter(string_split_regex(
        regexp_replace(lower(coalesce(text, '')), '[^a-z]+', ' ', 'g'),
        ' '), x -> x <> '') AS toks
  FROM documents),
c AS (
  SELECT doc_id,
    least(1.0, len(nonws) / 400.0) AS d,
    CASE WHEN len(toks) > 0
         THEN len(list_filter(toks, x -> list_contains({_SW_LIST_SQL}, x)))
              / CAST(len(toks) AS DOUBLE)
         ELSE 0.0 END AS w,
    CASE WHEN len(nonws) > 0
         THEN 1.0 - list_max(list_transform(
                list_distinct(list_transform(range(1, len(nonws) + 1),
                                             i -> nonws[CAST(i AS INT)])),
                ch -> len(list_filter(
                    list_transform(range(1, len(nonws) + 1),
                                   i -> nonws[CAST(i AS INT)]),
                    x -> x = ch)))) / CAST(len(nonws) AS DOUBLE)
         ELSE 0.0 END AS r
  FROM b)
SELECT doc_id,
       round(greatest(0.0, least(1.0, 0.5*d + 0.3*w + 0.2*r)), 4)
           AS legacy_rel
FROM c
"""

_ORACLE_TRAINING_FILTER = f"""
WITH f AS (
  SELECT source,
         CASE WHEN lang IN ('en','de','fr','es')
                   AND ({_SQL_QUALITY}) >= 0.3
                   AND (CASE WHEN len(list_filter(string_split_regex(
                                      text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) > 0
                             THEN 1.0 - len(list_distinct(list_filter(
                                      string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                                      x -> x <> '')))
                                  / CAST(len(list_filter(
                                      string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                                      x -> x <> '')) AS DOUBLE)
                             ELSE 0.0 END) <= 0.8
                   AND length(text) >= 80
              THEN 1 ELSE 0 END AS pass
  FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(pass) AS BIGINT) AS n_pass,
       round(avg(pass), 6) AS pass_rate
FROM f GROUP BY source
"""

_ORACLE_QUALITY = f"""
SELECT source, round(avg({_SQL_QUALITY}), 6) AS avg_quality,
       min({_SQL_QUALITY}) AS min_quality,
       max({_SQL_QUALITY}) AS max_quality
FROM documents GROUP BY source
"""


def q_repetition_ratios(spark, sf_dir):
    """Gopher-style repetition signals: per-source average fraction of
    duplicate words / word-bigrams (template & spam detection)."""
    d = _docs(spark, sf_dir).select(
        "source",
        TS.dup_unigram_ratio(F.col("text")).alias("du"),
        TS.dup_bigram_ratio(F.col("text")).alias("db"))
    return d.groupBy("source").agg(
        F.round(F.avg("du"), 6).alias("avg_dup_unigram"),
        F.round(F.avg("db"), 6).alias("avg_dup_bigram"))


_ORACLE_REPETITION = """
WITH w AS (
  SELECT source, list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                              x -> x <> '') AS ws FROM documents
), r AS (
  SELECT source,
         CASE WHEN len(ws) > 0
              THEN 1.0 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)
              ELSE 0.0 END AS du,
         CASE WHEN len(ws) >= 2
              THEN 1.0 - len(list_distinct(list_transform(
                       range(1, len(ws)),
                       i -> ws[i] || ' ' || ws[i + 1])))
                   / CAST(len(ws) - 1 AS DOUBLE)
              ELSE 0.0 END AS db
  FROM w)
SELECT source, round(avg(du), 6) AS avg_dup_unigram,
       round(avg(db), 6) AS avg_dup_bigram
FROM r GROUP BY source
"""


def q_vocab_topk(spark, sf_dir):
    """Corpus-wide top-50 vocabulary with counts (tokenizer-building /
    frequency-filter primitive). Deterministic tiebreak on the word."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


_ORACLE_VOCAB = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY n DESC, word ASC LIMIT 50
"""


def q_fingerprints(spark, sf_dir):
    """Normalized md5 content fingerprint distinctness per source."""
    d = _docs(spark, sf_dir).withColumn(
        "fp", TS.fingerprint(F.col("text")))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("distinct_fps"))


_ORACLE_FINGERPRINT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ',
                                              'g')))) AS distinct_fps
FROM documents GROUP BY source
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 embedding."""
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return SIM.brute_force_topk(emb, list(qv), k=10)


_ORACLE_ANN = """
WITH q AS (
  SELECT unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = 0),
x AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
qn AS (SELECT sqrt(sum(v * v)) AS n FROM q),
s AS (
  SELECT x.vec_id,
         sum(x.v * q.v) AS dot,
         sqrt(sum(x.v * x.v)) AS xn
  FROM x JOIN q ON x.i = q.i GROUP BY x.vec_id)
SELECT vec_id, round(dot / (xn * (SELECT n FROM qn)), 4) AS cosine
FROM s ORDER BY cosine DESC, vec_id LIMIT 10
"""


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pair count per threshold bucket."""
    pairs = DD._embedding_neardup_pairs_exact(_emb(spark, sf_dir), threshold=0.5)
    return pairs.groupBy(
        F.floor(F.col("cosine") * 10).cast("long").alias("cos_bucket")
    ).agg(F.count("*").alias("n_pairs"))


_ORACLE_NEARDUP = """
WITH x AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM x GROUP BY vec_id),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
  FROM x a JOIN x b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
c AS (
  SELECT id_a, id_b,
         round(dot / (na.nrm * nb.nrm), 4) AS cosine
  FROM p JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
SELECT CAST(floor(cosine * 10) AS BIGINT) AS cos_bucket,
       count(*) AS n_pairs
FROM c WHERE cosine >= 0.5 GROUP BY 1
"""


def q_chunk_pack_greedy(spark, sf_dir):
    """A9 EXACT greedy never-split packing (applyInPandas per run) —
    oracle: recursive CTE implementing the same greedy scan."""
    from document_extractor_spark.operators.chunker import assign_chunks

    d = _docs(spark, sf_dir).select(
        "source", "doc_id", F.col("n_chars").alias("doc_bytes"))
    out = assign_chunks(d, max_bytes=5000, run_col="source",
                        order_col="doc_id", size_col="doc_bytes")
    return out.select("source", "doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"))


_ORACLE_CHUNK_GREEDY = """
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents),
g AS (
  SELECT source, doc_id, n_chars, rn,
         CAST(1 AS BIGINT) AS chunk_id, n_chars AS used
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.n_chars, o.rn,
         CASE WHEN g.used > 0 AND g.used + o.n_chars > 5000
              THEN g.chunk_id + 1 ELSE g.chunk_id END,
         CASE WHEN g.used > 0 AND g.used + o.n_chars > 5000
              THEN o.n_chars ELSE g.used + o.n_chars END
  FROM g JOIN ordered o ON o.source = g.source AND o.rn = g.rn + 1)
SELECT source, doc_id, chunk_id FROM g
"""


def q_salted_domain_stats(spark, sf_dir):
    """Salted two-phase aggregation (skew handling) — must equal the
    plain GROUP BY the oracle runs."""
    from document_extractor_spark.operators.skew import salted_agg

    d = _docs(spark, sf_dir)
    return salted_agg(
        d, "source",
        {"docs": ("count", "doc_id"),
         "total_chars": ("sum", "n_chars"),
         "max_chars": ("max", "n_chars")},
        salt_factor=8,
        unique_key="doc_id",
    )


_ORACLE_SALTED = """
SELECT source, count(doc_id) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY source
"""


def q_order_priority_semi(spark, sf_dir):
    """Semi-join (TPC-H Q4 pattern): orders having any lineitem."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        # no .distinct(): semi-join semantics already dedup matches,
        # and the extra shuffle would double the join cost at scale
        orders.join(li.select("l_orderkey"),
                    orders.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_ORACLE_SEMI = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority
"""


def q_customers_left_join(spark, sf_dir):
    """Left outer join: per-customer order counts incl. zero."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.count("o_orderkey").alias("orders"),
            F.sum((F.col("o_orderkey").isNull()).cast("long"))
            .alias("customers_without_orders"),
        )
    )


_ORACLE_LEFT_JOIN = """
SELECT c_mktsegment, count(DISTINCT c_custkey) AS customers,
       count(o_orderkey) AS orders,
       CAST(sum(CAST(o_orderkey IS NULL AS BIGINT)) AS BIGINT)
           AS customers_without_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# ===========================================================================
# non-SQL-expressible ops (rows-only driver check)
# ===========================================================================
def q_simhash_fingerprints(spark, sf_dir):
    """SimHash 63-bit fingerprints (numpy-vectorized pandas UDF),
    value-checked bit-for-bit by a DuckDB per-bit majority twin."""
    return DD.simhash_fingerprints(_docs(spark, sf_dir))


_ORACLE_SIMHASH = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
             string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))) AS tok
  FROM documents),
h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT) AS hv
  FROM toks),
bits AS (
  SELECT doc_id, CAST(b.b AS INT) AS b,
         CASE WHEN 2 * count(*) FILTER (((hv >> CAST(b.b AS INT)) & 1) = 1)
                   > count(*) THEN 1 ELSE 0 END AS bit
  FROM h, LATERAL unnest(range(0, 63)) AS b(b)
  GROUP BY doc_id, b.b),
fp AS (
  SELECT doc_id,
         CAST(sum(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << b))
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id)
-- LEFT JOIN back: a doc with no tokens (empty/NULL text) still emits
-- a row with simhash 0, exactly like the Spark UDF
SELECT d.doc_id, coalesce(fp.simhash, 0) AS simhash
FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
"""


def q_simhash_neardup_pairs(spark, sf_dir):
    """SimHash near-dup pairs: top-16-bit blocked self-join, hamming
    <= 3 — never a cross join. Value-checked against a DuckDB twin
    that recomputes the per-bit-majority fingerprints and the same
    blocked join."""
    return DD.simhash_neardup_pairs(_docs(spark, sf_dir), max_hamming=3)


# fingerprint CTEs identical to _ORACLE_SIMHASH, then the same blocked
# (simhash >> 47) self-join with bit_count(xor) distance
_ORACLE_SIMHASH_PAIRS = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
             string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> ''))) AS tok
  FROM documents),
h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT) AS hv
  FROM toks),
bits AS (
  SELECT doc_id, CAST(b.b AS INT) AS b,
         CASE WHEN 2 * count(*) FILTER (((hv >> CAST(b.b AS INT)) & 1) = 1)
                   > count(*) THEN 1 ELSE 0 END AS bit
  FROM h, LATERAL unnest(range(0, 63)) AS b(b)
  GROUP BY doc_id, b.b),
fp0 AS (
  SELECT doc_id,
         CAST(sum(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << b))
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id),
-- simhash=0 rows (empty docs) are excluded like the Spark operator:
-- they form one quadratic hot block and belong to exact dedup.
-- Pigeonhole blocking: 4 blocks (16/16/16/15); hamming<=3 pairs
-- must share at least one block, so candidate recall is 100%
blocked AS (
  SELECT doc_id, simhash, b.bi AS bi,
         CASE b.bi WHEN 0 THEN simhash >> 47
                   WHEN 1 THEN (simhash >> 31) & 65535
                   WHEN 2 THEN (simhash >> 15) & 65535
                   ELSE simhash & 32767 END AS bv
  FROM fp0, unnest(range(0, 4)) AS b(bi)
  WHERE simhash <> 0),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM blocked a JOIN blocked b
    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def q_lsh_ann_topk(spark, sf_dir):
    """LSH-bucketed ANN top-k (random hyperplanes, multiprobe) via the
    build/query split: lsh_build signs the corpus once, lsh_query only
    probes buckets (at scale the bucketed table persists partitioned
    by bucket; this one-query entry builds unpersisted)."""
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    index = SIM.lsh_build(emb, persist=False)
    return SIM.lsh_query(index, list(qv), k=10)


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing rolling-hash document sketches."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(TS.winnow_fingerprint(F.col("text"))).cast("long")
        .alias("n_grams"))


# DuckDB twin of functions/textstats.py::winnow (k=8, window=4): k-gram
# md5 top-8-bytes >> 1, min per 4-window, consecutive-dedupe, count.
_ORACLE_WINNOW = """
WITH g AS (
  SELECT doc_id, t.i, substr(text, CAST(t.i AS INT), 8) AS gram
  FROM documents, LATERAL unnest(range(1, len(text) - 6)) AS t(i)
  WHERE len(text) >= 8),
h AS (
  SELECT doc_id, i,
         CAST(CAST(concat('0x', substr(md5(gram), 1, 16)) AS UBIGINT) >> 1
              AS BIGINT) AS h
  FROM g),
w AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM h),
d AS (
  SELECT doc_id, m,
         lag(m) OVER (PARTITION BY doc_id ORDER BY i) AS pm
  FROM w WHERE i <= greatest(ng - 3, 1)),
c AS (
  SELECT doc_id,
         CAST(count(*) FILTER (pm IS NULL OR m != pm) AS BIGINT) AS n
  FROM d GROUP BY doc_id)
SELECT docs.doc_id, coalesce(c.n, 0) AS n_grams
FROM documents docs LEFT JOIN c ON docs.doc_id = c.doc_id
"""


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN: k-means coarse quantizer, probe nearest cells only.
    Searching every cell (nprobe == n_cells) is exactly brute force,
    so the k=10 neighbors here are checked in pytest against the
    brute-force path; this entry exercises the approximate setting."""
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return SIM.ivf_topk(emb, qv, k=10, n_cells=8, nprobe=8)


def q_embedding_neardup_lsh(spark, sf_dir):
    """LSH-bucketed embedding near-dup (the 10^12-row scale path for
    embedding_neardup; hyperplane buckets -> in-bucket cosine).
    The input is salted with exact duplicates of every vector, all of
    which MUST be recovered (identical vectors share every sign bit)."""
    emb = _emb(spark, sf_dir)
    dups = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    # dim=64 is the embeddings table's fixed width; arrow_pairs moves
    # the in-bucket quadratic into a per-bucket gram kernel
    # (bit-identical to the join+fold; see _bucket_pairs_arrow)
    pairs = DD.embedding_neardup_pairs_lsh(
        emb.unionByName(dups), threshold=0.99, n_bits=6, dim=64,
        arrow_pairs=True)
    return pairs.select(
        "id_a", "id_b", "cosine").filter(F.col("id_b") - F.col("id_a")
                                         == 1_000_000)


# identical vectors share EVERY sign bit whatever the hyperplanes are,
# so the salted-duplicate recovery set is plane-independent and exactly
# enumerable: one (v, v+1e6, cosine 1.0) pair per embedding row.
_ORACLE_NEARDUP_LSH = """
SELECT vec_id AS id_a,
       vec_id + 1000000 AS id_b,
       CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings
"""


def q_media_metadata(spark, sf_dir):
    """Multimodal metadata over opaque binary media columns with REAL
    header parsing (PNG IHDR / RIFF fmt+data / MP4 mvhd / TIFF IFD
    walk — stdlib only; pixel/sample decode stays stubbed). Payloads
    are built deterministically from the id, so the oracle recomputes
    every field arithmetically in SQL.  TIFF fixtures (r5) alternate
    byte order and frame count; the metadata row reports the FIRST
    frame's dims (per-frame rows are `media_frames`' job)."""
    from document_extractor_spark.operators.multimodal import (
        build_mp4,
        build_png,
        build_tiff,
        build_wav,
        media_meta_table,
    )

    rows = []
    for i in range(80):
        if i % 4 == 0:
            rows.append((i, build_png(16 * (i % 7 + 1), 16 * (i % 5 + 1))))
        elif i % 4 == 1:
            rows.append((i, build_wav(i % 9 + 1)))
        elif i % 4 == 2:
            rows.append((i, build_mp4(i % 11 + 1)))
        else:
            n = i % 3 + 1
            rows.append((i, build_tiff(
                [(8 * (i % 5 + 1) + j, 6 * (i % 3 + 1) + j)
                 for j in range(n)],
                big_endian=(i % 8 == 7))))
    media = spark.createDataFrame(rows, "id long, media binary")
    return media_meta_table(media)


def q_media_features(spark, sf_dir):
    """REAL media content decode (r3 verdict #5): PNG pixels via
    zlib inflate + defilter, WAV PCM samples via numpy — exact integer
    stats (count / sum / sum-of-squares / peak-abs).  MP4/JPEG rows
    yield NULL stats (codec decode is not stdlib-feasible; the engine
    reports 'not decoded' instead of fabricating numbers).  Fixture
    content follows closed formulas, so the oracle recomputes every
    stat arithmetically in SQL — the decode path is value-checked,
    not just shape-checked."""
    from document_extractor_spark.operators.multimodal import (
        build_mp4,
        build_png_full,
        build_wav_full,
        media_feature_table,
    )

    rows = []
    for i in range(40):
        if i % 4 == 0:
            rows.append((i, build_png_full(8 * (i % 5 + 1),
                                           4 * (i % 3 + 1))))
        elif i % 4 == 1:
            rows.append((i, build_wav_full((i % 7 + 1) * 500)))
        elif i % 4 == 2:
            rows.append((i, build_mp4(i % 11 + 1)))
        else:
            rows.append((i, b"\xff\xd8\xff\xe0" + bytes(64)))
    media = spark.createDataFrame(rows, "id long, media binary")
    return media_feature_table(media)


_ORACLE_MEDIA_FEATURES = """
WITH dims AS (
  SELECT i,
         CASE i % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
                    WHEN 2 THEN 'video/mp4' ELSE 'image/jpeg' END AS kind,
         8 * (i % 5 + 1) AS w, 4 * (i % 3 + 1) AS h,
         (i % 7 + 1) * 500 AS ns
  FROM range(0, 40) t(i)),
-- DuckDB range() cannot take lateral column bounds: enumerate to the
-- fixture maxima and filter per row instead
pngvals AS (
  SELECT d.i, (3 * x.x + 7 * y.y + 11 * c.c) % 256 AS v
  FROM dims d, range(0, 40) x(x), range(0, 12) y(y), range(0, 3) c(c)
  WHERE d.i % 4 = 0 AND x.x < d.w AND y.y < d.h),
png AS (
  SELECT i, count(*) AS n_values, sum(v) AS v_sum,
         sum(v * v) AS v_sqsum, max(v) AS v_peak
  FROM pngvals GROUP BY i),
wavvals AS (
  SELECT d.i, (j.j * 2654435761) % 65536 - 32768 AS v
  FROM dims d, range(0, 3500) j(j)
  WHERE d.i % 4 = 1 AND j.j < d.ns),
wav AS (
  SELECT i, count(*) AS n_values, sum(v) AS v_sum,
         sum(v * v) AS v_sqsum, max(abs(v)) AS v_peak
  FROM wavvals GROUP BY i)
SELECT CAST(d.i AS BIGINT) AS id, d.kind,
       CAST(coalesce(p.n_values, v.n_values) AS BIGINT) AS n_values,
       CAST(coalesce(p.v_sum, v.v_sum) AS BIGINT) AS v_sum,
       CAST(coalesce(p.v_sqsum, v.v_sqsum) AS BIGINT) AS v_sqsum,
       CAST(coalesce(p.v_peak, v.v_peak) AS BIGINT) AS v_peak
FROM dims d LEFT JOIN png p ON p.i = d.i LEFT JOIN wav v ON v.i = d.i
"""


def _media_fixture_sizes() -> tuple[int, int, int]:
    from document_extractor_spark.operators.multimodal import (
        build_mp4, build_png, build_wav)

    # builder byte lengths are shape-constant (headers only)
    return len(build_png(16, 16)), len(build_wav(1)), len(build_mp4(1))


_PNG_BYTES, _WAV_BYTES, _MP4_BYTES = _media_fixture_sizes()

_ORACLE_MEDIA = f"""
SELECT CAST(i AS BIGINT) AS id,
       CASE i % 4 WHEN 0 THEN 'image/png'
                  WHEN 1 THEN 'audio/wav'
                  WHEN 2 THEN 'video/mp4'
                  ELSE 'image/tiff' END AS kind,
       CAST(CASE i % 4 WHEN 0 THEN {_PNG_BYTES}
                       WHEN 1 THEN {_WAV_BYTES}
                       WHEN 2 THEN {_MP4_BYTES}
                       ELSE 8 + 30 * (i % 3 + 1) END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN i % 4 = 0 THEN 16 * (i % 7 + 1)
                 WHEN i % 4 = 3 THEN 8 * (i % 5 + 1) END AS INT) AS width,
       CAST(CASE WHEN i % 4 = 0 THEN 16 * (i % 5 + 1)
                 WHEN i % 4 = 3 THEN 6 * (i % 3 + 1) END AS INT) AS height,
       CAST(CASE i % 4 WHEN 1 THEN 1000 * (i % 9 + 1)
                       WHEN 2 THEN 1000 * (i % 11 + 1) END AS INT)
           AS duration_ms,
       CASE i % 4 WHEN 0 THEN 'png'
                  WHEN 1 THEN 'pcm16@8000'
                  WHEN 2 THEN 'mp4'
                  ELSE 'tiff' END AS codec
FROM range(0, 80) t(i)
"""


def q_media_frames(spark, sf_dir):
    """The reference's E7 multi-frame explode (pass_img.py:106-129:
    one output row per TIFF frame via the n_frames seek loop): TIFF
    payloads expand to per-frame (frame, width, height) rows from the
    IFD chain walk; PNG/JPEG are single-frame; audio yields no rows
    (the image pass never sees it).  One mapInPandas kernel, rows out
    ≠ rows in — the Spark shape of a per-frame explode."""
    from document_extractor_spark.operators.multimodal import (
        build_png,
        build_tiff,
        build_wav,
        media_frame_table,
    )

    rows = []
    for i in range(60):
        if i % 4 == 0:
            n = (i // 4) % 3 + 1
            rows.append((i, build_tiff(
                [(10 + i + j, 5 + 2 * (i % 7) + j) for j in range(n)],
                big_endian=(i % 8 == 4))))
        elif i % 4 == 1:
            rows.append((i, build_png(16 * (i % 7 + 1), 16 * (i % 5 + 1))))
        elif i % 4 == 2:
            # minimal JPEG: SOI + SOF0 segment carrying the dims
            w, h = 20 + i, 30 + (i % 9)
            rows.append((i, b"\xff\xd8\xff\xc0\x00\x11\x08"
                         + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                         + bytes(10)))
        else:
            rows.append((i, build_wav(1)))
    media = spark.createDataFrame(rows, "id long, media binary")
    return media_frame_table(media)


_ORACLE_MEDIA_FRAMES = """
WITH t AS (SELECT i, (i // 4) % 3 + 1 AS n
           FROM range(0, 60) r(i) WHERE i % 4 = 0),
tiff AS (
  SELECT t.i AS id, CAST(j.j + 1 AS INT) AS frame,
         CAST(t.n AS INT) AS n_frames,
         CAST(10 + t.i + j.j AS INT) AS width,
         CAST(5 + 2 * (t.i % 7) + j.j AS INT) AS height
  FROM t, range(0, 3) j(j) WHERE j.j < t.n),
png AS (
  SELECT i AS id, CAST(1 AS INT) AS frame, CAST(1 AS INT) AS n_frames,
         CAST(16 * (i % 7 + 1) AS INT) AS width,
         CAST(16 * (i % 5 + 1) AS INT) AS height
  FROM range(0, 60) r(i) WHERE i % 4 = 1),
jpg AS (
  SELECT i AS id, CAST(1 AS INT) AS frame, CAST(1 AS INT) AS n_frames,
         CAST(20 + i AS INT) AS width, CAST(30 + i % 9 AS INT) AS height
  FROM range(0, 60) r(i) WHERE i % 4 = 2)
SELECT CAST(id AS BIGINT) AS id, frame, n_frames, width, height
FROM (SELECT * FROM tiff UNION ALL SELECT * FROM png
      UNION ALL SELECT * FROM jpg)
"""


# Versioned so a corpus.py change invalidates the cached parquet; bump
# when generate_corpus output changes.
_ENTRY_CORPUS_DIR = "/tmp/des_corpus_entry_600_v9"


def _ensure_entry_corpus() -> str:
    import shutil

    from document_extractor_spark.corpus import write_corpus

    # probe the LAST-written file: write_corpus lands pages.parquet
    # first, so a crash mid-generation would otherwise leave a
    # permanently half-built cache that never regenerates
    if not os.path.exists(f"{_ENTRY_CORPUS_DIR}/expected_quarantine.parquet"):
        shutil.rmtree(_ENTRY_CORPUS_DIR, ignore_errors=True)
        write_corpus(_ENTRY_CORPUS_DIR, 600, seed=42)
    return _ENTRY_CORPUS_DIR


def _run_entry_extraction(spark):
    from document_extractor_spark.config import PipelineConfig
    from document_extractor_spark.pipeline import run_extraction

    cdir = _ensure_entry_corpus()
    pages = spark.read.parquet(f"{cdir}/pages.parquet")
    # bigdoc_page_limit=6 < the 8-page pdf_big fixtures, so big PDFs take
    # the per-page granularity path the golden table encodes (A7).
    # workdir_free_bytes pinned: the R6 low-disk guard must not turn
    # OCR fixtures into low_disk quarantines on a nearly-full gate
    # host — expected.parquet encodes OCR success, so the gate's
    # result has to be independent of the host's real /tmp.
    return run_extraction(
        spark, pages, PipelineConfig(run_id="entry", bigdoc_page_limit=6,
                                     workdir_free_bytes=1 << 62))


def q_extract_pipeline_full(spark, sf_dir):
    """Full binary pipeline (html/pdf/container/noise mix) over the seeded
    synthetic corpus, checked against the generator's NON-CIRCULAR golden
    `expected.parquet` (ground truth fixed at generation time — the
    north_rule byte-identity invariant, reference process_run.py routing).
    OK rows only; ERROR rows get their own oracle in extract_error_rows."""
    res = _run_entry_extraction(spark)
    return (
        res.extracted.filter(F.col("status") == "OK")
        .select(
            "url",
            F.col("page").cast("long").alias("page"),
            F.col("pages").cast("long").alias("pages"),
            "method", "status", "used_fallback", "reliability",
            "text",
        )
    )


_ORACLE_PIPELINE_FULL = f"""
SELECT url,
       TRY_CAST(page AS BIGINT) AS page,
       CAST(pages AS BIGINT) AS pages,
       method, status, used_fallback, reliability,
       extracted_text AS text
FROM '{_ENTRY_CORPUS_DIR}/expected.parquet'
"""


def q_url_canonical_dedup(spark, sf_dir):
    """Canonical-url dedup (Common-Crawl first dedup level): messy url
    variants (case, www., default ports, utm/fbclid params, fragments,
    trailing slashes) are synthesized deterministically from doc_id,
    canonicalized JVM-side, and grouped. The oracle applies the same
    construction + regex rules in DuckDB."""
    from document_extractor_spark.functions.urlnorm import canonical_url

    d = _docs(spark, sf_dir)
    messy = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://www."))
        .otherwise(F.lit("https://")),
        F.lit("site"), (F.col("doc_id") % 40).cast("string"),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("?utm_source=feed&utm_medium=rss")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2"))
        .otherwise(F.lit("")),
    )
    return (
        d.select(F.col("doc_id"), canonical_url(messy).alias("curl"))
        .groupBy("curl")
        .agg(F.count("*").alias("variants"),
             F.min("doc_id").alias("keeper_id"))
    )


_ORACLE_URL_DEDUP = """
WITH m AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'https://' END
     || 'site' || CAST(doc_id % 40 AS VARCHAR) || '.Example.COM'
     || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
     || '/p/' || CAST(doc_id % 100 AS VARCHAR)
     || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
     || (CASE WHEN doc_id % 5 = 0
              THEN '?utm_source=feed&utm_medium=rss' ELSE '' END)
     || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)) AS url
  FROM documents),
c AS (
  SELECT doc_id,
    regexp_replace(url, '#.*$', '', 'g') AS u
  FROM m),
p AS (
  SELECT doc_id,
    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
        AS hostport,
    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
  FROM c),
n AS (
  SELECT doc_id, scheme,
    CASE WHEN scheme = 'http'
         THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                             ':80$', '')
         WHEN scheme = 'https'
         THEN regexp_replace(regexp_replace(hostport, '^www\\.', ''),
                             ':443$', '')
         ELSE regexp_replace(hostport, '^www\\.', '') END AS host,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(rest,
              '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\\1',
              'g'),
            '&&+', '&', 'g'),
          '\\?&+', '?', 'g'),
        '[?&]+$', '', 'g'),
      '(.)/(\\?|$)', '\\1\\2', 'g') AS rest
  FROM p)
SELECT scheme || '://' || host || rest AS curl,
       count(*) AS variants,
       min(doc_id) AS keeper_id
FROM n GROUP BY 1
"""


def q_paragraph_dedup(spark, sf_dir):
    """CCNet-style corpus-wide paragraph dedup over the full extraction
    output: every repeated paragraph is marked, first occurrence (in
    url/page/idx order) kept. Oracle runs the same logic over the
    golden expected table (byte-identical text per extract_pipeline_full)."""
    from document_extractor_spark.operators.dedup import (
        paragraph_dedup_marks,
    )

    res = _run_entry_extraction(spark)
    ok = res.extracted.filter(F.col("status") == "OK").select(
        "url", F.coalesce(F.col("page"), F.lit(0)).cast("long").alias("pg"),
        "text")
    marks = paragraph_dedup_marks(ok, order_cols=["url", "pg"])
    return marks.select(
        "url", "pg", F.col("para_idx").cast("long").alias("para_idx"),
        "para_hash", "is_first")


_ORACLE_PARA_DEDUP = f"""
WITH src AS (
  SELECT url, CAST(coalesce(page, 0) AS BIGINT) AS pg, extracted_text
  FROM '{_ENTRY_CORPUS_DIR}/expected.parquet'),
paras AS (
  SELECT url, pg, CAST(t.i - 1 AS BIGINT) AS para_idx,
         string_split(extracted_text, chr(10))[CAST(t.i AS INT)] AS para
  FROM src, LATERAL unnest(
      range(1, len(string_split(extracted_text, chr(10))) + 1)) AS t(i)
  WHERE trim(string_split(extracted_text, chr(10))[CAST(t.i AS INT)]) <> '')
SELECT url, pg, para_idx, md5(para) AS para_hash,
       (row_number() OVER (PARTITION BY md5(para)
                           ORDER BY url, pg, para_idx) = 1) AS is_first
FROM paras
"""


# md5-prefix slice of the corpus replayed through the stream: small
# enough (~15% of 600 rows) that the drain always finishes inside the
# driver's per-query budget, and expressible identically in DuckDB
# (md5 over the url STRING — unlike xxhash64, which DuckDB lacks).
_STREAM_SLICE_CHARS = ("0", "1", "2", "3")  # batch A keys
_STREAM_RESEND_CHAR = "4"                   # batch B's fresh keys


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup VALUE-checked against batch SQL: an
    md5(url)-sliced subset of the seeded corpus is replayed as two
    micro-batches (the second re-sends batch A's first slice — the
    duplicates the stream must drop), drained with Trigger.AvailableNow
    through dropDuplicatesWithinWatermark, and the surviving
    content-hash set must equal DISTINCT payload over the subset.
    Survivor COUNTS are batch-order independent (the distinct set is
    the same whichever file the source lists first), so no mtime
    staggering is needed and the whole entry is a few seconds."""
    import shutil

    from document_extractor_spark.streaming import dedup_pages_stream

    cdir = _ensure_entry_corpus()
    first = F.substring(F.md5(F.col("url")), 1, 1)
    pages = (spark.read.parquet(f"{cdir}/pages.parquet")
             .filter(first.isin(*_STREAM_SLICE_CHARS, _STREAM_RESEND_CHAR)))
    work = f"{_ENTRY_CORPUS_DIR}_streamdedup_v2"
    in_dir, out_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"

    def _cached_ok() -> bool:
        # a timed-out prior run can leave a readable-but-partial sink;
        # survivors must cover every distinct payload before we trust it
        try:
            n = spark.read.parquet(out_dir).count()
        except Exception:
            return False
        want = pages.select("html", "text").distinct().count()
        return n == want

    if not _cached_ok():
        shutil.rmtree(work, ignore_errors=True)
        a = pages.filter(first.isin(*_STREAM_SLICE_CHARS))
        b = pages.filter(first == _STREAM_RESEND_CHAR).unionByName(
            pages.filter(first == _STREAM_SLICE_CHARS[0]))  # the RE-SEND
        a.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/a")
        b.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/b")
        stream = (spark.readStream.schema(pages.schema)
                  .option("maxFilesPerTrigger", "1").parquet(in_dir + "/*"))
        q = (dedup_pages_stream(stream)
             .writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(120):
            q.stop()  # a partial sink must not be read as the answer
            raise RuntimeError("streaming_dedup drain timed out")
    out = spark.read.parquet(out_dir)
    return out.agg(
        F.count("*").alias("survivors"),
        F.countDistinct("content_hash").alias("n_unique"))


# DuckDB's md5() over a BLOB is unavailable, so the twin counts
# DISTINCT raw payloads (BLOB DISTINCT) instead of hashes — same
# cardinality; the slice predicate is md5 over the url STRING, which
# both engines compute identically.
_ORACLE_STREAM_DEDUP = f"""
SELECT CAST(count(DISTINCT coalesce(html, encode(coalesce(text, ''))))
            AS BIGINT) AS survivors,
       CAST(count(DISTINCT coalesce(html, encode(coalesce(text, ''))))
            AS BIGINT) AS n_unique
FROM '{_ENTRY_CORPUS_DIR}/pages.parquet'
WHERE substring(md5(url), 1, 1) IN
      {tuple(_STREAM_SLICE_CHARS) + (_STREAM_RESEND_CHAR,)}
"""


def q_token_windows(spark, sf_dir):
    """LLM-pretraining sample windowing: 64-token windows, stride 48,
    final window may be shorter — zero-shuffle JVM array math."""
    from document_extractor_spark.operators.chunker import token_windows

    return token_windows(_docs(spark, sf_dir), window=64, stride=48)


_ORACLE_TOKEN_WINDOWS = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                     x -> x <> '') AS tk
  FROM documents WHERE text IS NOT NULL),
s0 AS (
  SELECT doc_id, tk,
         range(1, greatest(len(tk) - 64 + 1, 1) + 1, 48) AS fs
  FROM t),
s AS (
  -- shorter tail window when the last full window stops short
  SELECT doc_id, tk,
         CASE WHEN fs[-1] + 64 - 1 < len(tk)
              THEN list_append(fs, fs[-1] + 48) ELSE fs END AS starts
  FROM s0),
w AS (
  SELECT doc_id,
         CAST(u.i - 1 AS BIGINT) AS win_idx,
         CAST(starts[CAST(u.i AS INT)] AS BIGINT) AS start_tok,
         CAST(least(64, len(tk) - starts[CAST(u.i AS INT)] + 1) AS BIGINT)
             AS n_tokens,
         array_to_string(
             tk[CAST(starts[CAST(u.i AS INT)] AS INT):
                CAST(starts[CAST(u.i AS INT)] + 63 AS INT)], ' ')
             AS window_text
  FROM s, LATERAL unnest(range(1, len(starts) + 1)) AS u(i))
SELECT doc_id, win_idx, start_tok, n_tokens, window_text
FROM w WHERE n_tokens > 0
"""


def q_extract_error_rows(spark, sf_dir):
    """ERROR-status rows of the full pipeline: garbage HTML falls off the
    cascade with html_raw, scan-only PDFs triage to ERROR with pdf_text
    (reference common.py:216-244). Deterministic per fixture class, so the
    oracle derives the expected set from the pages table's url layout."""
    res = _run_entry_extraction(spark)
    return (
        res.extracted.filter(F.col("status") == "ERROR")
        .select("url", "method", "status")
    )


_ORACLE_ERROR_ROWS = f"""
SELECT url,
       CASE split_part(url, '/', 4)
            WHEN 'html_garbage' THEN 'html_raw'
            WHEN 'pdf_scanonly' THEN 'pdf_text' END AS method,
       'ERROR' AS status
FROM '{_ENTRY_CORPUS_DIR}/pages.parquet'
WHERE split_part(url, '/', 4) IN ('html_garbage', 'pdf_scanonly')
UNION ALL
-- legacy .doc failure variants: the generation-time quarantine reason
-- is the ground truth (truncated CFB -> doc_extract_error); the
-- non-Word-CFB deny-list rows route fmt='unsupported' and are
-- EXCLUDED from the extracted table, same as the zip deny-list class
SELECT url, 'doc_extract_error' AS method, 'ERROR' AS status
FROM '{_ENTRY_CORPUS_DIR}/expected_quarantine.parquet'
WHERE fixture_class = 'doc' AND reason = 'doc_open_failed'
UNION ALL
-- truncated scan PNGs fail decode before any OCR pass runs
SELECT url, 'none' AS method, 'ERROR' AS status
FROM '{_ENTRY_CORPUS_DIR}/expected_quarantine.parquet'
WHERE fixture_class = 'img_scan' AND reason = 'img_parse_failed'
UNION ALL
-- unreadable scanned PDFs fall off the end of the OCR cascade
SELECT url, 'ocr_b' AS method, 'ERROR' AS status
FROM '{_ENTRY_CORPUS_DIR}/expected_quarantine.parquet'
WHERE fixture_class = 'pdf_scanned' AND reason = 'pdf_below_cutoff'
"""


def q_office_salvage(spark, sf_dir):
    """E10 second-chance rows (reference pass_doc.py:105-186): office
    docs whose native text scored below cutoff, re-extracted leniently
    and accepted at cutoff=0.0 — method doc_salvage_text (the engine's
    doc_pdf_text analog), used_fallback=True.  Checked byte-identical
    against the generator's non-circular golden table."""
    res = _run_entry_extraction(spark)
    return (
        res.extracted.filter(F.col("method") == "doc_salvage_text")
        .select("url", "method", "status", "used_fallback",
                "reliability", "text")
    )


_ORACLE_OFFICE_SALVAGE = f"""
SELECT url, method, status, used_fallback, reliability,
       extracted_text AS text
FROM '{_ENTRY_CORPUS_DIR}/expected.parquet'
WHERE method = 'doc_salvage_text'
"""


def q_c4_filters(spark, sf_dir):
    """The published C4 cleaning heuristics (Raffel et al. 2020 §2.2)
    as one codegen projection: terminal-punctuation + >=5-word +
    no-'javascript' line rules, lorem-ipsum / curly-brace /
    <3-sentence page rules, first-failing-rule reason.  The corpus
    text lacks the hazards, so deterministic hazard lines are appended
    from doc_id (same expression in the oracle) — every rule fires on
    real matches."""
    from document_extractor_spark.functions.c4 import c4_clean

    d = _docs(spark, sf_dir).select("doc_id", "text")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\nEnable javascript to view this page."))
        .when(F.col("doc_id") % 4 == 1, F.lit("\nlorem ipsum dolor."))
        .when(F.col("doc_id") % 4 == 2, F.lit("\nshort line"))
        .otherwise(F.lit(
            "\nA full proper sentence with enough words here.")))
    synth = d.withColumn(
        "text", F.concat(F.coalesce(F.col("text"), F.lit("")), suffix))
    return c4_clean(synth)


_ORACLE_C4 = """
WITH s AS (
  SELECT doc_id,
         coalesce(text, '') || CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN chr(10) || 'Enable javascript to view this page.'
           WHEN 1 THEN chr(10) || 'lorem ipsum dolor.'
           WHEN 2 THEN chr(10) || 'short line'
           ELSE chr(10) || 'A full proper sentence with enough words here.'
         END AS t
  FROM documents),
l AS (
  SELECT doc_id, t,
         list_filter(list_transform(string_split(t, chr(10)),
             x -> regexp_replace(regexp_replace(x,
                      '^[ \\t\\n\\x0B\\f\\r]+', ''),
                      '[ \\t\\n\\x0B\\f\\r]+\\z', '')),
             x -> x <> '') AS lines
  FROM s),
k AS (
  SELECT doc_id, t,
         list_filter(lines, x ->
             right(x, 1) IN ('.', '!', '?', '"')
             AND len(list_filter(string_split_regex(x,
                     '[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')) >= 5
             AND NOT contains(lower(x), 'javascript')) AS kept,
         CAST(len(string_split_regex(t, '[.!?"]')) - 1 AS BIGINT)
             AS n_sentences
  FROM l),
r AS (
  SELECT doc_id,
         -- DuckDB array_to_string returns NULL for an empty list;
         -- Spark array_join returns '' — coalesce to match
         coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
         CAST(len(kept) AS BIGINT) AS n_lines_kept,
         n_sentences,
         CASE WHEN contains(lower(t), 'lorem ipsum') THEN 'lorem_ipsum'
              WHEN contains(t, '{') THEN 'curly_brace'
              WHEN n_sentences < 3 THEN 'too_few_sentences'
              WHEN len(kept) = 0 THEN 'no_surviving_lines'
         END AS drop_reason
  FROM k)
SELECT doc_id, kept_text, n_lines_kept, n_sentences,
       drop_reason IS NULL AS keep, drop_reason
FROM r
"""


def q_eval_holdout(spark, sf_dir):
    """Fixed-size eval holdout: exactly min(k, n) docs per language,
    deterministic md5 ranking (no rand()/sampleBy seed drift) — the
    fixed-cardinality companion to the rate-based samplers. One
    window shuffle."""
    from document_extractor_spark.functions.sampling import (
        exact_stratum_holdout)

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return exact_stratum_holdout(d, "doc_id", "lang", k=20)


_ORACLE_EVAL_HOLDOUT = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
  FROM documents) t
WHERE r <= 20
"""


def q_unicode_nfc(spark, sf_dir):
    """Unicode NFC canonicalization (the C4/CCNet text-normalization
    slot) as an Arrow-batched kernel; the corpus is ASCII-heavy, so
    combining sequences are appended deterministically from doc_id to
    exercise real composition (same expression in the oracle).
    Python unicodedata and DuckDB utf8proc agree byte-for-byte on NFC
    (normalization stability policy; hazard cases pinned in
    tests/test_textnorm.py)."""
    from document_extractor_spark.functions.textnorm import (
        nfc_normalize_col)

    d = _docs(spark, sf_dir).select("doc_id", "text")
    synth = d.withColumn(
        "_synth",
        F.concat(F.col("text"),
                 F.repeat(F.lit("e\u0301"),  # decomposed e + combining acute
                          (F.col("doc_id") % 3).cast("int"))))
    withn = synth.withColumn("text_nfc", nfc_normalize_col(F.col("_synth")))
    return withn.select(
        "doc_id", "text_nfc",
        F.length("text_nfc").cast("long").alias("nfc_len"),
        (F.col("text_nfc") != F.col("_synth")).alias("changed"))


_ORACLE_UNICODE_NFC = """
WITH s AS (
  SELECT doc_id,
         text || repeat('e' || chr(769), CAST(doc_id % 3 AS INT))
             AS synth
  FROM documents)
SELECT doc_id, nfc_normalize(synth) AS text_nfc,
       CAST(length(nfc_normalize(synth)) AS BIGINT) AS nfc_len,
       nfc_normalize(synth) <> synth AS changed
FROM s
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub (C4/RefinedWeb-style pre-training pass): e-mail / IPv4
    / phone redaction with typed tokens plus per-doc removal counts.
    The synthetic corpus carries no PII, so deterministic PII is
    appended from doc_id (same expression in the oracle) — the regexes
    are exercised on real matches, not on an all-zero corpus. Pure
    Column: one projection, zero shuffles, zero Python stages."""
    from document_extractor_spark.functions.pii import (
        pii_counts, pii_redact)

    d = _docs(spark, sf_dir)
    synth = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(
            F.lit(" Contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.concat(
            F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 254 + 1).cast("string"))).otherwise(
                F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.concat(
            F.lit(" call +1 (555) 123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4,
                   "0"))).otherwise(F.lit("")),
    )
    c = pii_counts(F.col("t"))
    return (
        d.select("doc_id", synth.alias("t"))
        .select(
            "doc_id",
            c["n_emails"].cast("long").alias("n_emails"),
            c["n_ips"].cast("long").alias("n_ips"),
            c["n_phones"].cast("long").alias("n_phones"),
            pii_redact(F.col("t")).alias("redacted"))
    )


from document_extractor_spark.functions import pii as _PII  # noqa: E402

_ORACLE_PII = f"""
WITH synth AS (
  SELECT doc_id,
    text
    || (CASE WHEN doc_id % 3 = 0 THEN ' Contact user'
         || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN ' from 10.'
         || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         || CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 123-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END)
    AS t
  FROM documents),
staged AS (
  SELECT doc_id, t,
    regexp_replace(t, '{_PII.EMAIL_PATTERN}', '<EMAIL>', 'g') AS t1
  FROM synth),
staged2 AS (
  SELECT doc_id, t, t1,
    regexp_replace(t1, '{_PII.IPV4_PATTERN}', '<IP>', 'g') AS t2
  FROM staged)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{_PII.EMAIL_PATTERN}')) AS BIGINT)
      AS n_emails,
  CAST(len(regexp_extract_all(t1, '{_PII.IPV4_PATTERN}')) AS BIGINT)
      AS n_ips,
  CAST(len(regexp_extract_all(t2, '{_PII.PHONE_PATTERN}')) AS BIGINT)
      AS n_phones,
  regexp_replace(t2, '{_PII.PHONE_PATTERN}', '<PHONE>', 'g') AS redacted
FROM staged2
"""


def q_line_boilerplate_strip(spark, sf_dir):
    """CCNet-style corpus-frequency line removal: lines whose trimmed
    form appears in >= 4 distinct docs (nav bars, footers) are struck
    from every document. The flat corpus has no newlines, so
    multi-line docs are synthesized deterministically (same expression
    in the oracle): shared chrome lines on doc_id strides + body
    slices. Differs from paragraph_dedup (keep-first): boilerplate
    survives NOWHERE."""
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    synth = F.concat(
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("Home | About | Subscribe\n")).otherwise(F.lit("")),
        F.substring(F.col("text"), 1, 80), F.lit("\n"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("Copyright 2026 Example Corp. All rights "
                     "reserved.\n")).otherwise(F.lit("")),
        F.substring(F.col("text"), 81, 80),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("\nFollow us on social media")).otherwise(F.lit("")),
    )
    return DD.strip_boilerplate_lines(
        d.select("doc_id", synth.alias("text")), min_doc_count=4)


_ORACLE_LINE_STRIP = """
WITH synth AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0
          THEN 'Home | About | Subscribe' || chr(10) ELSE '' END)
    || substr(text, 1, 80) || chr(10)
    || (CASE WHEN doc_id % 3 = 0
          THEN 'Copyright 2026 Example Corp. All rights reserved.'
               || chr(10) ELSE '' END)
    || substr(text, 81, 80)
    || (CASE WHEN doc_id % 7 = 0
          THEN chr(10) || 'Follow us on social media' ELSE '' END) AS t
  FROM documents WHERE text IS NOT NULL),
lines AS (
  SELECT doc_id, CAST(i.n - 1 AS BIGINT) AS pos,
         string_split(t, chr(10))[CAST(i.n AS INT)] AS line
  FROM synth, LATERAL unnest(
      range(1, len(string_split(t, chr(10))) + 1)) AS i(n)),
nz AS (
  SELECT doc_id, pos, line, trim(line) AS nl
  FROM lines WHERE trim(line) <> ''),
hot AS (
  SELECT nl FROM (
    SELECT nl, count(DISTINCT doc_id) AS df FROM nz GROUP BY nl)
  WHERE df >= 4),
kept AS (
  SELECT doc_id, pos, line FROM nz
  WHERE nl NOT IN (SELECT nl FROM hot)),
tot AS (SELECT doc_id, count(*) AS n_lines FROM nz GROUP BY doc_id),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT t.doc_id, coalesce(reb.cleaned, '') AS cleaned,
       CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_lines - coalesce(reb.n_kept, 0) AS BIGINT) AS n_dropped
FROM tot t LEFT JOIN reb ON t.doc_id = reb.doc_id
"""


def q_gopher_quality(spark, sf_dir):
    """The published Gopher document-quality rule set (Rae et al.
    2021, A.1.1) per doc: word-count bounds, mean word length,
    symbol/bullet/ellipsis ratios, alpha-word ratio, required
    stopwords. Deterministic structure is appended on doc_id strides
    so every rule actually fires on the synthetic corpus (same
    expression in the oracle). Pure Column, one projection."""
    d = _docs(spark, sf_dir)
    synth = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit(" ######## ... ... ...")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 6 == 0,
               F.lit("\n- bullet one\n- bullet two\n- bullet three"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("\nto be with the of and that have"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 9 == 0,
               F.lit("\nmore results coming soon...")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit(" 123 456 789 000 111")).otherwise(F.lit("")),
    )
    g = TS.gopher_quality(F.col("t"))
    return (
        d.select("doc_id", synth.alias("t"))
        .select("doc_id", g.alias("g"))
        .select("doc_id", "g.n_words", "g.mean_word_len",
                "g.symbol_ratio", "g.bullet_ratio", "g.ellipsis_ratio",
                "g.alpha_ratio", "g.stop_hits", "g.passes")
    )


_GOPHER_WS = r"[ \t\n\x0B\f\r]"
_ORACLE_GOPHER = f"""
WITH synth AS (
  SELECT doc_id,
    coalesce(text, '')
    || (CASE WHEN doc_id % 5 = 0 THEN ' ######## ... ... ...'
        ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN chr(10) || '- bullet one'
        || chr(10) || '- bullet two' || chr(10) || '- bullet three'
        ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN chr(10)
        || 'to be with the of and that have' ELSE '' END)
    || (CASE WHEN doc_id % 9 = 0 THEN chr(10)
        || 'more results coming soon...' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN ' 123 456 789 000 111'
        ELSE '' END) AS t
  FROM documents),
sig AS (
  SELECT doc_id, t,
    list_filter(string_split_regex(t, '{_GOPHER_WS}+'),
                x -> x <> '') AS words,
    list_filter(string_split(t, chr(10)),
                x -> trim(x) <> '') AS lns,
    CAST(length(regexp_replace(t, '{_GOPHER_WS}', '', 'g')) AS DOUBLE)
        AS total_chars,
    CAST(length(t) - length(replace(t, '#', ''))
         + len(regexp_extract_all(t, '\\.\\.\\.|…')) AS DOUBLE)
        AS n_sym
  FROM synth),
m AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CASE WHEN len(words) > 0
         THEN total_chars / len(words) ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(words) > 0
         THEN n_sym / len(words) ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(lns) > 0 THEN
      CAST(len(list_filter(lns,
           x -> regexp_matches(ltrim(x), '^[-*•‣]'))) AS DOUBLE)
      / len(lns) ELSE 0.0 END AS bullet_ratio,
    CASE WHEN len(lns) > 0 THEN
      CAST(len(list_filter(lns,
           x -> regexp_matches(rtrim(x), '(\\.\\.\\.|…)\\r*\\z'))) AS DOUBLE)
      / len(lns) ELSE 0.0 END AS ellipsis_ratio,
    CASE WHEN len(words) > 0 THEN
      CAST(len(list_filter(words,
           x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
      / len(words) ELSE 0.0 END AS alpha_ratio,
    CAST({" + ".join(
        f"CAST(list_contains(list_transform(words, x -> lower(x)),"
        f" '{sw}') AS INT)"
        for sw in TS.GOPHER_STOPWORDS
    )} AS BIGINT) AS stop_hits
  FROM sig)
SELECT doc_id, n_words,
  round(mean_word_len, 6) AS mean_word_len,
  round(symbol_ratio, 6) AS symbol_ratio,
  round(bullet_ratio, 6) AS bullet_ratio,
  round(ellipsis_ratio, 6) AS ellipsis_ratio,
  round(alpha_ratio, 6) AS alpha_ratio,
  stop_hits,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_ratio < 0.1
   AND bullet_ratio < 0.9
   AND ellipsis_ratio < 0.3
   AND alpha_ratio >= 0.8
   AND stop_hits >= 2) AS passes
FROM m
"""


_SAMPLE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125}


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum downsampling (corpus rebalancing):
    md5-threshold sampling keyed on doc_id with per-source rates — a
    pure codegen filter, zero shuffles for the sample itself; the
    verification aggregates kept counts per source (1 shuffle).
    Engine-portable by construction, which is exactly what the DuckDB
    oracle demonstrates."""
    from document_extractor_spark.functions.sampling import (
        stratified_hash_sample)

    d = _docs(spark, sf_dir)
    kept = stratified_hash_sample(
        d, key_col="doc_id", strata_col="source",
        rates=_SAMPLE_RATES, default_rate=0.75)
    return (
        kept.groupBy("source")
        .agg(F.count("*").alias("n_kept"),
             F.min("doc_id").alias("first_kept"),
             F.max("doc_id").alias("last_kept"))
    )


def _sample_case_sql() -> str:
    from document_extractor_spark.functions.sampling import hash_threshold
    arms = "".join(
        f" WHEN '{v}' THEN '{hash_threshold(r)}'"
        for v, r in sorted(_SAMPLE_RATES.items()))
    return (f"CASE source{arms} ELSE '{hash_threshold(0.75)}' END")


_ORACLE_STRATIFIED = f"""
SELECT source, count(*) AS n_kept,
       min(doc_id) AS first_kept, max(doc_id) AS last_kept
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {_sample_case_sql()}
GROUP BY source
"""


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup cluster formation: min-label connected
    components over a deterministic edge graph (chains + long-range
    fusing edges synthesized on doc_id — same expression in the
    oracle's recursive CTE), then keeper = smallest id per cluster.
    This is the decision layer on top of the pair generators: A~B,
    B~C => one cluster, one survivor. Converges to a unique fixpoint
    regardless of iteration order, so it is exactly checkable."""
    from document_extractor_spark.operators.components import (
        dedup_decision)

    d = _docs(spark, sf_dir)
    chain = d.filter((F.col("doc_id") % 10).isin(0, 1, 2)).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"))
    fuse = d.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 17).alias("id_b"))
    pairs = chain.unionByName(fuse)
    return dedup_decision(d, pairs).withColumn(
        "component", F.col("component").cast("long"))


_ORACLE_CLUSTERS = """
WITH RECURSIVE
e0 AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
  WHERE doc_id % 10 IN (0, 1, 2)
  UNION ALL
  SELECT doc_id AS a, doc_id + 17 AS b FROM documents
  WHERE doc_id % 23 = 0),
e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
reach(src, dst) AS (
  SELECT a, a FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src)
SELECT d.doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       (coalesce(c.component, d.doc_id) = d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def q_gopher_repetition(spark, sf_dir):
    """The Gopher repetition block (dup-line fractions + top-n-gram
    char mass, Rae et al. A.1.1): distributed explode/groupBy signals
    keyed on (doc, line) / (doc, n, gram) — uniformly sharded no
    matter how repetitious one document is. Repeated lines are
    synthesized on doc_id strides (corpus has no newlines)."""
    from document_extractor_spark.operators.repetition import (
        gopher_repetition_flags)

    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    synth = F.concat(
        F.substring(F.col("text"), 1, 60),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\nsubscribe now\nsubscribe now\nsubscribe now"))
        .otherwise(F.lit("")),
        F.lit("\n"), F.substring(F.col("text"), 61, 60),
        F.when(F.col("doc_id") % 6 == 0,
               # hot bigram block: "buy now" x 8
               F.concat(F.lit("\n"),
                        F.repeat(F.lit("buy now "), 8))).otherwise(
            F.lit("")),
    )
    return gopher_repetition_flags(
        d.select("doc_id", synth.alias("text")))


_ORACLE_REP_GOPHER = f"""
WITH synth AS (
  SELECT doc_id,
    substr(text, 1, 60)
    || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'subscribe now'
        || chr(10) || 'subscribe now' || chr(10) || 'subscribe now'
        ELSE '' END)
    || chr(10) || substr(text, 61, 60)
    || (CASE WHEN doc_id % 6 = 0
        THEN chr(10) || repeat('buy now ', 8) ELSE '' END) AS t
  FROM documents WHERE text IS NOT NULL),
base AS (
  SELECT doc_id, t,
    CAST(length(regexp_replace(t, '{_GOPHER_WS}', '', 'g')) AS DOUBLE)
        AS total_chars,
    list_filter(list_transform(string_split(t, chr(10)),
                               x -> trim(x)), x -> x <> '') AS lns,
    list_filter(string_split_regex(t, '{_GOPHER_WS}+'),
                x -> x <> '') AS words
  FROM synth),
line_occ AS (
  SELECT doc_id, u.line AS line, count(*) AS cnt,
         length(u.line) AS ln
  FROM base, LATERAL unnest(lns) AS u(line)
  GROUP BY doc_id, u.line),
line_stats AS (
  SELECT doc_id,
    sum(cnt) AS n_lines, sum(cnt - 1) AS dup_occ,
    sum(cnt * ln) AS line_chars, sum((cnt - 1) * ln) AS dup_chars
  FROM line_occ GROUP BY doc_id),
gram_rows AS (
  SELECT doc_id, n.n AS n,
         array_to_string(words[CAST(i.i AS INT):CAST(i.i + n.n - 1 AS INT)],
                         ' ') AS gram
  FROM base,
       LATERAL unnest([2, 3, 4]) AS n(n),
       LATERAL unnest(range(1, len(words) - n.n + 2)) AS i(i)
  WHERE len(words) >= n.n),
gram_mass AS (
  SELECT doc_id, n, gram, count(*) AS cnt,
    CASE WHEN count(*) >= 2
         THEN count(*) * length(replace(gram, ' ', '')) ELSE 0 END
        AS mass
  FROM gram_rows GROUP BY doc_id, n, gram),
gram_stats AS (
  SELECT doc_id,
    max(CASE WHEN n = 2 THEN mass END) AS m2,
    max(CASE WHEN n = 3 THEN mass END) AS m3,
    max(CASE WHEN n = 4 THEN mass END) AS m4
  FROM gram_mass GROUP BY doc_id),
m AS (
  SELECT b.doc_id,
    CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
    round(CASE WHEN coalesce(ls.n_lines, 0) > 0
          THEN ls.dup_occ / CAST(ls.n_lines AS DOUBLE)
          ELSE 0.0 END, 6) AS dup_line_frac,
    round(CASE WHEN coalesce(ls.line_chars, 0) > 0
          THEN ls.dup_chars / CAST(ls.line_chars AS DOUBLE)
          ELSE 0.0 END, 6) AS dup_line_char_frac,
    round(CASE WHEN b.total_chars > 0
          THEN coalesce(gs.m2, 0) / b.total_chars
          ELSE 0.0 END, 6) AS top2_char_frac,
    round(CASE WHEN b.total_chars > 0
          THEN coalesce(gs.m3, 0) / b.total_chars
          ELSE 0.0 END, 6) AS top3_char_frac,
    round(CASE WHEN b.total_chars > 0
          THEN coalesce(gs.m4, 0) / b.total_chars
          ELSE 0.0 END, 6) AS top4_char_frac
  FROM base b
  LEFT JOIN line_stats ls ON b.doc_id = ls.doc_id
  LEFT JOIN gram_stats gs ON b.doc_id = gs.doc_id)
SELECT *,
  (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
   AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
   AND top4_char_frac <= 0.16) AS passes
FROM m
"""


def q_neardup_dedup_pipeline(spark, sf_dir):
    """The composed dedup pipeline end to end: shingle-Jaccard pair
    generation (df-capped) at threshold 0.5 -> transitive closure ->
    keeper decision for EVERY document. This is what the individual
    operators exist for: content-similar docs collapse to one
    survivor, everything else keeps itself. Real corpus text (no
    synthesis) — the synthetic corpus contains genuine near-dups."""
    from document_extractor_spark.operators.components import (
        dedup_decision)

    docs = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=500)
    return dedup_decision(docs, pairs).withColumn(
        "component", F.col("component").cast("long"))


# the pair CTEs are the checked ngram_jaccard oracle at a higher
# threshold; closure + keeper decision layered on top
_ORACLE_NEARDUP_PIPELINE = """
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substring(md5(unnest(
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              for i in range(1, len(t) - 1)])), 1, 15)) AS BIGINT)
         AS shingle
  FROM toks WHERE len(t) >= 3),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0
                    GROUP BY shingle HAVING count(*) <= 500)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE), 6) >= 0.5),
e AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs),
reach(src, dst) AS (
  SELECT a, a FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src)
SELECT d.doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       (coalesce(c.component, d.doc_id) = d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def q_minhash_dedup_pipeline(spark, sf_dir):
    """The MinHash-LSH dedup decision end to end: band buckets ->
    candidate pairs -> exact token-Jaccard verification -> transitive
    closure -> keeper for EVERY document.  At 10^12 docs this is the
    CHEAPER candidate generator than shingle posting lists (k min-aggs
    + bucket groupBy vs a full shingle explode), so the composed
    decision deserves its own value-checked query rather than leaving
    `minhash_band_buckets` a dead end (VERDICT r3 #6)."""
    from document_extractor_spark.operators.components import (
        dedup_decision)

    docs = _docs(spark, sf_dir)
    pairs = DD.minhash_verified_pairs(
        docs, k=8, bands=4, threshold=0.5, max_bucket_df=1000)
    return dedup_decision(docs, pairs).withColumn(
        "component", F.col("component").cast("long"))


def q_incremental_minhash(spark, sf_dir):
    """Per-batch near-dup decision against the historical corpus
    (the MinHash analog of incremental_dedup's exact anti-join):
    odd-id docs are 'this crawl', even-id docs the seen corpus;
    candidates only cross the boundary, verified with exact token
    Jaccard, dup_of = smallest matching seen id."""
    d = _docs(spark, sf_dir)
    new = d.filter(F.col("doc_id") % 2 == 1)
    seen = d.filter(F.col("doc_id") % 2 == 0)
    return DD.minhash_incremental_decision(
        new, seen, k=8, bands=4, threshold=0.5, max_bucket_df=1000)


_ORACLE_INCR_MINHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            t -> t <> '')) AS tok
  FROM documents),
sigs AS (SELECT doc_id, {mins} FROM toks GROUP BY doc_id),
bands AS (
  {bands_union}),
nb AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
sb AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
bcnt AS (SELECT band, band_sig, count(*) AS n FROM sb GROUP BY 1, 2),
sbok AS (SELECT sb.* FROM sb JOIN bcnt USING (band, band_sig)
         WHERE bcnt.n <= 1000),
cand AS (SELECT DISTINCT n.doc_id AS id_new, s.doc_id AS id_seen
         FROM nb n JOIN sbok s USING (band, band_sig)),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1),
inter AS (SELECT c.id_new, c.id_seen, count(*) AS i
          FROM cand c
          JOIN toks ta ON ta.doc_id = c.id_new
          JOIN toks tb ON tb.doc_id = c.id_seen AND tb.tok = ta.tok
          GROUP BY 1, 2),
dups AS (SELECT id_new, min(id_seen) AS dup_of FROM inter
         JOIN sizes sa ON sa.doc_id = id_new
         JOIN sizes sb2 ON sb2.doc_id = id_seen
         WHERE round(i / CAST(sa.n_tok + sb2.n_tok - i AS DOUBLE), 6)
               >= 0.5
         GROUP BY 1)
SELECT d.doc_id, dup_of, dup_of IS NULL AS is_unique
FROM documents d LEFT JOIN dups ON dups.id_new = d.doc_id
WHERE d.doc_id % 2 = 1
""".format(
    mins=", ".join(
        f"min({_sql_seed_hash('tok', s)}) AS mh_{s}" for s in range(8)),
    bands_union="\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(CAST(mh_{2*b} AS VARCHAR) || ',' || "
        f"CAST(mh_{2*b+1} AS VARCHAR)) AS band_sig FROM sigs"
        for b in range(4)),
)


# signatures/banding CTEs are the checked minhash_lsh_buckets oracle;
# candidate expansion + exact-Jaccard verify + closure layered on top
_ORACLE_MINHASH_PIPELINE = """
WITH RECURSIVE toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                            t -> t <> '')) AS tok
  FROM documents),
sigs AS (SELECT doc_id, {mins} FROM toks GROUP BY doc_id),
bands AS (
  {bands_union}),
bcnt AS (SELECT band, band_sig, count(*) AS n FROM bands GROUP BY 1, 2),
bok AS (SELECT b.doc_id, b.band, b.band_sig
        FROM bands b JOIN bcnt USING (band, band_sig)
        WHERE bcnt.n BETWEEN 2 AND 1000),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bok a JOIN bok b
           ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1),
inter AS (SELECT c.id_a, c.id_b, count(*) AS i
          FROM cand c
          JOIN toks ta ON ta.doc_id = c.id_a
          JOIN toks tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
          GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b FROM inter
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE round(i / CAST(sa.n_tok + sb.n_tok - i AS DOUBLE), 6)
                >= 0.5),
e AS (SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b AS a, id_a AS b FROM pairs),
reach(src, dst) AS (
  SELECT a, a FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src)
SELECT d.doc_id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       (coalesce(c.component, d.doc_id) = d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
""".format(
    mins=", ".join(
        f"min({_sql_seed_hash('tok', s)}) AS mh_{s}" for s in range(8)),
    bands_union="\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(CAST(mh_{2*b} AS VARCHAR) || ',' || "
        f"CAST(mh_{2*b+1} AS VARCHAR)) AS band_sig FROM sigs"
        for b in range(4)),
)


def q_tfidf_topk(spark, sf_dir):
    """Per-doc top-5 TF-IDF terms (smoothed RATIO idf — rational
    arithmetic, not libm ln(), so scores are exact IEEE doubles in
    both engines; ranking identical). Ties break by term asc."""
    from document_extractor_spark.operators.keywords import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=5)


_ORACLE_TFIDF = """
WITH n AS (SELECT count(*) AS n_docs FROM documents),
terms AS (
  SELECT doc_id, u.term AS term
  FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(text),
                      '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '') AS ts
        FROM documents),
       LATERAL unnest(ts) AS u(term)),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df
       FROM terms GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * ((n.n_docs + 1.0) / (df.df + 1))
             AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       round(score, 6) AS score
FROM ranked WHERE rank <= 5
"""


def q_script_profile(spark, sf_dir):
    """Unicode script profiling (multilingual crawl signal):
    per-script letter counts + dominant script + its share, pure
    codepoint-range regex classes (Java∩RE2 verified). Non-Latin
    snippets are appended on doc_id strides so every class fires."""
    d = _docs(spark, sf_dir)
    synth = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(" Привет мир")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" 你好世界 こんにちは 안녕")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit(" مرحبا بالعالم")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" Γειά σου")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit(" नमस्ते दुनिया")).otherwise(F.lit("")),
    )
    s = TS.script_profile(F.col("t"))
    return (
        d.select("doc_id", synth.alias("t"))
        .select("doc_id", s.alias("s"))
        .select("doc_id", "s.*")
    )


def _script_oracle_sql() -> str:
    counts = ",\n    ".join(
        f"CAST(len(regexp_extract_all(t, '{cls}')) AS BIGINT)"
        f" AS n_{name}"
        for name, cls in TS.SCRIPT_CLASSES)
    names = [name for name, _ in TS.SCRIPT_CLASSES]
    total = " + ".join(f"n_{n}" for n in names)
    mx = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    arms = "\n         ".join(
        f"WHEN n_{n} = {mx} THEN '{n}'" for n in names)
    return f"""
WITH synth AS (
  SELECT doc_id,
    coalesce(text, '')
    || (CASE WHEN doc_id % 3 = 0 THEN ' Привет мир' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN ' 你好世界 こんにちは 안녕'
        ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN ' مرحبا بالعالم' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ' Γειά σου' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN ' नमस्ते दुनिया' ELSE '' END) AS t
  FROM documents),
c AS (
  SELECT doc_id,
    {counts}
  FROM synth)
SELECT doc_id, {', '.join('n_' + n for n in names)},
  CAST({total} AS BIGINT) AS n_letters,
  CASE WHEN {mx} > 0 THEN
    CASE {arms} ELSE 'unknown' END
  ELSE 'unknown' END AS dominant,
  CASE WHEN {total} > 0
       THEN round({mx} / CAST({total} AS DOUBLE), 6)
       ELSE 0.0 END AS dominant_share
FROM c
"""


def q_training_corpus_build(spark, sf_dir):
    """The capstone composition — the decision a corpus build
    actually ships, per document: near-dup cluster keeper (jaccard
    0.5 closure) -> Gopher quality gate (webtext profile: word
    bounds, mean word length, alpha ratio, >=1 required stopword;
    the line rules are vacuous on the flat corpus) -> repetition
    gate (top n-gram char mass) -> deterministic per-source
    downsampling. Output: (doc_id, keep, reason) with reason the
    FIRST failing gate in that order (duplicate | quality |
    repetition | sampled_out | NULL=kept). Every constituent is an
    independently oracle-verified operator; this query pins their
    composition."""
    from document_extractor_spark.functions.sampling import (
        hash_bucket, hash_threshold)
    from document_extractor_spark.operators.components import (
        dedup_decision)
    from document_extractor_spark.operators.repetition import (
        repetition_signals)

    docs = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=500)
    dd = dedup_decision(docs, pairs).select(
        "doc_id", "is_keeper")
    rep = repetition_signals(docs).select(
        "doc_id",
        ((F.col("top2_char_frac") <= 0.20)
         & (F.col("top3_char_frac") <= 0.18)
         & (F.col("top4_char_frac") <= 0.16)
         & (F.col("dup_line_frac") <= 0.30)).alias("rep_ok"))
    g = TS.gopher_quality(F.col("text"))
    base = docs.select(
        "doc_id", "source",
        ((g["n_words"] >= 50) & (g["n_words"] <= 100000)
         & (g["mean_word_len"] >= 3.0) & (g["mean_word_len"] <= 10.0)
         & (g["alpha_ratio"] >= 0.8)
         & (g["stop_hits"] >= 1)).alias("q_ok"),
    )
    thr = F.lit(hash_threshold(0.75))
    for src, rate in sorted(_SAMPLE_RATES.items()):
        thr = F.when(F.col("source") == src,
                     F.lit(hash_threshold(rate))).otherwise(thr)
    joined = (
        base.join(dd, "doc_id").join(rep, "doc_id", "left")
        .withColumn("samp_ok", hash_bucket(F.col("doc_id")) < thr)
    )
    reason = (
        F.when(~F.col("is_keeper"), F.lit("duplicate"))
        .when(~F.coalesce(F.col("q_ok"), F.lit(False)),
              F.lit("quality"))
        .when(~F.coalesce(F.col("rep_ok"), F.lit(True)),
              F.lit("repetition"))
        .when(~F.col("samp_ok"), F.lit("sampled_out"))
        .otherwise(F.lit(None).cast("string"))
    )
    return joined.select(
        "doc_id", reason.alias("reason"),
        reason.isNull().alias("keep"))


def _corpus_build_oracle() -> str:
    from document_extractor_spark.functions.sampling import (
        hash_threshold)
    arms = "".join(
        f" WHEN '{v}' THEN '{hash_threshold(r)}'"
        for v, r in sorted(_SAMPLE_RATES.items()))
    sample_case = f"CASE source{arms} ELSE '{hash_threshold(0.75)}' END"
    sw_sum = " + ".join(
        f"CAST(list_contains(lw, '{sw}') AS INT)"
        for sw in TS.GOPHER_STOPWORDS)
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substring(md5(unnest(
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              for i in range(1, len(t) - 1)])), 1, 15)) AS BIGINT)
         AS shingle
  FROM toks WHERE len(t) >= 3),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0
                    GROUP BY shingle HAVING count(*) <= 500)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
prs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(i / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE), 6) >= 0.5),
e AS (SELECT id_a AS a, id_b AS b FROM prs
      UNION SELECT id_b AS a, id_a AS b FROM prs),
reach(src, dst) AS (
  SELECT a, a FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src),
-- quality gate over RAW text (no synthesis in the capstone)
q AS (
  SELECT doc_id,
    (n_words >= 50 AND n_words <= 100000
     AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
     AND alpha_ratio >= 0.8 AND stop_hits >= 1) AS q_ok
  FROM (
    -- round(x, 6) everywhere a gate compares a ratio: the Spark side
    -- reads the gopher struct's 6-dp-rounded fields, so a boundary
    -- value must round identically before the comparison
    SELECT doc_id,
      CAST(len(words) AS BIGINT) AS n_words,
      round(CASE WHEN len(words) > 0 THEN total_chars / len(words)
           ELSE 0.0 END, 6) AS mean_word_len,
      round(CASE WHEN len(words) > 0 THEN
        CAST(len(list_filter(words,
             x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        / len(words) ELSE 0.0 END, 6) AS alpha_ratio,
      CAST({sw_sum} AS BIGINT) AS stop_hits
    FROM (
      SELECT doc_id,
        list_filter(string_split_regex(coalesce(text, ''),
                    '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS words,
        list_transform(list_filter(string_split_regex(
                    coalesce(text, ''), '[ \\t\\n\\x0B\\f\\r]+'),
                    x -> x <> ''), x -> lower(x)) AS lw,
        CAST(length(regexp_replace(coalesce(text, ''),
             '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE) AS total_chars
      FROM documents))),
-- repetition gate over RAW text: top n-gram char mass (line rules
-- vacuous on the flat corpus but computed identically: 1 line/doc
-- is never a duplicate)
-- grams over RAW-CASE words: repetition_signals does not lowercase
-- (toks above is lowered for shingling parity only — reusing it here
-- would hide mixed-case repetition the engine counts as distinct)
rawtoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''),
                     '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS t
  FROM documents),
gram_rows AS (
  SELECT doc_id, n.n AS n,
         array_to_string(t[CAST(i.i AS INT):CAST(i.i + n.n - 1 AS INT)],
                         ' ') AS gram
  FROM rawtoks,
       LATERAL unnest([2, 3, 4]) AS n(n),
       LATERAL unnest(range(1, len(t) - n.n + 2)) AS i(i)
  WHERE len(t) >= n.n),
gm AS (
  SELECT doc_id, n,
    max(CASE WHEN cnt >= 2
        THEN cnt * length(replace(gram, ' ', '')) ELSE 0 END) AS mass
  FROM (SELECT doc_id, n, gram, count(*) AS cnt
        FROM gram_rows GROUP BY doc_id, n, gram)
  GROUP BY doc_id, n),
rep AS (
  SELECT d.doc_id,
    (round(coalesce(max(CASE WHEN gm.n = 2 THEN gm.mass END), 0)
       / greatest(tc.total_chars, 1.0), 6) <= 0.20
     AND round(coalesce(max(CASE WHEN gm.n = 3 THEN gm.mass END), 0)
       / greatest(tc.total_chars, 1.0), 6) <= 0.18
     AND round(coalesce(max(CASE WHEN gm.n = 4 THEN gm.mass END), 0)
       / greatest(tc.total_chars, 1.0), 6) <= 0.16) AS rep_ok
  FROM documents d
  JOIN (SELECT doc_id,
          CAST(length(regexp_replace(coalesce(text, ''),
               '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
              AS total_chars
        FROM documents) tc ON d.doc_id = tc.doc_id
  LEFT JOIN gm ON gm.doc_id = d.doc_id
  GROUP BY d.doc_id, tc.total_chars)
SELECT d.doc_id,
  CASE
    WHEN coalesce(c.component, d.doc_id) <> d.doc_id THEN 'duplicate'
    WHEN NOT coalesce(q.q_ok, FALSE) THEN 'quality'
    WHEN NOT coalesce(rep.rep_ok, TRUE) THEN 'repetition'
    WHEN NOT (substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
              < {sample_case}) THEN 'sampled_out'
    ELSE NULL END AS reason,
  (CASE
    WHEN coalesce(c.component, d.doc_id) <> d.doc_id THEN 'duplicate'
    WHEN NOT coalesce(q.q_ok, FALSE) THEN 'quality'
    WHEN NOT coalesce(rep.rep_ok, TRUE) THEN 'repetition'
    WHEN NOT (substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
              < {sample_case}) THEN 'sampled_out'
    ELSE NULL END) IS NULL AS keep
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.node
LEFT JOIN q ON d.doc_id = q.doc_id
LEFT JOIN rep ON rep.doc_id = d.doc_id
"""


def q_incremental_dedup(spark, sf_dir):
    """Cross-snapshot incremental dedup: a new crawl batch keeps only
    docs whose normalized content fingerprint is unseen in the
    already-ingested corpus — THE operation every recurring crawl
    runs. One left_anti equi-join on a 128-bit hash (uniform shuffle;
    AQE's runtime bloom filter prunes the batch side against the
    small distinct-fingerprint build). Snapshot split is an md5 slice
    of doc_id, expressible identically in both engines."""
    d = _docs(spark, sf_dir)
    slice_char = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    seen = d.filter(slice_char < "8")
    batch = d.filter(slice_char >= "8")
    fp = TS.fingerprint(F.col("text"))
    seen_fps = seen.select(fp.alias("fp")).distinct()
    return (
        batch.withColumn("fp", fp)
        .join(seen_fps, "fp", "left_anti")
        .select("doc_id", "fp")
    )


_ORACLE_INCREMENTAL = """
WITH fps AS (
  SELECT doc_id,
    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS sl,
    md5(trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ',
                            'g'))) AS fp
  FROM documents)
SELECT b.doc_id, b.fp
FROM fps b
WHERE b.sl >= '8'
  -- NULL-text docs have a NULL fingerprint: Spark's left_anti keeps
  -- them (NULL never equi-matches), so the twin must too
  AND (b.fp IS NULL
       OR b.fp NOT IN (SELECT fp FROM fps WHERE sl < '8'
                       AND fp IS NOT NULL))
"""


def q_dup_window_spans(spark, sf_dir):
    """Span-level exact substring dedup (Lee et al. 2022): merged
    0-based token spans covered by any 13-token window whose hash
    occurs in >= 2 distinct docs — the partial-overlap duplication
    that doc-level dedup misses. 3 shuffles: dup-hash groupBy, mark
    join on the same hash, gaps-and-islands span merge on doc_id."""
    return DD.dup_window_spans(_docs(spark, sf_dir), k=13, seed=11)


_ORACLE_DUP_SPANS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents WHERE text IS NOT NULL),
w AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
         CAST(('0x' || substring(md5(
             array_to_string(t[CAST(u.i AS INT):CAST(u.i + 12 AS INT)], ' ')
             || ':11'), 1, 15)) AS BIGINT) AS h
  FROM toks, LATERAL unnest(range(1, len(t) - 11)) AS u(i)
  WHERE len(t) >= 13),
dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
m AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 13) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_span
  FROM m),
isl2 AS (
  SELECT doc_id, pos, sum(new_span) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 13 AS BIGINT) AS span_end,
       count(*) AS n_windows
FROM isl2 GROUP BY doc_id, island
"""


def q_strip_dup_spans(spark, sf_dir):
    """The rewrite pass over dup_window_spans: duplicated token spans
    cut, survivors re-joined — Lee et al.'s actual dedup action. The
    cut is a JVM positional-lambda filter (no explode, no Python);
    span tables are doc-bounded collect_lists."""
    return DD.strip_dup_spans(_docs(spark, sf_dir), k=13, seed=11)


_ORACLE_STRIP_SPANS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents WHERE text IS NOT NULL),
w AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
         CAST(('0x' || substring(md5(
             array_to_string(t[CAST(u.i AS INT):CAST(u.i + 12 AS INT)], ' ')
             || ':11'), 1, 15)) AS BIGINT) AS h
  FROM toks, LATERAL unnest(range(1, len(t) - 11)) AS u(i)
  WHERE len(t) >= 13),
dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
m AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 13) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_span
  FROM m),
isl2 AS (
  SELECT doc_id, pos, sum(new_span) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl),
spans AS (
  SELECT doc_id, min(pos) AS lo, max(pos) + 13 AS hi
  FROM isl2 GROUP BY doc_id, island),
ptoks AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[CAST(u.i AS INT)] AS tok
  FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS u(i)),
keptp AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM ptoks p LEFT JOIN spans s
    ON p.doc_id = s.doc_id AND p.pos >= s.lo AND p.pos < s.hi
  WHERE s.doc_id IS NULL),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
         count(*) AS n_kept
  FROM keptp GROUP BY doc_id)
SELECT td.doc_id,
       coalesce(a.cleaned, '') AS cleaned,
       coalesce(a.n_kept, 0) AS n_tokens_kept,
       td.n - coalesce(a.n_kept, 0) AS n_tokens_dropped
FROM (SELECT doc_id, len(t) AS n FROM toks) td
LEFT JOIN agg a ON td.doc_id = a.doc_id
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the GPT-3 appendix-C 13-gram rule):
    flag every doc sharing any 13-token n-gram with an eval set. The
    "benchmark" is derived deterministically from the corpus itself —
    docs with doc_id % 97 == 0 contribute their first 20 tokens as
    eval items — so the oracle derives the identical set with no
    external data. Bench grams broadcast; one corpus shuffle."""
    from document_extractor_spark.operators import decontam as DC

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0).select(
        F.array_join(F.slice(DD.tokens_col("text"), 1, 20), " ")
        .alias("text"))
    return DC.decontaminate_marks(d, DC.benchmark_ngram_set(bench))


_ORACLE_DECONTAM = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents WHERE text IS NOT NULL),
bg AS (
  SELECT DISTINCT
         CAST(('0x' || substring(md5(
             array_to_string(t[CAST(u.i AS INT):CAST(u.i + 12 AS INT)], ' ')
             || ':23'), 1, 15)) AS BIGINT) AS gram
  FROM (SELECT t[1:20] AS t FROM toks WHERE doc_id % 97 = 0) b,
       LATERAL unnest(range(1, len(t) - 11)) AS u(i)
  WHERE len(t) >= 13),
dg AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(
             array_to_string(t[CAST(u.i AS INT):CAST(u.i + 12 AS INT)], ' ')
             || ':23'), 1, 15)) AS BIGINT) AS gram
  FROM toks, LATERAL unnest(range(1, len(t) - 11)) AS u(i)
  WHERE len(t) >= 13),
hits AS (
  SELECT doc_id, count(DISTINCT gram) AS n_hits
  FROM dg WHERE gram IN (SELECT gram FROM bg) GROUP BY 1)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def q_token_budget_sample(spark, sf_dir):
    """Quota sampling to an absolute token budget per source (the knob
    a data-mixture spec states): docs kept in deterministic md5 walk
    order until the stratum budget is exhausted. Distributed
    prefix-sum shape — the heavy cumsum window partitions by
    (stratum, hash-bucket), never by stratum alone."""
    from document_extractor_spark.functions.sampling import (
        token_budget_sample)

    d = _docs(spark, sf_dir).withColumn(
        "n_tokens",
        F.when(F.col("text").isNull(), 0)
        .otherwise(F.size(DD.tokens_col("text"))))
    return token_budget_sample(
        d, key_col="doc_id", strata_col="source",
        n_tokens_col="n_tokens", budget=800, budgets={"src0": 1200})


_ORACLE_TOKEN_BUDGET = """
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN text IS NULL THEN 0
              ELSE len(list_filter(
                  string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                  t -> t <> '')) END AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS hk
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY hk, doc_id, n_tokens
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
  FROM d)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens,
       cum_tokens <= (CASE WHEN source = 'src0' THEN 1200 ELSE 800 END)
           AS kept
FROM c
"""


_BLOCKED_SITES = tuple(f"site{i}.example.com" for i in (3, 11, 19, 27, 35))


def q_blocklist_filter(spark, sf_dir):
    """URL blocklist filtering (the C4 badwords/blocklist slot): docs
    whose canonical host is on a small deny table are dropped via an
    EXPLICIT broadcast anti-join — the deny list is a dim table that
    must never shuffle the corpus. Hosts synthesized from doc_id
    (url_canonical_dedup's construction, same expression in SQL)."""
    d = _docs(spark, sf_dir)
    host = F.concat(F.lit("site"), (F.col("doc_id") % 40).cast("string"),
                    F.lit(".example.com"))
    block = spark.createDataFrame(
        [(s,) for s in _BLOCKED_SITES], "host: string")
    return (
        d.select("doc_id", host.alias("host"))
        .join(F.broadcast(block), "host", "left_anti")
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"),
             F.min("doc_id").alias("min_id"))
    )


_ORACLE_BLOCKLIST = f"""
SELECT 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com' AS host,
       count(*) AS n_docs, min(doc_id) AS min_id
FROM documents
WHERE 'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com'
      NOT IN ({', '.join(f"'{s}'" for s in _BLOCKED_SITES)})
GROUP BY 1
"""


def q_domain_reputation_filter(spark, sf_dir):
    """Domain-reputation two-pass filter (RefinedWeb-style URL-level
    quality): pass 1 aggregates mean quality per domain (small dim),
    pass 2 broadcasts it back onto the corpus and keeps docs from
    reputable domains OR individually excellent docs. The classic
    aggregate-then-rejoin shape: corpus shuffles once for the agg,
    never for the rejoin."""
    # quality_score is already 4dp-rounded (matching _SQL_QUALITY).
    # The domain mean is carried as an EXACT integer pair
    # (sum of q*10^4, count) rather than round(avg(q), 6): float
    # summation order and round-half ties could otherwise flip a
    # whole domain across the threshold in one engine only. The
    # reputation gate avg >= 0.709 becomes the integer comparison
    # sum_q_e4 >= 7090 * n_src — exact by construction.
    d = _docs(spark, sf_dir).withColumn(
        "q", TS.quality_score(F.col("text"))).withColumn(
        "qi", F.round(F.col("q") * 10000).cast("long"))
    stats = d.groupBy("source").agg(
        F.sum("qi").alias("sum_q_e4"),
        F.count("*").alias("n_src"))
    return (
        d.join(F.broadcast(stats), "source")
        .filter((F.col("sum_q_e4") >= 7090 * F.col("n_src"))
                | (F.col("q") >= 0.78))
        .select("doc_id", "source", "q", "sum_q_e4", "n_src")
    )


_ORACLE_DOMAIN_REP = f"""
WITH scored AS (
  SELECT doc_id, source, {_SQL_QUALITY} AS q FROM documents),
stats AS (
  SELECT source,
         CAST(sum(CAST(round(q * 10000) AS BIGINT)) AS BIGINT)
             AS sum_q_e4,
         count(*) AS n_src
  FROM scored GROUP BY source)
SELECT s.doc_id, s.source, s.q, st.sum_q_e4, st.n_src
FROM scored s JOIN stats st USING (source)
WHERE st.sum_q_e4 >= 7090 * st.n_src OR s.q >= 0.78
"""


def q_warc_ingest(spark, sf_dir):
    """WARC source (SURVEY §2.1 scan family; north_star
    "Common-Crawl-style web pages"): documents are packed into
    synthetic per-record-gzip WARC files distributed-side
    (applyInPandas), then exploded back into per-record rows by the
    from-scratch Content-Length-driven parser (functions/warc_mini,
    ISO 28500). Every output field is a pure function of doc_id/text,
    so the oracle recomputes the expected parse arithmetically while
    the Spark side must round-trip real bytes through serializer AND
    parser. No shuffle beyond the pack grouping; at crawl scale the
    WARC files arrive pre-built and the kernel is shuffle-free."""
    from document_extractor_spark.operators.warc_source import (
        docs_to_warc_blobs, warc_records)

    blobs = docs_to_warc_blobs(
        _docs(spark, sf_dir).select("doc_id", "text"), n_files=8)
    return (
        warc_records(blobs)
        .filter(F.col("error").isNull())
        .select(
            "url", "warc_date", "http_status", "http_content_type",
            F.length("payload").cast("long").alias("payload_len"),
            F.md5("payload").alias("payload_md5"))
    )


_ORACLE_WARC = """
SELECT 'http://site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com/doc/'
           || CAST(doc_id AS VARCHAR) AS url,
       strftime(TIMESTAMP '2026-01-01 00:00:00'
                + doc_id * INTERVAL 1 MINUTE, '%Y-%m-%dT%H:%M:%SZ')
           AS warc_date,
       CAST(CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS INT)
           AS http_status,
       'text/plain; charset=utf-8' AS http_content_type,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
           AS payload_len,
       md5(coalesce(text, '')) AS payload_md5
FROM documents
"""


def q_jsonl_shard_plan(spark, sf_dir):
    """JSONL training-shard export plan (the modern corpus sink: one
    .jsonl file per deterministic md5 shard, consumed by tokenizer /
    training jobs). The checked surface is the exact line bytes —
    Spark's JVM to_json is byte-identical to DuckDB's to_json
    (standards escaping incl. \\u-escaped control chars; pinned in
    test_jsonl_shards) — plus the md5-derived shard id. The real
    file writer (artifacts.write_jsonl_shards) shuffles once on
    shard; this plan stage is shuffle-free."""
    from document_extractor_spark.artifacts import jsonl_shard_lines

    d = _docs(spark, sf_dir).select("doc_id", "source", "lang", "text")
    return jsonl_shard_lines(
        d, key_col="doc_id", cols=["doc_id", "source", "lang", "text"],
        n_shards=16,
    ).select(
        "shard", "doc_id",
        F.octet_length("line").cast("long").alias("line_len"),
        F.md5("line").alias("line_md5"))


_ORACLE_JSONL = """
WITH j AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
             AS hk,
         to_json(struct_pack(doc_id := doc_id, source := source,
                             lang := lang, text := text)) AS line
  FROM documents)
SELECT CAST(hk % 16 AS INT) AS shard, doc_id,
       CAST(octet_length(encode(line)) AS BIGINT) AS line_len,
       md5(line) AS line_md5
FROM j
"""


def q_charlm_cross_entropy(spark, sf_dir):
    """Perplexity-proxy quality scoring (the CCNet/KenLM filter slot):
    a char-bigram LM estimated from the corpus itself (pass 1, one
    low-cardinality shuffle), then per-doc cross-entropy in
    bits/bigram under the BROADCAST LM (pass 2 — the corpus never
    reshuffles on bigram). Pure JVM Column work end-to-end; Laplace
    add-1 smoothing. Gibberish scores high, fluent corpus-language
    text low."""
    from document_extractor_spark.functions.charlm import (
        bigram_cross_entropy)

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # self-scoring fused mode: ONE corpus pass (the LM derives from
    # the per-(doc,bigram) pairs table), result checkpointed, cache
    # released
    return bigram_cross_entropy(d)


_ORACLE_CHARLM = """
WITH base AS (SELECT doc_id, text FROM documents),
pairs AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 2) AS bigram
  FROM base, unnest(range(1, length(text))) AS t(i)
  WHERE text IS NOT NULL AND length(text) >= 2),
lm AS (SELECT bigram, count(*) AS c FROM pairs GROUP BY 1),
tot AS (SELECT CAST(sum(c) + count(*) AS DOUBLE) AS denom FROM lm),
db AS (SELECT doc_id, bigram, count(*) AS n_b
       FROM pairs GROUP BY 1, 2),
sc AS (
  SELECT db.doc_id,
         CAST(sum(db.n_b) AS BIGINT) AS n_bigrams,
         round(sum(db.n_b * -log2((lm.c + 1) / tot.denom))
               / sum(db.n_b), 4) AS bits_per_bigram
  FROM db JOIN lm USING (bigram) CROSS JOIN tot
  GROUP BY db.doc_id)
SELECT b.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       sc.bits_per_bigram
FROM base b LEFT JOIN sc USING (doc_id)
"""


def q_ccnet_buckets(spark, sf_dir):
    """The CCNet head/middle/tail decision — the canonical consumer of
    the perplexity proxy: per-language tertiles of bits/bigram with
    exact `ntile(3)` semantics (4dp score, doc_id tie-break), head =
    most fluent third.  Empty docs (no bigrams) get a NULL bucket.

    r5 de-skew: no `ntile OVER (PARTITION BY lang)` corpus sort — the
    bucket comes from histogram-derived cutoffs (bounded-cardinality
    4dp scores) broadcast back onto the corpus; only the ≤2 boundary
    tie-groups per language see a (lang, score)-partitioned
    row_number.  See charlm.ccnet_tertile_buckets."""
    from document_extractor_spark.functions.charlm import (
        bigram_cross_entropy, ccnet_tertile_buckets)

    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    sc = bigram_cross_entropy(d.select("doc_id", "text"))
    joined = sc.join(d.select("doc_id", "lang"), "doc_id")
    nonzero = ccnet_tertile_buckets(
        joined.filter(F.col("n_bigrams") > 0))
    zero = joined.filter(F.col("n_bigrams") == 0).withColumn(
        "bucket", F.lit(None).cast("string"))
    return nonzero.unionByName(zero).select(
        "doc_id", "lang", "n_bigrams", "bits_per_bigram", "bucket")


# the charlm oracle becomes a CTE; tertile bucketing layered on top
_ORACLE_CCNET = f"""
WITH scored AS ({_ORACLE_CHARLM}),
wl AS (SELECT s.doc_id, d.lang, s.n_bigrams, s.bits_per_bigram
       FROM scored s JOIN documents d USING (doc_id)),
nz AS (SELECT *, ntile(3) OVER (PARTITION BY lang
           ORDER BY bits_per_bigram, doc_id) AS nt
       FROM wl WHERE n_bigrams > 0)
SELECT doc_id, lang, n_bigrams, bits_per_bigram,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket
FROM nz
UNION ALL
SELECT doc_id, lang, n_bigrams, bits_per_bigram, NULL AS bucket
FROM wl WHERE n_bigrams = 0
"""


def q_temperature_mix(spark, sf_dir):
    """Temperature-based data-mixture rebalancing (alpha=0.5): keep
    probability per source proportional to sqrt(n_src), integer-exact
    thresholds on the md5 16^4 lattice (no float pow/sum — last-ulp
    order dependence can flip a threshold in exactly one engine).
    One counts groupBy + one codegen filter over the corpus; the rate
    table rides in a literal CASE, never a join."""
    from document_extractor_spark.functions.sampling import (
        temperature_mix_sample)

    return temperature_mix_sample(
        _docs(spark, sf_dir), key_col="doc_id", strata_col="source")


_ORACLE_TEMPERATURE = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
-- integer-exact isqrt(n*1e6): double sqrt can land one off the true
-- integer root once n*1e6 nears 2^53; correct the floor both ways so
-- the twin matches Spark's math.isqrt at ANY stratum size (ADVICE r3)
w0 AS (SELECT source, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000)) AS BIGINT)
                  AS w0
       FROM c),
w AS (SELECT source, n,
             w0 - CAST(w0 * w0 > n * 1000000 AS BIGINT)
                + CAST((w0 + 1) * (w0 + 1) <= n * 1000000
                       AND w0 * w0 <= n * 1000000 AS BIGINT) AS w
      FROM w0),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
               CAST(sum(w) AS BIGINT) AS s_sum FROM w),
thr AS (
  SELECT source, n,
         least(65536,
               (tot.n_total // 2) * w * 65536 // (tot.s_sum * n)) AS t
  FROM w CROSS JOIN tot)
SELECT d.doc_id, d.source, CAST(thr.n AS BIGINT) AS n_d,
       CAST(thr.t AS BIGINT) AS keep_thr,
       ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
           < thr.t AS kept
FROM documents d JOIN thr USING (source)
"""


def q_nb_quality_classifier(spark, sf_dir):
    """The CCNet/fastText classifier slot, trained in-engine: seed
    labels from the rule-based quality score, one token-keyed groupBy
    learns Laplace-smoothed class counts, weights are
    integer-quantized likelihood ratios (div on the 4096 lattice —
    integer sums are exact and order-independent in every engine),
    scoring is explode + broadcast weight join + one doc groupBy."""
    from document_extractor_spark.functions.nbquality import (
        nb_score, seed_labels, train_nb_weights)

    d = seed_labels(_docs(spark, sf_dir).select("doc_id", "text"))
    weights = train_nb_weights(d)  # leaves a caller-owned persist
    # materialize the small scored result, then release the
    # vocab-sized weight cache (the bigram_cross_entropy lifecycle —
    # ADVICE r3: without this every driver-gate run leaks the cache)
    out = nb_score(d, weights).localCheckpoint(eager=True)
    weights.unpersist(blocking=False)
    return out


_ORACLE_NB = f"""
WITH d AS (
  SELECT doc_id, text, ({_SQL_QUALITY}) >= 0.7 AS hiq FROM documents),
tk AS (
  SELECT doc_id, CAST(hiq AS INT) AS hi, t.tok AS token
  FROM d, unnest(list_filter(string_split_regex(
      lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
      x -> x <> '')) AS t(tok)),
c AS (SELECT token, sum(hi) AS hi_t, count(*) - sum(hi) AS lo_t
      FROM tk GROUP BY 1),
tot AS (SELECT CAST(sum(hi_t) AS BIGINT) AS hi_tot,
               CAST(sum(lo_t) AS BIGINT) AS lo_tot,
               count(*) AS v FROM c),
w AS (SELECT token,
             CAST((hi_t + 1) * 4096 * (tot.lo_tot + tot.v)
                  // ((lo_t + 1) * (tot.hi_tot + tot.v)) AS BIGINT) AS w
      FROM c CROSS JOIN tot),
sc AS (SELECT tk.doc_id, count(*) AS n_tokens,
              CAST(sum(w.w) AS BIGINT) AS nb_score
       FROM tk JOIN w USING (token) GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sc.nb_score, 0) AS BIGINT) AS nb_score,
       CASE WHEN COALESCE(sc.n_tokens, 0) > 0
            THEN sc.nb_score >= sc.n_tokens * 4096 END AS pred_hi
FROM d LEFT JOIN sc USING (doc_id)
"""


def _link_fixture_pages(spark, sf_dir):
    """Deterministic link fixtures: each doc's page carries one
    fragment link (dropped), one relative link (resolves to its own
    domain) and (doc_id % 4)+1 absolute links to site (doc_id*7+k)
    % 40 — every edge recomputable arithmetically by the oracle.
    Built JVM-side (concat/transform), no Python."""
    d = _docs(spark, sf_dir).select("doc_id")
    own = F.concat(
        F.lit("http://site"), (F.col("doc_id") % 40).cast("string"),
        F.lit(".example.com/doc/"), F.col("doc_id").cast("string"))
    html = F.concat(
        F.lit('<a href="#top">t</a><a href="/about">a</a>'),
        F.array_join(F.transform(
            F.sequence(F.lit(1).cast("long"),
                       F.col("doc_id") % 4 + 1),
            lambda k: F.concat(
                F.lit('<a href="http://site'),
                ((F.col("doc_id") * 7 + k) % 40).cast("string"),
                F.lit('.example.com/page">link '),
                k.cast("string"), F.lit("</a>"))), ""))
    return d.select(own.alias("url"), html.alias("html_text"))


_SQL_LINK_EDGES = """
d AS (SELECT doc_id,
             'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com'
                 AS src
      FROM documents),
abs_links AS (
  SELECT src, 'site' || CAST((doc_id * 7 + k) % 40 AS VARCHAR)
              || '.example.com' AS dst
  FROM d, unnest(range(1, CAST(doc_id % 4 AS BIGINT) + 2)) AS t(k)),
all_links AS (
  SELECT src, dst FROM abs_links
  UNION ALL SELECT src, src AS dst FROM d),
e AS (SELECT src, dst, count(*) AS w FROM all_links GROUP BY 1, 2)
"""


def q_anchor_text_index(spark, sf_dir):
    """Anchor-text profile per target domain (the weak-supervision
    label signal a crawl carries for free): (href, anchor) pairs
    extracted positionally from two aligned regexp_extract_all group
    lists (pure Column, zero shuffle), then one domain-bounded
    groupBy — counts, distinct anchors, lexicographic-min
    representative."""
    from document_extractor_spark.operators.linkgraph import (
        anchor_text_index, extract_anchors)

    pages = _link_fixture_pages(spark, sf_dir)
    return anchor_text_index(extract_anchors(pages))


_ORACLE_ANCHORS = """
WITH d AS (SELECT doc_id,
                  'site' || CAST(doc_id % 40 AS VARCHAR)
                      || '.example.com' AS src
           FROM documents),
abs_a AS (
  SELECT 'site' || CAST((doc_id * 7 + k) % 40 AS VARCHAR)
             || '.example.com' AS dst,
         'link ' || CAST(k AS VARCHAR) AS anchor
  FROM documents,
       unnest(range(1, CAST(doc_id % 4 AS BIGINT) + 2)) AS t(k)),
rel_a AS (SELECT src AS dst, 'a' AS anchor FROM d)
SELECT dst AS dst_domain, count(*) AS n_anchors,
       CAST(count(DISTINCT anchor) AS BIGINT) AS n_distinct_anchors,
       min(anchor) AS top_anchor
FROM (SELECT * FROM abs_a UNION ALL SELECT * FROM rel_a)
GROUP BY 1
"""


def q_domain_link_graph(spark, sf_dir):
    """Domain-level link graph (the reputation/frontier signal a web
    corpus already holds): href extraction is a pure Column
    regexp_extract_all (Java∩RE2 pattern, zero shuffle), relative
    links resolve to the source's own domain, and the edge groupBy is
    the only shuffle — the edge table is #domains²-bounded, orders
    smaller than the corpus."""
    from document_extractor_spark.operators.linkgraph import (
        domain_edges, extract_outlinks)

    pages = _link_fixture_pages(spark, sf_dir)
    return domain_edges(extract_outlinks(pages))


_ORACLE_LINK_GRAPH = f"""
WITH {_SQL_LINK_EDGES}
SELECT src AS src_domain, dst AS dst_domain,
       CAST(w AS BIGINT) AS n_links
FROM e
"""


def q_link_pagerank(spark, sf_dir):
    """PageRank over the domain link graph, 3 power iterations with
    standard damping + dangling-mass redistribution. Each iteration
    is one edge⋈rank join + one groupBy on the DIM-SIZED domain
    graph (never the corpus); lineage cut via localCheckpoint. The
    oracle unrolls the same three iterations (incl. the dangling
    term) expression-for-expression; ranks compared at 6 dp — the
    same accepted float-comparison class as charlm's 4 dp bits (a
    value within ~1e-15 of a rounding boundary could in principle
    round apart; probability ~1e-9 per value)."""
    from document_extractor_spark.operators.linkgraph import (
        domain_edges, extract_outlinks, pagerank)

    pages = _link_fixture_pages(spark, sf_dir)
    edges = domain_edges(extract_outlinks(pages)).persist()
    try:
        ranks = pagerank(edges, iterations=3)
        return ranks.select(
            "domain", F.round("rank", 6).alias("rank"))
    finally:
        edges.unpersist(blocking=False)


_ORACLE_PAGERANK = f"""
WITH {_SQL_LINK_EDGES},
nodes AS (SELECT DISTINCT dom FROM (
    SELECT src AS dom FROM e UNION SELECT dst AS dom FROM e)),
nn AS (SELECT count(*) AS n FROM nodes),
wt AS (SELECT src, sum(w) AS wt FROM e GROUP BY 1),
r0 AS (SELECT dom AS domain, 1.0 / nn.n AS rank
       FROM nodes CROSS JOIN nn),
d1 AS (SELECT COALESCE(sum(rank), 0) AS m FROM r0
       WHERE domain NOT IN (SELECT src FROM wt)),
c1 AS (SELECT e.dst AS domain, sum(r0.rank * e.w / wt.wt) AS c
       FROM e JOIN r0 ON e.src = r0.domain
       JOIN wt ON e.src = wt.src GROUP BY 1),
r1 AS (SELECT nodes.dom AS domain,
              ((1 - 0.85) / nn.n + 0.85 * d1.m / nn.n)
                  + 0.85 * COALESCE(c1.c, 0) AS rank
       FROM nodes CROSS JOIN nn CROSS JOIN d1
       LEFT JOIN c1 ON c1.domain = nodes.dom),
d2 AS (SELECT COALESCE(sum(rank), 0) AS m FROM r1
       WHERE domain NOT IN (SELECT src FROM wt)),
c2 AS (SELECT e.dst AS domain, sum(r1.rank * e.w / wt.wt) AS c
       FROM e JOIN r1 ON e.src = r1.domain
       JOIN wt ON e.src = wt.src GROUP BY 1),
r2 AS (SELECT nodes.dom AS domain,
              ((1 - 0.85) / nn.n + 0.85 * d2.m / nn.n)
                  + 0.85 * COALESCE(c2.c, 0) AS rank
       FROM nodes CROSS JOIN nn CROSS JOIN d2
       LEFT JOIN c2 ON c2.domain = nodes.dom),
d3 AS (SELECT COALESCE(sum(rank), 0) AS m FROM r2
       WHERE domain NOT IN (SELECT src FROM wt)),
c3 AS (SELECT e.dst AS domain, sum(r2.rank * e.w / wt.wt) AS c
       FROM e JOIN r2 ON e.src = r2.domain
       JOIN wt ON e.src = wt.src GROUP BY 1),
r3 AS (SELECT nodes.dom AS domain,
              ((1 - 0.85) / nn.n + 0.85 * d3.m / nn.n)
                  + 0.85 * COALESCE(c3.c, 0) AS rank
       FROM nodes CROSS JOIN nn CROSS JOIN d3
       LEFT JOIN c3 ON c3.domain = nodes.dom)
SELECT domain, round(rank, 6) AS rank FROM r3
"""


def q_crawl_to_corpus(spark, sf_dir):
    """The full crawl→corpus capstone in one query: docs rendered to
    boilerplate HTML (JVM), packed into per-record-gzip WARC files
    (distributed), parsed back by the from-scratch WARC reader, 404
    records dropped, the survivors run through the REAL extraction
    pipeline (sniff → DOM block scoring → gate), and each extracted
    doc annotated with its training-corpus decision: token count,
    quality score, keep verdict, and JSONL shard. The oracle
    recomputes every field from `documents` arithmetically — the
    Spark side must survive WARC serialization, parsing, AND
    byte-exact boilerplate stripping to match."""
    from document_extractor_spark.artifacts import md5_shard
    from document_extractor_spark.config import PipelineConfig
    from document_extractor_spark.operators.warc_source import (
        docs_to_warc_blobs, warc_pages)
    from document_extractor_spark.pipeline import run_extraction

    d = _docs(spark, sf_dir)
    payload_docs = d.select(
        "doc_id",
        F.encode(_boilerplate_html(F.col("text")), "UTF-8")
        .alias("payload"))
    blobs = docs_to_warc_blobs(
        payload_docs, n_files=8, payload_col="payload",
        content_type="text/html; charset=utf-8")
    pages = warc_pages(blobs, require_status=200)
    res = run_extraction(spark, pages, PipelineConfig())
    q = TS.quality_score(F.col("text"))
    shard = md5_shard("url", 8)
    return res.extracted.select(
        "url",
        F.size(DD.tokens_col("text")).cast("long").alias("n_tokens"),
        q.alias("quality"),
        (q >= 0.7).alias("kept"),
        shard.alias("shard"),
        F.md5("text").alias("text_md5"))


_ORACLE_CRAWL_CORPUS = f"""
WITH src AS (
  SELECT doc_id,
         'http://site' || CAST(doc_id % 40 AS VARCHAR)
             || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
  FROM documents
  WHERE doc_id % 13 <> 0)
SELECT url,
       CAST(len(list_filter(
           string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
           t -> t <> '')) AS BIGINT) AS n_tokens,
       {_SQL_QUALITY} AS quality,
       ({_SQL_QUALITY}) >= 0.7 AS kept,
       CAST(('0x' || substr(md5(url), 1, 4))::BIGINT % 8 AS INT)
           AS shard,
       md5(text) AS text_md5
FROM src
"""


def q_robots_filter(spark, sf_dir):
    """Crawl-politeness filter (RFC 9309): deterministic robots.txt
    bodies are synthesized per site (JVM concat), parsed by the REAL
    from-scratch parser into a rules table, and the corpus URL set is
    filtered by longest-prefix match (tie → Allow, $-anchor exact,
    unlisted domain allowed) with ZERO corpus shuffles — one
    broadcast of the per-domain rule arrays, decision as a per-row
    JVM aggregate. The oracle evaluates the same match semantics
    over directly-generated rule rows, so the parser must agree with
    the spec to pass."""
    from document_extractor_spark.functions.robots import (
        filter_allowed, robots_rules_table)

    s = F.col("id")
    rules_part = F.concat(
        F.when(s % 5 == 0,
               F.lit("Disallow: /doc/\nAllow: /doc/1\n"))
        .otherwise(F.lit("")),
        F.when(s % 7 == 0,
               F.concat(F.lit("Disallow: /doc/"), s.cast("string"),
                        F.lit("$\n")))
        .otherwise(F.lit("")))
    robots = spark.range(40).select(
        F.concat(F.lit("site"), s.cast("string"),
                 F.lit(".example.com")).alias("domain"),
        F.when(F.length(rules_part) > 0,
               F.concat(F.lit("User-agent: *\n"), rules_part))
        .otherwise(F.lit("")).alias("robots_txt"))
    urls = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("http://site"),
                 (F.col("doc_id") % 40).cast("string"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    return filter_allowed(urls, robots_rules_table(robots))


_ORACLE_ROBOTS = """
WITH sites AS (SELECT CAST(g AS BIGINT) AS s FROM range(0, 40) t(g)),
rules AS (
  SELECT 'site' || CAST(s AS VARCHAR) || '.example.com' AS domain,
         '/doc/' AS prefix, false AS allow
  FROM sites WHERE s % 5 = 0
  UNION ALL
  SELECT 'site' || CAST(s AS VARCHAR) || '.example.com',
         '/doc/1', true
  FROM sites WHERE s % 5 = 0
  UNION ALL
  SELECT 'site' || CAST(s AS VARCHAR) || '.example.com',
         '/doc/' || CAST(s AS VARCHAR) || '$', false
  FROM sites WHERE s % 7 = 0),
urls AS (
  SELECT doc_id,
         'http://site' || CAST(doc_id % 40 AS VARCHAR)
             || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'site' || CAST(doc_id % 40 AS VARCHAR) || '.example.com'
             AS dom,
         '/doc/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents),
m AS (
  SELECT u.doc_id, u.url,
         max(CASE WHEN (CASE WHEN r.prefix LIKE '%$'
                        THEN u.path = substr(r.prefix, 1,
                                             len(r.prefix) - 1)
                        ELSE starts_with(u.path, r.prefix) END)
             THEN len(r.prefix) * 2 + CAST(r.allow AS INT)
             ELSE -1 END) AS best
  FROM urls u LEFT JOIN rules r ON u.dom = r.domain
  GROUP BY 1, 2)
SELECT doc_id, url FROM m
WHERE best IS NULL OR best < 0 OR best % 2 = 1
"""


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (gear-hash boundaries that survive
    edits — the chunk-level dedup enabler across crawl snapshots).
    Rows-only by design: a 64-term rolling hash + greedy boundary
    enforcement is not reasonably SQL-expressible (same class as the
    HLL sketch internals); correctness is pinned in tests/test_cdc.py
    by an independent gear-recurrence reference, reconstruction and
    bounds invariants, and the boundary-resync property test."""
    from document_extractor_spark.operators.cdc import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir),
                      min_size=16, avg_size=64, max_size=256)


def q_heavy_hitters(spark, sf_dir):
    """Distributed Space-Saving top-k tokens (the heavy-hitters
    sketch that replaces the open-vocabulary groupBy at 10^12 rows:
    one shuffle-free capacity-bounded pass per partition, then a
    dim-sized summary merge with the Metwally absent-partition
    bound). Run here with capacity >= the vocabulary so no sketch
    ever evicts — est is exact, err 0, the merge penalty vanishes,
    and the result equals the exact count top-k (the same
    degenerate-exact oracle trick as IVF nprobe == n_cells); the
    lossy regime's bounds are pinned in tests/test_heavyhitters."""
    from document_extractor_spark.operators.heavyhitters import (
        heavy_hitters)

    return heavy_hitters(
        _docs(spark, sf_dir), capacity=65536, k=20
    ).select("token", "upper", "lower")


_ORACLE_HEAVY = """
WITH toks AS (
  SELECT t.tok AS token
  FROM documents, unnest(list_filter(string_split_regex(
      lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
      x -> x <> '')) AS t(tok)),
c AS (SELECT token, count(*) AS n FROM toks GROUP BY 1)
SELECT token, CAST(n AS BIGINT) AS upper, CAST(n AS BIGINT) AS lower
FROM c ORDER BY n DESC, token LIMIT 20
"""


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective filters on BOTH sides of a
    fact-fact join (lineitem x orders; filters reach the parquet
    scans), broadcast customer dim, revenue agg, deterministic
    top-10 (rounded revenue desc, then keys — ordering on the
    ROUNDED value keeps the cutoff engine-identical)."""
    _pin_utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    d = "1998-07-01"
    return (
        li.filter(F.col("l_shipdate") > d)
        .join(orders.filter(F.col("o_orderdate") < d),
              li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.filter(
            F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_ORACLE_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-07-01'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q_corpus_overview(spark, sf_dir):
    """The corpus dashboard in one pass: per (source, lang) doc
    counts, token totals, char totals, and quality-bucket tallies —
    one groupBy, conditional aggregation instead of multiple scans.
    Every derived column reuses an already-value-checked expression
    (pinned tokenizer, 4dp quality)."""
    d = _docs(spark, sf_dir)
    q = TS.quality_score(F.col("text"))
    n_tok = F.when(F.col("text").isNull(), 0).otherwise(
        F.size(DD.tokens_col("text")))
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.length("text"), F.lit(0)))
            .cast("long").alias("n_chars"),
            F.sum(F.when(q >= 0.78, 1).otherwise(0)).cast("long")
            .alias("n_high_q"),
            F.sum(F.when(q < 0.5, 1).otherwise(0)).cast("long")
            .alias("n_low_q"))
    )


_ORACLE_OVERVIEW = f"""
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN text IS NULL THEN 0
            ELSE len(list_filter(string_split_regex(text,
                 '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')) END)
            AS BIGINT) AS n_tokens,
       CAST(sum(COALESCE(length(text), 0)) AS BIGINT) AS n_chars,
       CAST(sum(CASE WHEN ({_SQL_QUALITY}) >= 0.78 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_q,
       CAST(sum(CASE WHEN ({_SQL_QUALITY}) < 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_q
FROM documents
GROUP BY 1, 2
"""


def q_dom_blocks(spark, sf_dir):
    """The north_star DOM block model exposed as a queryable table:
    one row per block with classification features and the
    content-vs-boilerplate verdict, produced by the SAME parser +
    classifier the extraction pipeline runs (no drift possible). The
    wrapper fixture yields a deterministic 5-block structure per doc
    (title / two nav li / content p / footer p), so the oracle
    regenerates every row arithmetically — including the content
    block's md5 over the ws-normalized text and the exact classifier
    predicate for its keep verdict."""
    from document_extractor_spark.operators.html_extract import (
        dom_block_table)

    d = _docs(spark, sf_dir)
    pages = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
        .alias("url"),
        _boilerplate_html(F.col("text")).alias("html_text"))
    return dom_block_table(pages)


_ORACLE_DOM_BLOCKS = """
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
  FROM documents
  -- NULL text nulls the whole concat'd html, so the Spark kernel
  -- emits no rows for such a doc; mirror that here
  WHERE text IS NOT NULL),
b AS (
  SELECT doc_id, 0 AS block_idx, 'title' AS tag, true AS boiler,
         10 AS n_chars, 0 AS link_chars, false AS kept,
         md5('Doc | Site') AS text_md5 FROM d
  UNION ALL
  SELECT doc_id, 1, 'li', true, 4, 4, false, md5('Home') FROM d
  UNION ALL
  SELECT doc_id, 2, 'li', true, 13, 13, false,
         md5('About us page') FROM d
  UNION ALL
  -- an empty (or whitespace-only) doc produces NO content block:
  -- the parser only materializes blocks with text, so the footer
  -- then takes index 3
  SELECT doc_id, 3, 'p', false, length(t), 0,
         length(t) >= 25, md5(t) FROM d WHERE t <> ''
  UNION ALL
  SELECT doc_id, CASE WHEN t <> '' THEN 4 ELSE 3 END, 'p', true,
         49, 0, false,
         md5('Copyright 2026 Example Corp. All rights reserved.')
  FROM d)
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       CAST(block_idx AS INT) AS block_idx, tag, boiler,
       false AS heading, CAST(n_chars AS INT) AS n_chars,
       CAST(link_chars AS INT) AS link_chars, kept, text_md5
FROM b
"""


def q_hashed_embeddings(spark, sf_dir):
    """The embedding ENCODE step in-engine (feature hashing,
    Weinberger et al.): every token occurrence contributes ±1 per
    dimension, signs drawn from the bits of ONE md5 per token, so a
    doc's raw vector is exact integer signed counts — order-
    independent in any engine. One explode + one map-side-combined
    doc groupBy; unit normalization is an optional float epilogue
    for the cosine/ANN consumers (checked raw here).

    The gate row serializes the vector to one CSV string: the
    driver's pandas canonicalizer cannot sort list-typed cells
    (CORRECTNESS_r04 red row), and exact integer components make the
    string form just as checkable."""
    from document_extractor_spark.functions.embed import (
        hashed_embeddings)

    emb = hashed_embeddings(_docs(spark, sf_dir), dim=16)
    return emb.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("embedding"), lambda x: x.cast("string")),
            ",").alias("embedding_csv"))


def _embed_oracle_sql(dim: int = 16) -> str:
    sums = ",\n         ".join(
        f"sum(2 * ((('0x' || substr(h, {1 + d // 4}, 1))::BIGINT"
        f" >> {d % 4}) & 1) - 1) AS _e{d}"
        for d in range(dim))
    elems = ", ".join(
        f"CAST(COALESCE(s._e{d}, 0) AS BIGINT)" for d in range(dim))
    return f"""
WITH tk AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM documents, unnest(list_filter(string_split_regex(
      lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
      x -> x <> '')) AS t(tok)),
s AS (SELECT doc_id,
         {sums}
      FROM tk GROUP BY 1)
SELECT d.doc_id, array_to_string([{elems}], ',') AS embedding_csv
FROM documents d LEFT JOIN s USING (doc_id)
"""


def q_top_docs_per_source(spark, sf_dir):
    """Curriculum/curation selection: the k best docs per source by
    quality score, deterministic tie-break on doc_id.  r5: the
    docstring promise became code — two-phase skew-safe top-k
    (per-(source, doc_id-hash-bucket) pre-selection, then a global
    re-rank over the <= 32*k survivors per source), identical output
    to the naive per-source window (pytest-pinned on a dominant-
    source fixture) with no source-wide sort anywhere."""
    from document_extractor_spark.operators.topk import skew_safe_topk

    # raw scan on purpose: this query's scoring is light relative to
    # the widen exchange (measured 2.1 s raw vs 3.4 s widened at both
    # driver scales — the phase-1 window shuffle follows immediately,
    # so the extra round-robin buys nothing here)
    d = _docs_raw(spark, sf_dir).withColumn(
        "q", TS.quality_score(F.col("text")))
    return skew_safe_topk(
        d, ["source"], [F.col("q").desc(), F.col("doc_id")], k=5,
    ).select("source", "rank", "doc_id", "q")


_ORACLE_TOP_DOCS = f"""
WITH s AS (
  SELECT source, doc_id, {_SQL_QUALITY} AS q,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_SQL_QUALITY} DESC, doc_id)
             AS rank
  FROM documents)
SELECT source, CAST(rank AS INT) AS rank, doc_id, q
FROM s WHERE rank <= 5
"""


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    bag-of-words importance weights against an in-corpus quality seed
    (target = quality_score >= 0.7), deterministic top-125 selection
    by 4dp log-weight with doc_id tie-break — the published
    importance-resampling slot with every stage in-engine (see
    functions/dsir.py for the scale shape)."""
    from document_extractor_spark.functions.dsir import (
        dsir_select,
        dsir_weights,
    )

    w = dsir_weights(_docs(spark, sf_dir))
    return dsir_select(w, k=125)


_ORACLE_DSIR = f"""
WITH toks AS (
  SELECT doc_id, ({_SQL_QUALITY}) >= 0.7 AS hi,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents),
feats AS (
  SELECT doc_id, hi,
         CAST(('0x' || substring(md5(f), 1, 4)) AS INT) % 1024 AS bucket
  FROM (SELECT doc_id, hi,
               unnest(t || [t[i] || ' ' || t[i+1]
                            for i in range(1, len(t))]) AS f
        FROM toks)),
model AS (
  SELECT bucket,
         sum(CASE WHEN hi THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM feats GROUP BY bucket),
tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM model),
scored AS (
  SELECT f.doc_id, count(*) AS n_feat,
         round(sum(log2((m.ct + 1) / CAST(t.nt + 1024 AS DOUBLE))
                   - log2((m.cr + 1) / CAST(t.nr + 1024 AS DOUBLE))),
               4) AS lw
  FROM feats f JOIN model m USING (bucket) CROSS JOIN tot t
  GROUP BY f.doc_id),
sel AS (
  SELECT doc_id, row_number() OVER (ORDER BY lw DESC, doc_id) AS rk
  FROM scored)
SELECT d.doc_id,
       coalesce(s.n_feat, 0) AS n_feat,
       s.lw AS dsir_logw,
       coalesce(sel.rk <= 125, false) AS selected
FROM documents d
LEFT JOIN scored s USING (doc_id)
LEFT JOIN sel USING (doc_id)
"""


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): integer-lattice k-means over the
    in-engine hashed embeddings, within-cluster cosine near-dup pairs
    by exact cross-multiplication (tau = 7/10), transitive closure ->
    keeper per semantic-duplicate group. Every stage bit-stable (see
    operators/semdedup.py).

    k scales with the corpus (the paper's knob: cluster count grows
    so cluster size stays ~constant at 125): the within-cluster pair
    join is quadratic in cluster size, so pinning k would make this
    O(n^2/k) at 100x the data. The oracle twin computes the SAME
    max(4, n // 125) in its init CTE's LIMIT (scalar subquery), so
    engine and oracle stay in lockstep at every corpus size."""
    from document_extractor_spark.operators.semdedup import semdedup

    docs = _docs(spark, sf_dir)
    # plan-building count on the raw scan (no widen exchange)
    k = max(4, _docs_raw(spark, sf_dir).count() // 125)
    return semdedup(docs, dim=16, k=k, iters=2, tau=(7, 10))


def _cluster_assign_ctes(dim: int = 16, k_min: int = 4,
                         per_cluster: int = 125) -> str:
    """The shared CTE chain `tk -> s -> emb -> init -> asg1 -> c1 ->
    cent1 -> asg2`: hashed embeddings + 2-round integer-lattice
    k-means assignment, k computed IN SQL in lockstep with the
    engine's max(k_min, n // per_cluster)."""
    sums = ",\n         ".join(
        f"sum(2 * ((('0x' || substr(h, {1 + d // 4}, 1))::BIGINT"
        f" >> {d % 4}) & 1) - 1) AS _e{d}"
        for d in range(dim))
    ecols = ", ".join(
        f"CAST(COALESCE(s._e{d}, 0) AS BIGINT) AS e{d}"
        for d in range(dim))

    def dist(e, c):
        return " + ".join(
            f"({e}.e{d} - {c}.e{d})*({e}.e{d} - {c}.e{d})"
            for d in range(dim))

    csums = ", ".join(f"sum(e.e{d}) AS s{d}" for d in range(dim))
    # truncating division toward zero, sign-explicit (DuckDB // floors)
    cquant = ", ".join(
        f"COALESCE(CASE WHEN c.s{d} < 0 THEN -((-c.s{d}) // c.n)"
        f" ELSE c.s{d} // c.n END, i.e{d}) AS e{d}"
        for d in range(dim))
    return f"""tk AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM documents, unnest(list_filter(string_split_regex(
      lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
      x -> x <> '')) AS t(tok)),
s AS (SELECT doc_id, {sums} FROM tk GROUP BY 1),
emb AS (
  SELECT d.doc_id, {ecols}
  FROM documents d LEFT JOIN s USING (doc_id)),
init AS (
  -- k stays in LOCKSTEP with q_semdedup's corpus-scaled formula
  -- (max(k_min, n // per_cluster)); a pinned literal here would
  -- silently diverge on any corpus past k_min*per_cluster docs
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS cluster, *
  FROM emb ORDER BY doc_id
  LIMIT (SELECT greatest({k_min}, count(*) // {per_cluster})
         FROM documents)),
asg1 AS (
  SELECT e.doc_id, i.cluster FROM emb e CROSS JOIN init i
  QUALIFY row_number() OVER (PARTITION BY e.doc_id
                             ORDER BY {dist('e', 'i')}, i.cluster) = 1),
c1 AS (
  SELECT a.cluster, count(*) AS n, {csums}
  FROM asg1 a JOIN emb e USING (doc_id) GROUP BY a.cluster),
cent1 AS (
  SELECT i.cluster, {cquant}
  FROM init i LEFT JOIN c1 c ON i.cluster = c.cluster),
asg2 AS (
  SELECT e.doc_id, i.cluster FROM emb e CROSS JOIN cent1 i
  QUALIFY row_number() OVER (PARTITION BY e.doc_id
                             ORDER BY {dist('e', 'i')}, i.cluster) = 1)"""


def _semdedup_oracle_sql(dim: int = 16, k_min: int = 4,
                         per_cluster: int = 125,
                         p: int = 7, q: int = 10) -> str:
    dot = " + ".join(f"x.e{d}*y.e{d}" for d in range(dim))
    n2 = " + ".join(f"e{d}*e{d}" for d in range(dim))
    return f"""
WITH RECURSIVE
{_cluster_assign_ctes(dim, k_min, per_cluster)},
side AS (
  SELECT a.cluster, e.*, ({n2}) AS n2
  FROM asg2 a JOIN emb e USING (doc_id)),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM side x JOIN side y
    ON x.cluster = y.cluster AND x.doc_id < y.doc_id
  WHERE ({dot}) > 0
    AND {q * q} * (CAST(({dot}) AS HUGEINT) * ({dot}))
        > {p * p} * (CAST(x.n2 AS HUGEINT) * y.n2)),
eu AS (SELECT a, b FROM p0 UNION SELECT b AS a, a AS b FROM p0),
reach(src, dst) AS (
  SELECT a, a FROM eu
  UNION
  SELECT r.src, eu.b FROM reach r JOIN eu ON r.dst = eu.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src)
SELECT d.doc_id, CAST(a.cluster AS INT) AS cluster,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       (coalesce(c.component, d.doc_id) = d.doc_id) AS is_keeper
FROM documents d
LEFT JOIN asg2 a USING (doc_id)
LEFT JOIN comp c ON d.doc_id = c.node
"""


_ORACLE_SEMDEDUP = _semdedup_oracle_sql()


def q_cluster_balanced_sample(spark, sf_dir):
    """Topic-balanced selection (ClusterClip-style cluster-capped
    sampling): k-means over the hashed embeddings (same corpus-scaled
    k as semdedup), then every cluster keeps at most cap=100 members
    chosen by the deterministic md5 lattice (16-bit prefix of the
    decimal id, tie -> smallest id). keep=false is the trimmed tail
    of over-represented topic clusters. Per-cluster selection runs
    through the skew-safe two-phase top-k — no cluster-wide sort even
    for a degenerate giant cluster."""
    from document_extractor_spark.operators.semdedup import (
        cluster_balanced_sample)

    return cluster_balanced_sample(
        _docs(spark, sf_dir), cap=100, dim=16, iters=2)


def _cluster_balance_oracle_sql(dim: int = 16, k_min: int = 4,
                                per_cluster: int = 125,
                                cap: int = 100) -> str:
    return f"""
WITH
{_cluster_assign_ctes(dim, k_min, per_cluster)},
pri AS (
  SELECT doc_id, cluster,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
             AS h
  FROM asg2),
ranked AS (
  SELECT doc_id, cluster,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY h ASC, doc_id ASC) AS rn
  FROM pri)
SELECT doc_id, CAST(cluster AS INT) AS cluster, (rn <= {cap}) AS keep
FROM ranked
"""


_ORACLE_CLUSTER_BALANCE = _cluster_balance_oracle_sql()


def q_inverted_index(spark, sf_dir):
    """Retrieval-index build: one row per vocabulary term (pinned
    whitespace tokenizer) with document frequency and the doc-sorted
    posting list rendered `"id:tf id:tf"`. max_df drops stop-grade
    terms BEFORE their postings collect — the IR stop-df rule
    doubling as the whale guard (no posting row ever exceeds max_df
    structs, however common the term).

    The gate cap SCALES with the corpus — max(2, 4n//5), computed
    identically in the oracle's HAVING via a scalar subquery (the
    semdedup-k lockstep rule) — because the gate corpus has a tiny
    31-term vocabulary with median df ~0.78n: a pinned absolute cap
    would be substantive at exactly one SF and near-vacuous at every
    other. A real crawl uses a far smaller absolute cap."""
    from document_extractor_spark.operators.bm25 import inverted_index

    docs = _docs(spark, sf_dir)
    # plan-building count on the raw scan (no widen exchange)
    return inverted_index(
        docs, max_df=max(2, _docs_raw(spark, sf_dir).count() * 4 // 5))


_ORACLE_INVERTED_INDEX = """
WITH td AS (
  SELECT doc_id, t.tok AS term
  FROM documents, unnest(list_filter(string_split_regex(
      lower(coalesce(text, '')), '[ \\t\\n\\x0B\\f\\r]+'),
      x -> x <> '')) AS t(tok)),
tf AS (SELECT term, doc_id, count(*) AS tf FROM td GROUP BY 1, 2),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        GROUP BY 1 HAVING count(*) <=
            (SELECT greatest(2, count(*) * 4 // 5) FROM documents))
SELECT f.term, d.df,
       string_agg(f.doc_id || ':' || f.tf, ' ' ORDER BY f.doc_id)
           AS postings
FROM tf f JOIN dft d USING (term)
GROUP BY f.term, d.df
"""


def q_unimax_mix(spark, sf_dir):
    """UniMax mixture budgeting (Chung et al. 2023): total token
    budget allocated by sequential fair share with a per-language
    epoch cap — pure-integer recurrence over the languages dim table,
    one corpus groupBy (see functions/unimax.py)."""
    from document_extractor_spark.functions.unimax import (
        unimax_allocation)

    return unimax_allocation(_docs(spark, sf_dir), budget=30000,
                             max_epochs=2)


_ORACLE_UNIMAX = f"""
WITH RECURSIVE
lt AS (
  SELECT coalesce(lang, 'und') AS lang,
         CAST(coalesce(sum(CAST(len(regexp_extract_all(
             text, '{TS.TOKEN_PATTERN}')) AS BIGINT)), 0) AS BIGINT)
         AS t
  FROM documents GROUP BY 1),
ordered AS (
  SELECT lang, t, 2 * t AS cap,
         row_number() OVER (ORDER BY 2 * t, lang) AS rn,
         count(*) OVER () AS n
  FROM lt),
w(rn, remaining, lang, t, alloc) AS (
  SELECT 0, CAST(30000 AS BIGINT), CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  UNION ALL
  SELECT o.rn,
         w.remaining - least(o.cap, w.remaining // (o.n - w.rn)),
         o.lang, o.t,
         least(o.cap, w.remaining // (o.n - w.rn))
  FROM w JOIN ordered o ON o.rn = w.rn + 1)
SELECT lang, t AS n_tokens, alloc AS alloc_tokens
FROM w WHERE rn >= 1
"""


_BLOOM_M = 1 << 20
_BLOOM_K = 4


def _bloom_split(spark, sf_dir):
    """(seen, batch) snapshot split — same md5 doc_id slice as
    q_incremental_dedup so the two membership mechanisms are directly
    comparable on identical inputs."""
    d = _docs(spark, sf_dir)
    slice_char = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.filter(slice_char < "8"), d.filter(slice_char >= "8")


def q_bloom_seen_filter(spark, sf_dir):
    """Bloom-filter membership dedup (Dolma-style, operators/bloom.py):
    the batch side of the snapshot split probes an m-bit bloom built
    over the seen side. Broadcast word table + JVM bit tests; FPs are
    deterministic so the oracle replays the identical decision."""
    from document_extractor_spark.operators.bloom import (
        bloom_seen_filter)

    seen, batch = _bloom_split(spark, sf_dir)
    return bloom_seen_filter(batch, seen, m_bits=_BLOOM_M, k=_BLOOM_K)


def q_bloom_paragraph_dups(spark, sf_dir):
    """Paragraph-level bloom dedup signal (Dolma deduper's second
    mode): per batch doc, non-empty '\\n'-lines and how many are in
    the bloom over the seen corpus's lines."""
    from document_extractor_spark.operators.bloom import (
        paragraph_dup_stats)

    seen, batch = _bloom_split(spark, sf_dir)
    return paragraph_dup_stats(batch, seen, m_bits=_BLOOM_M,
                               k=_BLOOM_K)


# Shared oracle fragments: the double-hash position derivation, and
# the seen/batch doc_id slice.
_BLOOM_POS = ("(('0x'||substr(md5({x}),1,8))::BIGINT "
              "+ r.i * (('0x'||substr(md5({x}),9,8))::BIGINT * 2 + 1)) "
              f"% {_BLOOM_M}")

_ORACLE_BLOOM_SEEN = f"""
WITH h AS (
  SELECT doc_id, coalesce(text, '') AS t,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS slice
  FROM documents),
pos AS (
  SELECT doc_id, slice, {_BLOOM_POS.format(x='t')} AS p
  FROM h, range(0, {_BLOOM_K}) r(i)),
sbits AS (SELECT DISTINCT p FROM pos WHERE slice < '8')
SELECT b.doc_id,
       CAST(min(CASE WHEN s.p IS NOT NULL THEN 1 ELSE 0 END)
            AS INTEGER) AS bloom_hit
FROM pos b LEFT JOIN sbits s USING (p)
WHERE b.slice >= '8'
GROUP BY b.doc_id
"""

_ORACLE_BLOOM_PARAS = f"""
WITH h AS (
  SELECT doc_id,
         string_split(coalesce(text, ''), chr(10)) AS ls,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS slice
  FROM documents),
lines AS (
  SELECT doc_id, slice, unnest(ls) AS para,
         unnest(range(len(ls))) AS li
  FROM h),
nl AS (SELECT * FROM lines WHERE para <> ''),
sbits AS (
  SELECT DISTINCT {_BLOOM_POS.format(x='para')} AS p
  FROM nl, range(0, {_BLOOM_K}) r(i) WHERE slice < '8'),
bpos AS (
  SELECT doc_id, li, {_BLOOM_POS.format(x='para')} AS p
  FROM nl, range(0, {_BLOOM_K}) r(i) WHERE slice >= '8'),
perline AS (
  SELECT doc_id, li,
         min(CASE WHEN s.p IS NOT NULL THEN 1 ELSE 0 END) AS hit
  FROM bpos b LEFT JOIN sbits s USING (p)
  GROUP BY doc_id, li),
perdoc AS (
  SELECT doc_id, count(*) AS n_paras,
         CAST(sum(hit) AS BIGINT) AS n_dup_paras
  FROM perline GROUP BY doc_id)
SELECT h.doc_id,
       coalesce(p.n_paras, 0) AS n_paras,
       coalesce(p.n_dup_paras, 0) AS n_dup_paras
FROM h LEFT JOIN perdoc p USING (doc_id)
WHERE h.slice >= '8'
"""


_OCR_SCHEMA = ("doc_id long, scan_text string, method string, "
               "status string")

# the oracle twin of functions/bitfont.normalize_content: pinned
# whitespace collapse -> space-trim -> non-printable-ASCII to '?'
_OCR_CONTENT = ("regexp_replace(trim(regexp_replace(coalesce(text, "
                "''), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '), "
                "'[^ -~]', '?', 'g')")


def q_wet_export(spark, sf_dir):
    """WET conversion-record export plan (Common Crawl's extracted-
    text format, ISO 28500): per-doc record bytes built entirely from
    JVM string expressions + the canonical md5 shard — shuffle-free;
    the writer (artifacts.write_wet_shards) adds the one shard
    shuffle."""
    from document_extractor_spark.artifacts import wet_records

    return wet_records(_docs(spark, sf_dir), n_shards=16).select(
        "shard", "doc_id",
        F.octet_length("record").cast("long").alias("rec_len"),
        F.md5("record").alias("rec_md5"))


_ORACLE_WET = r"""
WITH w AS (
  SELECT doc_id,
         'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS uri,
         '2026-01-01T00:' ||
         lpad(CAST((doc_id // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
         lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z' AS d,
         coalesce(text, '') AS body
  FROM documents),
r AS (
  SELECT doc_id, uri, d, body,
         md5(uri || chr(10) || d) AS h
  FROM w),
rec AS (
  SELECT doc_id,
         'WARC/1.0' || e'\r\n' || 'WARC-Type: conversion' || e'\r\n'
         || 'WARC-Record-ID: <urn:uuid:' || substr(h, 1, 8) || '-'
         || substr(h, 9, 4) || '-' || substr(h, 13, 4) || '-'
         || substr(h, 17, 4) || '-' || substr(h, 21, 12) || '>'
         || e'\r\n' || 'WARC-Date: ' || d || e'\r\n'
         || 'WARC-Target-URI: ' || uri || e'\r\n'
         || 'Content-Type: text/plain' || e'\r\n'
         || 'Content-Length: '
         || CAST(octet_length(encode(body)) AS VARCHAR)
         || e'\r\n\r\n' || body || e'\r\n\r\n' AS record
  FROM r)
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
            % 16 AS INT) AS shard,
       doc_id,
       CAST(octet_length(encode(record)) AS BIGINT) AS rec_len,
       md5(record) AS rec_md5
FROM rec
"""


def q_softdedup(spark, sf_dir):
    """SoftDedup (He et al. 2024): per-doc data-commonness from the
    hashed-bigram frequency model, normalized inverse-commonness
    sampling weight — downweight duplicate mass instead of deleting
    it (functions/softdedup.py)."""
    from document_extractor_spark.functions.softdedup import (
        softdedup_weights)

    return softdedup_weights(_docs(spark, sf_dir))


_ORACLE_SOFTDEDUP = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[ \\t\\n\\x0B\\f\\r]+'),
                     t -> t <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(g), 1, 4)) AS INT) % 4096
         AS bucket
  FROM (SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1]
                       for i in range(1, len(t))]) AS g
        FROM toks)),
model AS (SELECT bucket, count(*) AS cnt FROM grams GROUP BY bucket),
tot AS (SELECT sum(cnt) AS n FROM model),
perdoc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         round(avg(ln(CAST(m.cnt AS DOUBLE) / t.n)), 4)
         AS mean_log_p
  FROM grams g JOIN model m USING (bucket) CROSS JOIN tot t
  GROUP BY g.doc_id),
mn AS (SELECT min(mean_log_p) AS m FROM perdoc)
SELECT d.doc_id,
       coalesce(p.n_grams, 0) AS n_grams,
       p.mean_log_p,
       -- degenerate-corpus branch mirrors functions/softdedup.py:
       -- min 0.0 (single bucket) or NULL (no grams at all) -> weight
       -- 1.0 where mean_log_p is defined, NULL where it is not
       CASE WHEN mn.m IS NULL OR mn.m = 0.0
            THEN CASE WHEN p.mean_log_p IS NOT NULL THEN 1.0 END
            ELSE round(p.mean_log_p / mn.m, 4) END AS soft_weight
FROM documents d LEFT JOIN perdoc p USING (doc_id) CROSS JOIN mn
"""


def q_ocr_roundtrip(spark, sf_dir):
    """OCR slot (reference E4/E5): render every document as a clean
    machine-font scan PNG, then template-OCR it back — the strict
    OCR-A pass must recover the normalized text byte-identically.
    One fused Arrow stage (render+decode), zero shuffles."""
    import pandas as pd

    from document_extractor_spark.functions.bitfont import render_scan
    from document_extractor_spark.operators.ocr import ocr_page

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                scan = render_scan(text)
                t, method, status = ocr_page(scan)
                rows.append((did, t, method, status))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "scan_text", "method", "status"])

    return (_docs(spark, sf_dir).select("doc_id", "text")
            .mapInPandas(kernel, schema=_OCR_SCHEMA))


_ORACLE_OCR_ROUNDTRIP = f"""
SELECT doc_id, {_OCR_CONTENT} AS scan_text,
       'ocr_a' AS method, 'OK' AS status
FROM documents
"""


def q_ocr_best_of_rotations(spark, sf_dir):
    """OCR-B slot (reference E6, pass_pdf_ocr_b.py:128-165 best-of-
    rotations): doc_id%3==0 pages arrive 180-degree rotated,
    doc_id%3==1 pages carry 2 px of deterministic scanner dirt —
    OCR-A fails both, OCR-B recovers the identical text and the
    method column records which pass accepted each document."""
    import pandas as pd

    from document_extractor_spark.functions.bitfont import (
        normalize_content, render_scan)
    from document_extractor_spark.operators.ocr import ocr_page

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                variant = did % 3
                scan = render_scan(
                    text,
                    rotate=(variant == 0),
                    noise_seed=(str(did) if variant == 1 else None),
                    noise_px=(2 if variant == 1 else 0))
                t, method, status = ocr_page(scan)
                rows.append((did, t, method, status))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "scan_text", "method", "status"])

    return (_docs(spark, sf_dir).select("doc_id", "text")
            .mapInPandas(kernel, schema=_OCR_SCHEMA))


_ORACLE_OCR_ROTATIONS = f"""
SELECT doc_id, {_OCR_CONTENT} AS scan_text,
       CASE WHEN len({_OCR_CONTENT}) = 0 THEN 'ocr_a'
            WHEN doc_id % 3 IN (0, 1) THEN 'ocr_b'
            ELSE 'ocr_a' END AS method,
       'OK' AS status
FROM documents
"""


# ===========================================================================
# BM25 ranked retrieval (round 5)

_BM25_TERMS = ["vector", "stream", "merge", "customer"]


def q_bm25_topk(spark, sf_dir):
    """BM25 top-20 retrieval for a fixed 4-term query. Rational
    RSJ idf (no libm log — rank-equivalent per term, documented
    engine variant), k1=6/5 b=3/4 folded into one int64-over-int64
    fraction per term so every double op (4 divisions + 3 fixed-order
    adds) is identical cross-engine. Stats pass = one 1-row
    aggregate; score pass = projection + TakeOrdered top-k (no
    corpus shuffle, no explode). The gate projects the score as
    floor(bm25 * 1e6) — exact on the engines' identical doubles,
    immune to the decimal round() tie divergence (Spark shortest-repr
    HALF_UP vs DuckDB scaled std::round)."""
    from document_extractor_spark.operators.bm25 import bm25_topk

    out = bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=20)
    return out.select(
        "doc_id", "rank",
        F.floor(F.col("bm25") * F.lit(1000000.0)).cast("long")
        .alias("bm25_micro"))


def _bm25_sql_term(i: int, term: str) -> str:
    tf = f"len(list_filter(k.ts, x -> x = '{term}'))"
    num = f"(2 * s.n - 2 * s.df{i} + 1) * 22 * s.t * {tf}"
    den = (f"(2 * s.df{i} + 1) * (10 * {tf} * s.t + 3 * s.t"
           f" + 9 * s.n * len(k.ts))")
    return f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"


_ORACLE_BM25 = """
WITH toks AS (
  SELECT doc_id,
         coalesce(list_filter(string_split_regex(lower(text),
                  '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> ''), []) AS ts
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(len(ts)), 0) AS BIGINT) AS t,
         {dfs}
  FROM toks),
scored AS (
  SELECT k.doc_id, {score} AS bm25
  FROM toks k CROSS JOIN stats s),
ranked AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM scored WHERE bm25 > 0.0)
SELECT doc_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(bm25 * 1000000.0) AS BIGINT) AS bm25_micro
FROM ranked WHERE rank <= 20
""".format(
    dfs=",\n         ".join(
        f"CAST(coalesce(sum(CASE WHEN list_contains(ts, '{t}') "
        f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS df{i}"
        for i, t in enumerate(_BM25_TERMS)),
    score=" + ".join(
        _bm25_sql_term(i, t) for i, t in enumerate(_BM25_TERMS)),
)


def q_quality_keeper_dedup(spark, sf_dir):
    """Near-dup dedup with the QUALITY-keeper policy: each transitive
    cluster keeps its highest-quality member (tie -> smallest id)
    instead of the smallest id — the policy production dedup wants
    when a clean original and a boilerplate mirror collide. Same
    deterministic edge graph as dedup_clusters (shared closure
    oracle); keeper layer = one component-keyed min-of-struct agg +
    a same-key join (no per-cluster sort)."""
    from document_extractor_spark.operators.components import (
        dedup_decision_keep_best)

    d = _docs(spark, sf_dir).withColumn(
        "q", TS.quality_score(F.col("text")))
    # id-only edge projections read the RAW scan: they carry no heavy
    # compute, so the widen exchange is pure overhead for them
    raw = _docs_raw(spark, sf_dir)
    chain = raw.filter((F.col("doc_id") % 10).isin(0, 1, 2)).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"))
    fuse = raw.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 17).alias("id_b"))
    pairs = chain.unionByName(fuse)
    # trivial id-projection edge plan: a lazy double-eval is cheaper
    # than the input-materialization job
    out = dedup_decision_keep_best(d, pairs, quality_col="q",
                                   materialize_pairs=False)
    return out.select(
        "doc_id", F.col("component").cast("long").alias("component"),
        "q", "is_keeper")


_ORACLE_QUALITY_KEEPER = f"""
WITH RECURSIVE
e0 AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
  WHERE doc_id % 10 IN (0, 1, 2)
  UNION ALL
  SELECT doc_id AS a, doc_id + 17 AS b FROM documents
  WHERE doc_id % 23 = 0),
e AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
reach(src, dst) AS (
  SELECT a, a FROM e
  UNION
  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
comp AS (SELECT src AS node, min(dst) AS component
         FROM reach GROUP BY src),
lab AS (
  SELECT d.doc_id,
         CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
         {_SQL_QUALITY} AS q
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
ranked AS (
  SELECT doc_id, component, q,
         row_number() OVER (PARTITION BY component
                            ORDER BY q DESC NULLS LAST, doc_id ASC) AS rn
  FROM lab)
SELECT doc_id, component, q, (rn = 1) AS is_keeper FROM ranked
"""


def q_csv_index_export(spark, sf_dir):
    """S5/R7 CSV index sink (reference output_writer CSV row per doc,
    common.py:140-155, text cleaned per common_pdf.sh:37 clean_text):
    the rendered QUOTE_ALL CSV line per extracted page row over the
    full pipeline output, checked cell-for-cell against the
    generator's non-circular golden table. Zero shuffles beyond the
    pipeline's own; all string work is JVM `replace`/`concat`."""
    from document_extractor_spark.artifacts import csv_index_lines

    res = _run_entry_extraction(spark)
    ok = res.extracted.filter(F.col("status") == "OK")
    return csv_index_lines(ok).select(
        "url", F.col("page").cast("long").alias("page"), "csv_line")


_ORACLE_CSV_INDEX = f"""
SELECT url,
       TRY_CAST(page AS BIGINT) AS page,
       '"' || regexp_extract(url, '([^/]+)$', 1) || '","'
           || coalesce(CAST(TRY_CAST(page AS BIGINT) AS VARCHAR), '')
           || '","'
           || replace(replace(replace(coalesce(extracted_text, ''),
                                      chr(13), ''),
                              chr(10), '\\n'),
                      '"', '""')
           || '","' || method || '","'
           || CASE WHEN used_fallback THEN 'True' ELSE 'False' END
           || '","'
           || printf('%.4f', reliability)
           || '"' AS csv_line
FROM '{_ENTRY_CORPUS_DIR}/expected.parquet'
"""


def q_single_file_naming(spark, sf_dir):
    """S4 single-file-run naming (reference process_run.py:111-122):
    a run (url host — the batch analog of one watched drop dir) with
    exactly one processable top-level file names its output artifact
    after that file's stem, else after the run. Processable is decided
    by the ENGINE's magic-byte sniff; the oracle derives it from the
    generator's fixture classes (non-circular) — the row only matches
    when sniff routes every payload the way its class says."""
    from document_extractor_spark.artifacts import single_file_run_names

    cdir = _ensure_entry_corpus()
    pages = spark.read.parquet(f"{cdir}/pages.parquet")
    return single_file_run_names(pages)


_ORACLE_SINGLE_FILE = f"""
WITH p AS (
  SELECT url,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS run
  FROM '{_ENTRY_CORPUS_DIR}/pages.parquet'
  WHERE split_part(url, '/', 4) NOT IN ('noise', 'unsupported')),
a AS (
  SELECT run, count(*) AS n_processable,
         min(regexp_replace(regexp_extract(url, '([^/]+)$', 1),
                            '\\.[A-Za-z0-9]{{1,5}}$', '')) AS only_stem
  FROM p GROUP BY run)
SELECT run, n_processable,
       CASE WHEN n_processable = 1 THEN only_stem ELSE run END
           AS output_name
FROM a
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict order matters: the driver's correctness gate checks the FIRST
    # 50 entries.  Round-3 additions (never driver-checked in r3) lead,
    # round-4 additions follow, and long-stable round-1/2 queries that
    # already have green CORRECTNESS_r03 rows are rotated to the back.
    return {
        # --- round-5 additions, never driver-checked ---
        "csv_index_export": q_csv_index_export,
        "single_file_naming": q_single_file_naming,
        # changed-module re-entries: warc_mini (folded headers),
        # artifacts (CSV/WET/S4 additions), charlm (r5 touch)
        "warc_ingest": q_warc_ingest,
        "jsonl_shard_plan": q_jsonl_shard_plan,
        "charlm_cross_entropy": q_charlm_cross_entropy,
        "crawl_to_corpus": q_crawl_to_corpus,
        # --- round-5 additions ---
        "dsir_select": q_dsir_select,
        "semdedup": q_semdedup,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        "inverted_index": q_inverted_index,
        "unimax_mix": q_unimax_mix,
        "bloom_seen_filter": q_bloom_seen_filter,
        "bloom_paragraph_dups": q_bloom_paragraph_dups,
        "ocr_roundtrip": q_ocr_roundtrip,
        "ocr_best_of_rotations": q_ocr_best_of_rotations,
        "softdedup_weights": q_softdedup,
        "wet_export": q_wet_export,
        "bm25_topk": q_bm25_topk,
        "quality_keeper_dedup": q_quality_keeper_dedup,
        # changed-module rotations (policy: any query whose
        # implementing code changed since its last driver-green row
        # re-enters the window): ccnet_buckets was de-skewed this
        # round, incremental_minhash gained the seen_bands parameter,
        # resume_anti_join sits on the reordered checkpoint commit
        "ccnet_buckets": q_ccnet_buckets,
        "incremental_minhash": q_incremental_minhash,
        "resume_anti_join": q_resume_anti_join,
        # connected-components rewrite (star contraction) -> its
        # consumers re-enter the window per the rotation policy
        "dedup_clusters": q_dedup_clusters,
        "neardup_dedup_pipeline": q_neardup_dedup_pipeline,
        "training_corpus_build": q_training_corpus_build,
        # --- round-5 rotation: any query whose implementing module
        # changed since its last driver-green row re-enters the
        # first-50 window (the r4 scorer-dispatch refactor shipped
        # without a driver re-check of these three) ---
        "quality_scores": q_quality_scores,
        "legacy_reliability": q_legacy_reliability,
        "training_filter_pipeline": q_training_filter_pipeline,
        "dom_blocks": q_dom_blocks,
        "hashed_embeddings": q_hashed_embeddings,
        "top_docs_per_source": q_top_docs_per_source,
        "extract_pipeline_full": q_extract_pipeline_full,
        "extract_error_rows": q_extract_error_rows,
        "url_canonical_dedup": q_url_canonical_dedup,
        "paragraph_dedup": q_paragraph_dedup,
        "winnow_fingerprints": q_winnow_fingerprints,
        "media_metadata": q_media_metadata,
        "media_frames": q_media_frames,
        "simhash_fingerprints": q_simhash_fingerprints,
        "simhash_neardup_pairs": q_simhash_neardup_pairs,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        # changed-module re-entries filling the window to 50:
        # extract_branches (low-disk guard + r5 OCR/salvage work) ->
        # office_salvage, cascade_union; sniff (img routing) ->
        # route_dispatch; html_extract (fast-tokenizer micro-opts) ->
        # extract_html_roundtrip; pipeline (OCR cascade routing) ->
        # coverage_summary, granularity_switch; multimodal (TIFF) ->
        # media_features; textnorm (csv_safe_text addition) ->
        # unicode_nfc
        "minhash_dedup_pipeline": q_minhash_dedup_pipeline,
        "office_salvage": q_office_salvage,
        "media_features": q_media_features,
        "unicode_nfc": q_unicode_nfc,
        "cascade_union": q_cascade_union,
        "route_dispatch": q_route_dispatch,
        "extract_html_roundtrip": q_extract_html_roundtrip,
        "coverage_summary": q_coverage_summary,
        "granularity_switch": q_granularity_switch,
        # --- rotated out this round (green r4 driver rows, modules
        # unchanged since): sampling/linkgraph/robots/nbquality/
        # similarity families ---
        "token_budget_sample": q_token_budget_sample,
        "blocklist_filter": q_blocklist_filter,
        "domain_reputation_filter": q_domain_reputation_filter,
        "temperature_mix_sample": q_temperature_mix,
        "nb_quality_classifier": q_nb_quality_classifier,
        "domain_link_graph": q_domain_link_graph,
        "link_pagerank": q_link_pagerank,
        "anchor_text_index": q_anchor_text_index,
        "robots_filter": q_robots_filter,
        # (NB: the actual rows-only set — no SQL twin, independent
        # pytest, justification in COVERAGE.md — is exactly
        # approx_distinct_stats / cdc_chunks / lsh_ann_topk; the two
        # below DO have twins)
        "ivf_ann_topk": q_ivf_ann_topk,
        "eval_holdout": q_eval_holdout,
        "c4_filters": q_c4_filters,
        # --- previously driver-checked (green CORRECTNESS_r03 rows) ---
        "pricing_summary": q_pricing_summary,
        "top_revenue_nations": q_top_revenue_nations,
        "reliability_by_lang": q_reliability_by_lang,
        "median_gate": q_median_gate,
        "max_score_fallback": q_max_score_fallback,
        "chunk_pack_cumsum": q_chunk_pack_cumsum,
        "explode_sentences": q_explode_sentences,
        "best_doc_per_source": q_best_doc_per_source,
        "sessionize_events": q_sessionize_events,
        "heavy_hitters": q_heavy_hitters,
        "shipping_priority": q_shipping_priority,
        "corpus_overview": q_corpus_overview,
        "percentile_stats": q_percentile_stats,
        "approx_distinct_stats": q_approx_distinct_stats,
        "asof_join_purchases": q_asof_join_purchases,
        "range_join_session_overlap": q_range_join_session_overlap,
        "hourly_rollup": q_hourly_rollup,
        "json_props": q_json_props,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_buckets": q_minhash_lsh_buckets,
        "token_stats": q_token_stats,
        "langid": q_langid,
        "repetition_ratios": q_repetition_ratios,
        "vocab_topk": q_vocab_topk,
        "fingerprints": q_fingerprints,
        "token_windows": q_token_windows,
        "streaming_dedup": q_streaming_dedup,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_neardup": q_embedding_neardup,
        "chunk_pack_greedy": q_chunk_pack_greedy,
        "salted_domain_stats": q_salted_domain_stats,
        "order_priority_semi": q_order_priority_semi,
        "customers_left_join": q_customers_left_join,
        "pii_redact": q_pii_redact,
        "line_boilerplate_strip": q_line_boilerplate_strip,
        "gopher_quality": q_gopher_quality,
        "stratified_sample": q_stratified_sample,
        "gopher_repetition": q_gopher_repetition,
        "tfidf_topk": q_tfidf_topk,
        "script_profile": q_script_profile,
        "incremental_dedup": q_incremental_dedup,
        "dup_window_spans": q_dup_window_spans,
        "strip_dup_spans": q_strip_dup_spans,
        "decontaminate": q_decontaminate,
        # rows-only (justified), unchanged since their r4 driver
        # rows; rotated out to keep changed-module queries in the
        # window
        "cdc_chunks": q_cdc_chunks,
        "lsh_ann_topk": q_lsh_ann_topk,
    }


def oracle_sql() -> dict[str, str]:
    # the pipeline oracles read the seeded golden corpus parquet; make
    # sure it exists even if the driver runs the SQL side first
    _ensure_entry_corpus()
    return {
        "extract_html_roundtrip": _ORACLE_ROUNDTRIP,
        "extract_pipeline_full": _ORACLE_PIPELINE_FULL,
        "extract_error_rows": _ORACLE_ERROR_ROWS,
        "office_salvage": _ORACLE_OFFICE_SALVAGE,
        "winnow_fingerprints": _ORACLE_WINNOW,
        "url_canonical_dedup": _ORACLE_URL_DEDUP,
        "paragraph_dedup": _ORACLE_PARA_DEDUP,
        "token_windows": _ORACLE_TOKEN_WINDOWS,
        "streaming_dedup": _ORACLE_STREAM_DEDUP,
        "media_metadata": _ORACLE_MEDIA,
        "media_frames": _ORACLE_MEDIA_FRAMES,
        "media_features": _ORACLE_MEDIA_FEATURES,
        "eval_holdout": _ORACLE_EVAL_HOLDOUT,
        "unicode_nfc": _ORACLE_UNICODE_NFC,
        "ccnet_buckets": _ORACLE_CCNET,
        "c4_filters": _ORACLE_C4,
        "incremental_minhash": _ORACLE_INCR_MINHASH,
        "simhash_fingerprints": _ORACLE_SIMHASH,
        "simhash_neardup_pairs": _ORACLE_SIMHASH_PAIRS,
        "embedding_neardup_lsh": _ORACLE_NEARDUP_LSH,
        "pricing_summary": _ORACLE_PRICING,
        "top_revenue_nations": _ORACLE_TOP_NATIONS,
        "route_dispatch": _ORACLE_ROUTE,
        "reliability_by_lang": _ORACLE_RELIABILITY,
        "median_gate": _ORACLE_MEDIAN_GATE,
        "max_score_fallback": _ORACLE_MAX_FALLBACK,
        "coverage_summary": _ORACLE_COVERAGE,
        "granularity_switch": _ORACLE_GRANULARITY,
        "chunk_pack_cumsum": _ORACLE_CHUNK,
        "resume_anti_join": _ORACLE_RESUME,
        "cascade_union": _ORACLE_CASCADE,
        "explode_sentences": _ORACLE_EXPLODE,
        "best_doc_per_source": _ORACLE_BEST_DOC,
        "sessionize_events": _ORACLE_SESSIONS,
        "training_filter_pipeline": _ORACLE_TRAINING_FILTER,
        "percentile_stats": _ORACLE_PERCENTILE,
        "asof_join_purchases": _ORACLE_ASOF,
        "range_join_session_overlap": _ORACLE_RANGE,
        "hourly_rollup": _ORACLE_HOURLY,
        "json_props": _ORACLE_JSON,
        "dedup_exact": _ORACLE_DEDUP_EXACT,
        "ngram_jaccard": _ORACLE_JACCARD,
        "minhash_signatures": _ORACLE_MINHASH,
        "minhash_lsh_buckets": _ORACLE_LSH,
        "token_stats": _ORACLE_TOKENS,
        "langid": _ORACLE_LANGID,
        "quality_scores": _ORACLE_QUALITY,
        "legacy_reliability": _ORACLE_LEGACY,
        "repetition_ratios": _ORACLE_REPETITION,
        "vocab_topk": _ORACLE_VOCAB,
        "fingerprints": _ORACLE_FINGERPRINT,
        "ann_cosine_topk": _ORACLE_ANN,
        # nprobe == n_cells makes IVF exactly brute force, so the
        # brute-force SQL twin verifies the whole IVF plumbing
        "ivf_ann_topk": _ORACLE_ANN,
        "embedding_neardup": _ORACLE_NEARDUP,
        "chunk_pack_greedy": _ORACLE_CHUNK_GREEDY,
        "salted_domain_stats": _ORACLE_SALTED,
        "order_priority_semi": _ORACLE_SEMI,
        "customers_left_join": _ORACLE_LEFT_JOIN,
        "pii_redact": _ORACLE_PII,
        "line_boilerplate_strip": _ORACLE_LINE_STRIP,
        "gopher_quality": _ORACLE_GOPHER,
        "stratified_sample": _ORACLE_STRATIFIED,
        "dedup_clusters": _ORACLE_CLUSTERS,
        "gopher_repetition": _ORACLE_REP_GOPHER,
        "neardup_dedup_pipeline": _ORACLE_NEARDUP_PIPELINE,
        "minhash_dedup_pipeline": _ORACLE_MINHASH_PIPELINE,
        "tfidf_topk": _ORACLE_TFIDF,
        "script_profile": _script_oracle_sql(),
        "training_corpus_build": _corpus_build_oracle(),
        "incremental_dedup": _ORACLE_INCREMENTAL,
        "dup_window_spans": _ORACLE_DUP_SPANS,
        "strip_dup_spans": _ORACLE_STRIP_SPANS,
        "decontaminate": _ORACLE_DECONTAM,
        "token_budget_sample": _ORACLE_TOKEN_BUDGET,
        "blocklist_filter": _ORACLE_BLOCKLIST,
        "domain_reputation_filter": _ORACLE_DOMAIN_REP,
        "warc_ingest": _ORACLE_WARC,
        "jsonl_shard_plan": _ORACLE_JSONL,
        "charlm_cross_entropy": _ORACLE_CHARLM,
        "temperature_mix_sample": _ORACLE_TEMPERATURE,
        "nb_quality_classifier": _ORACLE_NB,
        "domain_link_graph": _ORACLE_LINK_GRAPH,
        "link_pagerank": _ORACLE_PAGERANK,
        "anchor_text_index": _ORACLE_ANCHORS,
        "crawl_to_corpus": _ORACLE_CRAWL_CORPUS,
        "robots_filter": _ORACLE_ROBOTS,
        "heavy_hitters": _ORACLE_HEAVY,
        "shipping_priority": _ORACLE_Q3,
        "corpus_overview": _ORACLE_OVERVIEW,
        "dom_blocks": _ORACLE_DOM_BLOCKS,
        "hashed_embeddings": _embed_oracle_sql(),
        "top_docs_per_source": _ORACLE_TOP_DOCS,
        "dsir_select": _ORACLE_DSIR,
        "semdedup": _ORACLE_SEMDEDUP,
        "cluster_balanced_sample": _ORACLE_CLUSTER_BALANCE,
        "inverted_index": _ORACLE_INVERTED_INDEX,
        "unimax_mix": _ORACLE_UNIMAX,
        "bloom_seen_filter": _ORACLE_BLOOM_SEEN,
        "bloom_paragraph_dups": _ORACLE_BLOOM_PARAS,
        "ocr_roundtrip": _ORACLE_OCR_ROUNDTRIP,
        "ocr_best_of_rotations": _ORACLE_OCR_ROTATIONS,
        "softdedup_weights": _ORACLE_SOFTDEDUP,
        "wet_export": _ORACLE_WET,
        "bm25_topk": _ORACLE_BM25,
        "quality_keeper_dedup": _ORACLE_QUALITY_KEEPER,
        "csv_index_export": _ORACLE_CSV_INDEX,
        "single_file_naming": _ORACLE_SINGLE_FILE,
    }
