"""Character-bigram language-model scoring (perplexity-proxy filter).

The CCNet/KenLM slot in LLM data pipelines: score each document by
its cross-entropy under a corpus-level language model and filter the
tail. A real KenLM is an external artifact; the from-scratch,
dependency-free analog that preserves the pipeline SHAPE is a
character-bigram LM estimated from the corpus itself:

  pass 1  corpus LM:   explode char bigrams -> count per bigram
                       (one shuffle; cardinality is bounded by
                       charset^2, so the LM is a small dim table)
  pass 2  doc scoring: per-doc bigram counts joined against the
                       BROADCAST LM -> cross-entropy in bits/bigram
                       H(d) = -1/|d| * sum_b n_b(d) * log2 p(b)

Laplace smoothing (add-1 over the observed vocab) keeps unseen
bigrams finite. Gibberish / wrong-language / binary-ish text scores
high bits-per-bigram; fluent text in the corpus's dominant languages
scores low — same decision surface as the reference pipeline's
ascii-density gate (common_pdf.sh scoring block) but
distribution-aware.

Everything is JVM Column work: bigram generation is a
sequence+substring transform, never a Python UDF. At 100 TB the LM
pass is one map-side-combined groupBy on a low-cardinality key and
pass 2 is a broadcast join — no corpus re-shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_bigrams(text_col) -> F.Column:
    """Array of character bigrams of `text_col` (JVM expression).

    A doc with fewer than 2 chars yields an empty array. NULL text
    yields NULL (callers coalesce or filter).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], so the
    # short-text case must be gated explicitly, not clamped
    return F.when(
        F.length(c) >= 2,
        F.transform(F.sequence(F.lit(1), F.length(c) - 1),
                    lambda i: c.substr(i, F.lit(2)))
    ).otherwise(F.when(c.isNotNull(), F.array().cast("array<string>")))


def corpus_bigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1: the corpus bigram count table `(bigram, c)`.

    One shuffle on `bigram`; partial aggregation makes the map side
    emit at most charset^2 rows per task regardless of corpus size.
    """
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(char_bigrams(text_col)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c"))
    )


def bigram_cross_entropy(
    docs: DataFrame,
    lm: DataFrame | None = None,
    key_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 4,
    checkpoint_result: bool = True,
) -> DataFrame:
    """Per-doc cross-entropy in bits/bigram:
    `(key_col, n_bigrams, bits_per_bigram)`.

    Laplace add-1 smoothing over the observed vocab V:
    p(b) = (c_b + 1) / (N + V). Docs with no bigrams (empty/NULL
    text) come back with n_bigrams=0 and NULL bits.

    Two modes:

    - ``lm=None`` (self-scoring, the common corpus-filter case):
      ONE pass over the corpus — explode bigrams, aggregate
      per-(doc, bigram) counts, and derive the LM from that SAME
      pairs table (it is docs×vocab-bounded, orders smaller than the
      occurrence stream), then broadcast-join the driver-local LM
      back onto the cached pairs. With ``checkpoint_result`` the
      small per-doc result is materialized eagerly and the pairs
      cache is released before returning — no session-lifetime cache
      leak, no second corpus scan. (At 10^12 docs pass
      ``checkpoint_result=False`` and manage the write yourself —
      localCheckpoint would spill the full result to local disk;
      that mode keeps NOTHING persisted, so consuming the live plan
      twice re-explodes the corpus — the price of leaving the caller
      a leak-free plan.)
    - explicit ``lm`` (cross-corpus: score probe docs under a model
      estimated elsewhere): the LM is collected (charset^2-bounded)
      and broadcast; the probe corpus is exploded once.
    """
    own_pairs = None
    if lm is None:
        # self-scoring: per-(doc, bigram) counts drive BOTH the LM
        # and the scoring, so the corpus is exploded once. The pairs
        # table is persisted ONLY when the result will be
        # checkpointed (then the cache is released before return);
        # with checkpoint_result=False nothing may stay persisted —
        # the caller has no handle to release it — so the second
        # evaluation simply re-explodes the corpus (documented cost
        # of keeping a live plan).
        pairs = (
            docs.select(key_col, F.explode_outer(
                char_bigrams(text_col)).alias("bigram"))
            .groupBy(key_col, "bigram")
            .agg(F.count("*").alias("n_b"))
        )
        if checkpoint_result:
            pairs = pairs.persist()
            own_pairs = pairs
        lm_src = pairs.filter(F.col("bigram").isNotNull()) \
            .groupBy("bigram").agg(F.sum("n_b").alias("c"))
        scored_src = pairs
        weight = F.col("n_b")
    else:
        # explicit LM (cross-corpus probe scoring): sum bits per
        # OCCURRENCE straight into the doc groupBy — a (doc, bigram)
        # pre-aggregation here would add a full-corpus shuffle for
        # nothing (Σ_occurrences bits == Σ_b n_b·bits_b)
        lm_src = lm
        scored_src = docs.select(key_col, F.explode_outer(
            char_bigrams(text_col)).alias("bigram"))
        weight = F.lit(1)
    lm_rows = [(r.bigram, int(r.c)) for r in lm_src.collect()]
    n_total = sum(c for _, c in lm_rows)
    vocab = len(lm_rows)
    denom = float(max(n_total + vocab, 1))  # empty-LM guard
    lm_local = docs.sparkSession.createDataFrame(
        lm_rows, "bigram string, c long")

    joined = scored_src.join(F.broadcast(lm_local), "bigram", "left") \
        if lm_rows else scored_src.withColumn(
            "c", F.lit(None).cast("long"))
    bits = -F.log2((F.coalesce(F.col("c"), F.lit(0)) + 1) / denom)
    result = (
        joined.groupBy(key_col)
        .agg(
            F.sum(F.when(F.col("bigram").isNotNull(),
                         weight).otherwise(0)).alias("n_bigrams"),
            F.sum(F.when(F.col("bigram").isNotNull(),
                         weight * bits)).alias("_total_bits"))
        .select(
            key_col,
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("_total_bits") / F.col("n_bigrams"),
                        round_dp)).alias("bits_per_bigram"))
    )
    if own_pairs is not None:
        result = result.localCheckpoint(eager=True)
        own_pairs.unpersist(blocking=False)
    return result


def ccnet_tertile_buckets(
    scored: DataFrame,
    key_col: str = "doc_id",
    lang_col: str = "lang",
    score_col: str = "bits_per_bigram",
) -> DataFrame:
    """Per-language tertile bucket (`head`/`middle`/`tail`) with
    EXACT `ntile(3) OVER (PARTITION BY lang ORDER BY score, key)`
    semantics — but zero corpus-sized sorts.

    `ntile(3) OVER (PARTITION BY lang ...)` is the skewed-key
    scale-killer the r4 verdict flagged: a dominant language (≈half a
    real crawl) becomes ONE task sorting ~50 TB.  This formulation
    exploits the bounded score cardinality (`score_col` is 4dp-rounded
    ⇒ ≤ a few hundred thousand distinct values per language):

      1. histogram — groupBy(lang, score).count(): map-side combined,
         the shuffle carries only the bounded histogram rows;
      2. per-language cumulative counts + ntile cutoffs q1/q2 over the
         HISTOGRAM (a dim-table window, never the corpus);
      3. broadcast the histogram back onto the corpus: any (lang,
         score) tie-group lying entirely inside one tertile — all but
         ≤2 groups per language — gets its bucket by pure comparison,
         no sort, no shuffle;
      4. only the ≤2 boundary tie-groups per language (the groups the
         cutoff bisects) need the within-group `row_number()` ordered
         by `key_col` — partitioned by (lang, score), so the window
         state is one tie-group, and row_number streams.

    The fixpoint matches ntile exactly (pinned by the DuckDB oracle
    and a skewed-fixture pytest): rank(row) = cum_before(group) +
    row_number within group, bucket 1 iff rank<=q1, 2 iff rank<=q2.
    Rows must have a non-NULL `score_col` (callers route no-signal
    docs around the bucketing, as `q_ccnet_buckets` does).
    """
    from pyspark.sql import Window

    nz = scored
    hist = nz.groupBy(lang_col, score_col).agg(F.count("*").alias("_cnt"))
    hw = Window.partitionBy(lang_col).orderBy(score_col)
    # per-lang total rides a second window over the SAME partitioning
    # (no join back to a separate totals aggregate — that would
    # recompute the corpus histogram once per consumer branch)
    hist = (
        hist
        .withColumn(
            "_cum_before",
            F.coalesce(F.sum("_cnt").over(hw) - F.col("_cnt"), F.lit(0)))
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy(lang_col)))
    )
    # ntile(3) bucket sizes: base=n div 3, rem=n mod 3; bucket i gets
    # base + (i<=rem). q1/q2 = cumulative sizes of buckets 1 / 1+2.
    base, rem = F.col("_n") / 3, F.col("_n") % 3
    lo, hi = F.col("_cum_before"), F.col("_cum_before") + F.col("_cnt")
    h = (
        hist
        .withColumn(
            "_q1", F.floor(base) + F.when(rem >= 1, 1).otherwise(0))
        .withColumn("_q2", 2 * F.floor(base) + F.least(rem, F.lit(2)))
        .withColumn(
            "_ib",
            F.when(hi <= F.col("_q1"), 1)
            .when((lo >= F.col("_q1")) & (hi <= F.col("_q2")), 2)
            .when(lo >= F.col("_q2"), 3))
        .drop("_n")
    )
    # the histogram feeds BOTH the interior and boundary branches of
    # the corpus join below; it is score-cardinality-bounded (dim
    # table), so materialize it once instead of re-running the corpus
    # groupBy per branch
    h = h.localCheckpoint(eager=True)
    tagged = nz.join(F.broadcast(h), [lang_col, score_col])
    interior = tagged.filter(F.col("_ib").isNotNull()).withColumn(
        "_bucket", F.col("_ib"))
    bw = Window.partitionBy(lang_col, score_col).orderBy(key_col)
    boundary = (
        tagged.filter(F.col("_ib").isNull())
        .withColumn("_rank", F.col("_cum_before") + F.row_number().over(bw))
        .withColumn("_bucket",
                    F.when(F.col("_rank") <= F.col("_q1"), 1)
                    .when(F.col("_rank") <= F.col("_q2"), 2)
                    .otherwise(3))
        .drop("_rank"))
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    out_cols = [F.col(c) for c in nz.columns]
    return (
        interior.unionByName(boundary)
        .select(*out_cols,
                F.element_at(names, F.col("_bucket")).alias("bucket"))
    )
