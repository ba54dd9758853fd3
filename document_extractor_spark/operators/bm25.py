"""BM25 ranked retrieval over the corpus: score every document
against a fixed query-term list and return the global top-k.

Training pipelines use this for targeted corpus slicing ("give me the
documents most about X") and decontamination triage; it is also the
standard relevance baseline any retrieval-augmented data tool needs.

Scale design (zero explode, zero corpus shuffle):

  stats pass : ONE full-scan aggregate -> a single row
               (N docs, T total tokens, df per query term).  The
               query-term list is user-sized (a handful of terms), so
               the collected row is a dim-bounded plan-building scalar
               (CLAUDE.md collect rule).  At 10^12 docs this pass is a
               map-side-combined agg with a 1-row result; the stats
               are also the natural precomputable artifact (corpus
               token totals + a term->df dictionary).
  score pass : per-row projection (size/filter on the token array,
               all JVM array functions — no Python stage) followed by
               a global top-k, which Spark executes as TakeOrdered
               (per-partition heap + driver merge of k rows), NOT a
               total sort.

Exactness (the oracle value-hash must match DuckDB bit for bit):
BM25's textbook idf is a log, and libm ln() differs across engines in
the last ulp — worse than tf-idf, BM25 SUMS per-term scores, so a
monotonic substitution must be applied per term *before* the sum and
documented as this engine's scoring variant.  We therefore use the
RATIONAL Robertson-Sparck-Jones idf (N - df + 0.5)/(df + 0.5) without
the log (same signal, rank-equivalent per term), and fold the whole
term score into ONE integer-over-integer fraction:

  k1 = 6/5, b = 3/4 (the classic 1.2 / 0.75 — exact rationals)

            (2N - 2df + 1) * 22 * T * tf
  s_term = ------------------------------------
            (2df + 1) * (10*tf*T + 3*T + 9*dl*N)

derived from idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
avgdl = T/N and every denominator cleared.  Numerator and denominator
are exact int64 products (bounds: at sf0.1, N=10^4, T~3*10^6, tf<100
=> num < 2^49, den < 2^45; both < 2^53, so the int->double casts are
exact and the single division is the correctly-rounded IEEE quotient
in every engine).  The per-term scores are then summed in a FIXED
left-to-right order — the same f64 operation sequence on both sides,
hence bit-identical sums.

At larger corpora than the tested SFs the int64 products approach
2^53; the production escape hatch is DECIMAL(38,0) intermediates
(the same trick functions/sampling.py uses for weight lattices),
which changes nothing about the plan shape.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def corpus_term_stats(docs: DataFrame, terms: list[str],
                      text_col: str = "text") -> dict:
    """One-pass corpus statistics for BM25: {'n': N, 't': total
    tokens, 'df': {term: document frequency}}.  Single full-scan
    aggregate, 1-row result."""
    toks = F.coalesce(tokens_col(text_col), F.array())
    aggs = [F.count("*").alias("n"),
            F.sum(F.size(toks)).alias("t")]
    for i, term in enumerate(terms):
        aggs.append(F.sum(
            F.array_contains(toks, term).cast("long")).alias(f"df{i}"))
    row = docs.agg(*aggs).collect()[0]
    return {"n": int(row["n"]), "t": int(row["t"] or 0),
            "df": {term: int(row[f"df{i}"] or 0)
                   for i, term in enumerate(terms)}}


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              stats: dict | None = None) -> DataFrame:
    """(id, rank, bm25): the k best-scoring documents for `terms`,
    ties broken by id ascending; zero-score (no-match) docs excluded.

    `stats` (from corpus_term_stats) may be supplied precomputed —
    the production shape, where the token-total/df dictionary is a
    maintained artifact — otherwise one stats pass runs here.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if stats is None:
        stats = corpus_term_stats(docs, terms, text_col)
    n, t = stats["n"], stats["t"]
    if t <= 0:
        return (docs.sparkSession.createDataFrame(
            [], f"{id_col} long, rank long, bm25 double"))

    def _long(x: int):
        # literals small enough for int32 otherwise become IntegerType
        # and the products overflow under ANSI mode — pin every
        # operand to int64 so the integer lattice is uniform
        return F.lit(x).cast("long")

    toks = F.coalesce(tokens_col(text_col), F.array())
    dl = F.size(toks).cast("long")
    score = None
    for term in terms:
        df_t = stats["df"][term]
        tf = F.size(F.filter(toks, lambda x: x == F.lit(term))) \
            .cast("long")
        num = _long((2 * n - 2 * df_t + 1) * 22 * t) * tf
        den = (_long(2 * df_t + 1)
               * (_long(10 * t) * tf + _long(3 * t)
                  + _long(9 * n) * dl))
        s = num.cast("double") / den.cast("double")
        score = s if score is None else (score + s)

    scored = (docs.select(F.col(id_col), score.alias("bm25"))
              .filter(F.col("bm25") > 0.0)
              .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
              .limit(k))
    # rank assignment over k collected-size rows: a window over the
    # already-limited frame (k rows, single partition — bounded)
    from pyspark.sql import Window
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    # raw double out: the score is a deterministic function of the
    # integer lattice (identical num/den longs -> identical IEEE
    # division and left-fold sum), so no decimal rounding is applied
    # here — decimal ties under round() are engine-dependent (Spark
    # shortest-repr HALF_UP vs DuckDB scaled std::round); the gated
    # query projects floor(bm25 * 1e6) instead, which is exact on
    # identical doubles
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")).select(
        id_col, "rank", "bm25")


def inverted_index(docs: DataFrame, max_df: int,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """`(term, df, postings)` — the retrieval-index build artifact:
    one row per vocabulary term with document frequency and the
    doc-sorted posting list rendered as `"id:tf id:tf ..."`.

    `max_df` drops stop-grade terms BEFORE their postings are
    collected (the standard IR stop-list-by-df rule, and the whale
    guard: a term in half the corpus would otherwise collect a
    posting array the size of the corpus into one row). The string
    rendering keeps the result driver-canonicalizable (top-level
    arrays crash the gate's pandas sort — the r4 hashed_embeddings
    lesson).

    Scale shape: one (term, doc)-keyed corpus shuffle for tf (key
    includes the doc, so a whale TERM still shards), one term-keyed
    map-side-combined count for df (whale state = one counter), and
    the posting collect runs only on df<=max_df survivors, bounding
    every collect_list at max_df structs.
    """
    if max_df < 1:
        raise ValueError("max_df must be >= 1")
    tf = (docs
          .select(F.col(id_col), F.explode(tokens_col(text_col))
                  .alias("term"))
          .groupBy("term", id_col)
          .agg(F.count("*").alias("tf")))
    df_t = (tf.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df))
    return (tf.join(df_t, "term")
            .groupBy("term", "df")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col(id_col).alias("d"),
                                 F.col("tf").alias("t")))),
                    lambda s: F.concat(s["d"].cast("string"),
                                       F.lit(":"),
                                       s["t"].cast("string"))),
                " ").alias("postings"))
            .select("term", "df", "postings"))
