"""TF-IDF keyword extraction: top-k salient terms per document.

A corpus-statistics operator training pipelines use for topic
profiling, dedup explainability, and cheap keyword tagging. Fully
distributed:

  explode(tokens) -> groupBy(doc, term) tf     [shuffle 1, keyed on
                                                (doc, term) — a hot
                                                term still shards by
                                                doc]
  groupBy(term) document-frequency             [shuffle 2]
  tf JOIN df ON term                           [same key as shuffle 2]
  row_number window per doc                    [shuffle 3, keyed doc]

idf is the SMOOTHED RATIO (N+1)/(df+1), not its logarithm: log is
monotonic so per-doc ranking is identical, but libm ln() differs in
the last ulp across engines, which would make an exact value-hash
comparison flaky. With rational arithmetic the scores are exact IEEE
doubles in both Spark and DuckDB. (Callers who want log-scaled
scores apply F.log to the score column; ranking is unchanged.)

Ties break by term ascending — fully deterministic output.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


def tfidf_topk(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 5) -> DataFrame:
    """(id, rank, term, score): the k highest tf*idf terms per doc.

    N is the total corpus row count (including empty/NULL-text docs:
    they contribute no terms but are part of the collection the
    df statistic is over).
    """
    n_docs = docs.count()  # one metadata-scale scalar, not a collect
    terms = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df derived from tf, not recomputed from raw occurrences: tf is
    # already one row per (doc, term), so a plain count per term IS
    # the document frequency — no second tokenize/explode pass and no
    # countDistinct expansion over every occurrence
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "term")
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.lit(float(n_docs + 1)) / (F.col("df") + 1)))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(id_col), F.col("rank").cast("long").alias("rank"),
                "term", F.round("score", 6).alias("score"))
    )
