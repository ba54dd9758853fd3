"""Skew-safe per-group top-k selection.

`row_number() OVER (PARTITION BY group ORDER BY ...) <= k` is correct
but shuffles every row of a group into one task; a dominant group
(half the corpus behind one source/domain) becomes a single straggler
sorting ~50 TB. The standard two-phase rewrite keeps the result
IDENTICAL while bounding every task's input:

  phase 1  bucket rows by a hash of a high-cardinality column and
           take the top-k within each (group, bucket) — partitions
           are group-size/B, and the per-partition state is k rows
           (row_number streams over the sort);
  phase 2  re-rank the surviving <= B*k rows per group — now a
           dim-bounded partition regardless of the original skew.

Equivalence: every row of the true per-group top-k is, a fortiori,
in the top-k of whatever bucket it hashed into, so phase 1 never
drops a winner; phase 2 then computes the exact global ranks.
Ordering must be total (include a unique tie-break column) for ranks
to be deterministic — same requirement the single-window form has.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skew_safe_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
    rank_name: str = "rank",
) -> DataFrame:
    """Rows of the per-`group_cols` top-`k` under `order_cols`, with
    their 1-based rank in `rank_name` — byte-identical to the naive
    `row_number() OVER (PARTITION BY group ORDER BY ...) <= k` window
    but never sorting a group-wide partition.

    `order_cols` must totally order rows within a group (append a
    unique id as tie-break); `bucket_col` should be high-cardinality
    (the unique id is the natural choice).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    b = df.withColumn(
        "_tkb", F.pmod(F.hash(F.col(bucket_col)), F.lit(n_buckets)))
    w1 = Window.partitionBy(*group_cols, "_tkb").orderBy(*order_cols)
    pre = (
        b.withColumn("_tkr", F.row_number().over(w1))
        .filter(F.col("_tkr") <= k)
        .drop("_tkb", "_tkr")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        pre.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )
