"""Temporal joins Spark lacks natively: as-of join and range join.

Both are built so the physical plan is a plain shuffle-hash/sort-merge
EQUI-join or window — never BroadcastNestedLoopJoin / CartesianProduct,
which is what a naive `ON a.ts >= b.ts` or `BETWEEN` condition degrades
to and what dies first at 10^12 rows.

- as-of join: union the two inputs, one window pass per partition key
  (`last(value, ignorenulls=True)` over rows up to the current one).
  Exactly one shuffle, on the `by` key — the same cost as any keyed agg.
- range join: decompose intervals into fixed-width bins (explode), bin
  the points, equi-join on the bin, re-check the exact predicate. Each
  point lives in exactly one bin so no pair can match twice. Work is
  O(points + intervals * bins_per_interval + true_matches).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id",
              value_cols: tuple[str, ...] = ("value",)) -> DataFrame:
    """For each left row, attach `value_cols` from the right row with
    the greatest `on` <= left's `on` within the same `by` group
    (pandas merge_asof(direction="backward") / DuckDB ASOF JOIN
    semantics, equal timestamps match). Left rows with no prior right
    row keep nulls.

    Carried columns keep their right-side names and must not clash
    with left's columns (rename on the right input first).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols clash with left columns: {clash}")
    # ONE struct per right row, not per-column last(ignorenulls): the
    # per-column form skips right rows whose individual value is NULL,
    # carrying a STALE older value and even tearing value_cols across
    # different right rows — merge_asof attaches the latest right ROW
    # atomically, nulls included. The struct is non-null whenever the
    # row exists, so last(ignorenulls) picks rows, not values.
    # merge_asof also rejects null keys; drop null-`on` right rows.
    rt = (
        right.select(by, on, *value_cols)
        .filter(F.col(on).isNotNull())
        .withColumn("_r", F.struct(*[F.col(c) for c in value_cols]))
        .drop(*value_cols)
        .withColumn("_is_left", F.lit(0))
    )
    lt = left.withColumn("_is_left", F.lit(1))
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal `on`, so ties match;
    # `_r` (the whole value struct) as the final tiebreak makes the
    # carried row DETERMINISTIC when several right rows share the
    # same (by, on) key — without it, last() took whichever duplicate
    # the shuffle happened to deliver last (retries could flip it)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc(),
                 F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    out = u.filter(F.col("_is_left") == 1).drop("_is_left")
    for c in value_cols:
        out = out.withColumn(c, F.col("_r")[c])
    return out.drop("_r")


def range_join_bins(points: DataFrame, intervals: DataFrame,
                    point_col: str, start_col: str, end_col: str,
                    bin_width: int) -> DataFrame:
    """Inner join of points to every interval containing them
    (start <= point <= end), as an equi-join on fixed-width bins.
    All three columns must be numeric in the same unit (cast
    timestamps with unix_micros first); bin_width in that unit —
    pick it near the typical interval length so each interval spans
    O(1) bins. Output: all interval columns + all point columns.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    # inverted intervals (end < start) are dropped BEFORE the
    # explode: Spark's sequence(a, b) with a > b runs DESCENDING
    # (pinned repo trap), so one corrupt row would explode
    # (start-end)/bin_width bins instead of zero — and the SQL
    # BETWEEN twin matches nothing for such a row anyway
    iv = intervals.filter(
        F.col(start_col) <= F.col(end_col)).withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / bin_width),
            F.floor(F.col(end_col) / bin_width))))
    pt = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    return (
        iv.join(pt, "_bin")
        .filter((F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) <= F.col(end_col)))
        .drop("_bin")
    )
