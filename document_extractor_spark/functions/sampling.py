"""Deterministic hash-based sampling for corpus construction.

Training-data pipelines need REPRODUCIBLE downsampling — `rand()` is
non-deterministic across retries, task re-execution, and engines, so
a failed stage re-sampled differently corrupts the corpus. The
standard fix: hash a stable key and keep rows whose hash falls under
a rate threshold. The same (key, rate) always keeps the same rows, on
any cluster size, in any engine, on any retry.

Mechanism: the first `precision` hex chars of md5(key) are compared
LEXICOGRAPHICALLY against a threshold string — a pure string compare
that Spark (JVM md5) and DuckDB (RE2-side md5) evaluate identically,
with rates quantized to 1/16^precision (1/65536 at the default 4).
No conv()/bigint casts, so the expression stays portable and
codegen-resident; sampling is a FILTER — zero shuffles, combinable
with any downstream op.

Stratified variant: per-stratum rates (e.g. downsample a dominant
domain, keep all of a rare language) via one literal CASE over the
stratum column.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_threshold(rate: float, precision: int = 4) -> str:
    """Threshold string for `rate` in [0, 1].

    'g' sorts above every hex char, so rate>=1 keeps everything;
    rates are floored to 1/16^precision granularity.
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return format(int(rate * (16 ** precision)), f"0{precision}x")


def hash_bucket(key: Column, precision: int = 4) -> Column:
    """The sampling key: first `precision` hex chars of md5(key)."""
    return F.substring(F.md5(key.cast("string")), 1, precision)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                precision: int = 4) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, keyed on
    `key_col`. Idempotent and engine-portable (see module doc)."""
    return df.filter(
        hash_bucket(F.col(key_col), precision)
        < F.lit(hash_threshold(rate, precision)))


def stratified_hash_sample(df: DataFrame, key_col: str,
                           strata_col: str,
                           rates: dict[str, float],
                           default_rate: float = 1.0,
                           precision: int = 4) -> DataFrame:
    """Per-stratum deterministic sampling: `rates` maps stratum value
    -> keep fraction; unlisted strata use `default_rate`.

    The rate table becomes a literal CASE expression (strata sets are
    small — domains, languages, sources), so the whole sample is one
    codegen filter: no join, no shuffle, no rate-table broadcast."""
    thr = F.lit(hash_threshold(default_rate, precision))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(hash_threshold(rate, precision))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), precision) < thr)


def token_budget_sample(df: DataFrame, key_col: str, strata_col: str,
                        n_tokens_col: str, budget: int,
                        budgets: dict[str, int] | None = None,
                        bucket_chars: int = 2) -> DataFrame:
    """Quota sampling to a TOKEN budget: within each stratum, walk the
    docs in deterministic md5(key) order and keep them until the
    stratum's cumulative token count exceeds the budget (inclusive:
    a doc is kept iff the running total *through it* fits). This is
    the budget-shaped companion to `stratified_hash_sample` — rates
    rebalance proportions, budgets hit an absolute token target per
    language/source (the knob a data-mixture spec actually states).

    Returns (key_col, strata_col, n_tokens_col, cum_tokens, kept) for
    every input row — the decision table; callers filter kept.
    Deterministic on any cluster size / retry / engine: the walk
    order is the md5 hex string, and keeping a prefix of that order
    inherits hash_sample's nested-subset property (a smaller budget's
    keep-set is a subset of a larger one's).

    Scale shape (10^12 docs): the naive form is ONE window partitioned
    by stratum — a dominant language would serialize on a single
    task. Instead, a two-phase distributed prefix sum: bucket each
    row by the first `bucket_chars` hex chars OF THE SAME sort hash
    (so bucket order is consistent with walk order); per-(stratum,
    bucket) token totals (one small groupBy) get per-bucket offsets
    via a window over that TINY table (16^bucket_chars rows per
    stratum); offsets broadcast back and the heavy cumsum window
    partitions by (stratum, bucket) — 256x the parallelism at the
    default, more by raising bucket_chars. 3 shuffles, of which only
    two touch the corpus; zero Python stages.
    """
    h = F.md5(F.col(key_col).cast("string"))
    d = df.select(
        F.col(key_col), F.col(strata_col), F.col(n_tokens_col),
        h.alias("_hk"), F.substring(h, 1, bucket_chars).alias("_bk"))
    btot = (d.groupBy(strata_col, "_bk")
            .agg(F.sum(n_tokens_col).alias("_btot")))
    wb = Window.partitionBy(strata_col).orderBy("_bk")
    offs = btot.withColumn(
        "_boff",
        F.coalesce(F.sum("_btot").over(
            wb.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    thr = F.lit(int(budget))
    for value, b in sorted((budgets or {}).items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(int(b))).otherwise(thr)
    # key_col as the cumsum tiebreaker: duplicate keys share an
    # identical md5, and a tie-broken-by-arrival window would flip
    # kept/cum_tokens between retries (exact_stratum_holdout does the
    # same for the same reason)
    ww = Window.partitionBy(strata_col, "_bk").orderBy(
        "_hk", F.col(key_col), F.col(n_tokens_col))
    offs_d = offs.select(
        F.col(strata_col).alias("_os"), F.col("_bk").alias("_ob"),
        "_boff")
    return (
        # eqNullSafe: a NULL stratum is a legitimate group (missing
        # lang id) — the name-list equi-join silently DROPPED those
        # rows from the decision table, violating the every-input-row
        # contract (temperature_mix_sample already handles NULL strata
        # the same way)
        d.join(F.broadcast(offs_d),
               F.col(strata_col).eqNullSafe(F.col("_os"))
               & F.col("_bk").eqNullSafe(F.col("_ob")))
        .drop("_os", "_ob")
        .withColumn(
            "cum_tokens",
            (F.col("_boff") + F.sum(n_tokens_col).over(
                ww.rowsBetween(Window.unboundedPreceding, 0)))
            .cast("long"))
        .select(
            F.col(key_col), F.col(strata_col),
            F.col(n_tokens_col).cast("long").alias(n_tokens_col),
            F.col("cum_tokens"),
            (F.col("cum_tokens") <= thr).alias("kept")))


def temperature_mix_sample(df: DataFrame, key_col: str, strata_col: str,
                           target_frac_num: int = 1,
                           target_frac_den: int = 2,
                           weight_scale: int = 1000,
                           precision: int = 4) -> DataFrame:
    """Temperature-based mixture rebalancing at alpha = 0.5 (the
    data-mixture standard: sample domain d with probability
    proportional to n_d^alpha, so dominant domains are downweighted
    and tail domains upweighted relative to their natural share).

    Per-stratum keep threshold, ALL-INTEGER so every engine agrees
    bit-for-bit (no float pow/sum whose last-ulp order dependence
    could flip a threshold):

        w_d  = isqrt(n_d * weight_scale^2)        # = floor(s*sqrt(n))
        T    = N * target_frac_num // target_frac_den
        t_d  = min(16^precision,
                   T * w_d * 16^precision // (S * n_d)),  S = sum w_d

    keep iff the first `precision` md5 hex chars of the key, as an
    integer, are < t_d — the same deterministic, retry-stable,
    engine-portable decision as `hash_sample`.

    Returns the decision table (key, stratum, n_d, keep_thr, kept)
    for every row. The stratum count table is collected to the
    driver and re-emitted as one literal CASE expression, so the
    corpus sees ONE groupBy (counts) and one codegen filter — no
    join, no second shuffle. Strata are assumed dim-table-sized
    (languages, sources, top-level domains); for open-ended
    domain-level mixing, pre-bucket domains first.
    """
    import math

    lattice = 16 ** precision
    # null-safe sort + eqNullSafe below: a NULL stratum (missing
    # source/lang) is a legitimate bucket, and a bare sorted() would
    # TypeError comparing None against str on the driver
    counts = sorted(
        ((r[0], int(r[1])) for r in
         df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()),
        key=lambda sn: (sn[0] is None, sn[0]))
    n_total = sum(n for _, n in counts)
    t_target = n_total * target_frac_num // target_frac_den
    weights = {s: math.isqrt(n * weight_scale * weight_scale)
               for s, n in counts}
    s_sum = sum(weights.values())
    thr = {s: min(lattice, t_target * weights[s] * lattice
                  // (s_sum * n)) if s_sum else 0
           for s, n in counts}
    n_d = F.lit(0)
    t_d = F.lit(0)
    for s, n in counts:
        n_d = F.when(F.col(strata_col).eqNullSafe(s),
                     F.lit(n)).otherwise(n_d)
        t_d = F.when(F.col(strata_col).eqNullSafe(s),
                     F.lit(thr[s])).otherwise(t_d)
    u = F.conv(hash_bucket(F.col(key_col), precision), 16, 10).cast("long")
    return df.select(
        F.col(key_col), F.col(strata_col),
        n_d.cast("long").alias("n_d"),
        t_d.cast("long").alias("keep_thr"),
        (u < t_d).alias("kept"))


def exact_stratum_holdout(df: DataFrame, key_col: str,
                          strata_col: str, k: int) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    The per-stratum rate samplers above keep a *fraction*; evaluation
    holdouts need a FIXED size per group (e.g. 500 eval docs per
    language) that never changes across reruns or engines.  Ranking is
    md5(key) then key — no rand(), no sampleBy seed drift — so the
    holdout is stable under corpus growth except where new keys hash
    into the top k.  ONE window shuffle on the stratum key; rank <= k
    keeps the sort bounded per partition (no global sort).
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col))
    return (df.withColumn("_hrank", F.row_number().over(w))
            .filter(F.col("_hrank") <= k)
            .drop("_hrank"))
