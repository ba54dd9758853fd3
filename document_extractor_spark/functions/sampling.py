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

from pyspark.sql import Column, DataFrame
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
