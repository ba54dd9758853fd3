"""UniMax language-mixture budgeting (Chung et al. 2023,
"UniMax: Fairer and More Effective Language Sampling for Large-Scale
Multilingual Pretraining", arXiv:2304.09151).

Temperature sampling (functions/sampling.py `temperature_mix`) trades
head-language mass for tail languages smoothly but can still repeat a
tiny language hundreds of epochs. UniMax instead allocates a total
token BUDGET by sequential fair share with an epoch cap: visiting
languages in ascending order of their cap (max_epochs * n_tokens),
each language receives

    alloc_l = min(max_epochs * n_tokens_l,  remaining // n_left)

i.e. the tail gets everything it can contribute without exceeding the
epoch cap, and the head splits what is left evenly. The recurrence is
PURE INTEGER (floor division on non-negative operands agrees across
Python, Spark and DuckDB) so the plan is bit-stable — no float rates
anywhere; consumers derive sampling rates as the exact rational
alloc_l / n_tokens_l (e.g. via the md5-lattice threshold samplers in
functions/sampling.py).

Scale shape: ONE map-side-combined groupBy(lang) over the corpus
(token counts ride the same pinned BPE-ish regex every token oracle
uses); the waterfill itself runs on the driver over the
languages-sized table — squarely inside the dim-bounded
plan-building-scalar allowance — and the result IS that dim table.
The corpus is never reshuffled and never sorted.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import token_count


def unimax_waterfill(lang_tokens: list[tuple[str, int]], budget: int,
                     max_epochs: int) -> list[tuple[str, int, int]]:
    """(lang, n_tokens, alloc_tokens) rows from the sequential
    fair-share recurrence — the reference scalar implementation the
    DuckDB recursive-CTE oracle mirrors row for row."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    items = sorted((max_epochs * t, lang, t) for lang, t in lang_tokens)
    n = len(items)
    remaining = budget
    out = []
    for i, (cap, lang, t) in enumerate(items):
        fair = remaining // (n - i)
        alloc = min(cap, fair)
        out.append((lang, t, alloc))
        remaining -= alloc
    return sorted(out)


def unimax_allocation(docs: DataFrame, budget: int, max_epochs: int,
                      lang_col: str = "lang",
                      text_col: str = "text") -> DataFrame:
    """`(lang, n_tokens, alloc_tokens)` — the UniMax mixture plan for
    `docs` under a total token `budget` and per-language epoch cap.

    NULL languages pool under 'und'. Languages whose cap exceeds the
    fair share split the remainder evenly (integer floor; the
    leftover < n_langs tokens stays unallocated, matching the scalar
    recurrence exactly).
    """
    spark: SparkSession = docs.sparkSession
    per_lang = (
        docs.groupBy(
            F.coalesce(F.col(lang_col), F.lit("und")).alias("lang"))
        .agg(F.sum(F.coalesce(token_count(F.col(text_col)), F.lit(0)))
             .cast("long").alias("n_tokens"))
    )
    rows = [(r["lang"], int(r["n_tokens"])) for r in per_lang.collect()]
    alloc = unimax_waterfill(rows, budget, max_epochs)
    return spark.createDataFrame(
        alloc or [], "lang string, n_tokens long, alloc_tokens long")
