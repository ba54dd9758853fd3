"""UniMax mixture budgeting: scalar recurrence properties and the
DataFrame wrapper's NULL-lang / empty-input behavior."""
from __future__ import annotations

import pytest

from document_extractor_spark.functions.unimax import (
    unimax_allocation,
    unimax_waterfill,
)


def test_waterfill_tail_capped_head_splits():
    # caps: a=20, b=200, c=2000; budget 300, 2 epochs
    out = dict((l, a) for l, _, a in unimax_waterfill(
        [("a", 10), ("b", 100), ("c", 1000)], budget=300, max_epochs=2))
    # visit order by cap: a (cap 20 < 300//3=100) -> takes 20
    # b: remaining 280, fair 140, cap 200 -> takes 140
    # c: remaining 140, fair 140 -> takes 140
    assert out == {"a": 20, "b": 140, "c": 140}


def test_waterfill_budget_exhausted_and_leftover():
    # budget smaller than total caps: pure even split with floor
    out = dict((l, a) for l, _, a in unimax_waterfill(
        [("a", 1000), ("b", 1000), ("c", 1000)], budget=100,
        max_epochs=1))
    # fair shares: 100//3=33, then 67//2=33, then 34//1=34
    assert out == {"a": 33, "b": 33, "c": 34}
    assert sum(out.values()) == 100


def test_waterfill_budget_exceeds_caps():
    out = dict((l, a) for l, _, a in unimax_waterfill(
        [("a", 5), ("b", 7)], budget=10**9, max_epochs=3))
    assert out == {"a": 15, "b": 21}  # everything capped


def test_waterfill_conservation_and_bounds():
    langs = [(f"l{i}", (i * 37) % 500 + 1) for i in range(40)]
    budget, epochs = 4321, 2
    rows = unimax_waterfill(langs, budget, epochs)
    toks = dict(langs)
    assert sum(a for _, _, a in rows) <= budget
    for lang, t, a in rows:
        assert t == toks[lang]
        assert 0 <= a <= epochs * t


def test_waterfill_tie_order_is_lang_lexicographic():
    # equal caps: visit order must be (cap, lang) to match the oracle
    out = unimax_waterfill([("b", 10), ("a", 10)], budget=21,
                           max_epochs=1)
    alloc = dict((l, a) for l, _, a in out)
    # a visited first: fair 21//2=10 (cap 10), b: 11//1=11 -> cap 10
    assert alloc == {"a": 10, "b": 10}


def test_waterfill_degenerate_params():
    with pytest.raises(ValueError):
        unimax_waterfill([("a", 1)], budget=-1, max_epochs=1)
    with pytest.raises(ValueError):
        unimax_waterfill([("a", 1)], budget=1, max_epochs=0)
    assert unimax_waterfill([], budget=100, max_epochs=2) == []


def test_allocation_null_lang_pools_to_und(spark):
    df = spark.createDataFrame(
        [(1, None, "one two three"), (2, None, "four five"),
         (3, "en", "a b c d e f g h i j")],
        "doc_id long, lang string, text string")
    rows = {r["lang"]: (r["n_tokens"], r["alloc_tokens"])
            for r in unimax_allocation(df, budget=12,
                                       max_epochs=1).collect()}
    assert rows["und"][0] == 5 and rows["en"][0] == 10
    # caps: und 5, en 10; visit und first: fair 6 -> 5; en: 7 -> 7
    assert rows["und"][1] == 5 and rows["en"][1] == 7


def test_allocation_empty_and_null_text(spark):
    empty = spark.createDataFrame([], "doc_id long, lang string, "
                                  "text string")
    assert unimax_allocation(empty, budget=10, max_epochs=1) \
        .count() == 0
    df = spark.createDataFrame([(1, "en", None)],
                               "doc_id long, lang string, text string")
    [r] = unimax_allocation(df, budget=10, max_epochs=1).collect()
    assert r["n_tokens"] == 0 and r["alloc_tokens"] == 0
