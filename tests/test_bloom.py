"""Bloom membership dedup: position derivation vs a hashlib scalar
reference, word-table bit layout, FP determinism at tiny m, and the
paragraph-level stats."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.bloom import (
    bloom_membership,
    bloom_positions,
    bloom_seen_filter,
    bloom_word_table,
    paragraph_dup_stats,
)


def _ref_positions(text: str | None, m: int, k: int) -> list[int]:
    h = hashlib.md5((text or "").encode()).hexdigest()
    h1 = int(h[:8], 16)
    h2 = int(h[8:16], 16) * 2 + 1
    return [(h1 + i * h2) % m for i in range(k)]


def _ref_hit(text: str | None, bits: set[int], m: int, k: int) -> int:
    return int(all(p in bits for p in _ref_positions(text, m, k)))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positions_match_hashlib_reference(spark):
    texts = ["hello", "", None, "a" * 500, "\x00\nmixed\tws"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["pos"] for r in df.select(
        "i", bloom_positions(F.col("text"), 1 << 14, 6).alias("pos")
    ).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_positions(t, 1 << 14, 6)
    # NULL hashes like empty string
    assert got[1] == got[2]


def test_word_table_bits_exact(spark):
    m, k = 1 << 10, 4
    seen_texts = [f"doc {i}" for i in range(20)]
    ref_bits = {p for t in seen_texts for p in _ref_positions(t, m, k)}
    words = {r["w"]: r["bits"] for r in bloom_word_table(
        _docs(spark, [(i, t) for i, t in enumerate(seen_texts)]),
        m_bits=m, k=k).collect()}
    got_bits = {w * 64 + b for w, bits in words.items()
                for b in range(64) if (bits >> b) & 1}
    assert got_bits == ref_bits


@pytest.mark.parametrize("m", [64, 1 << 16])
def test_membership_matches_reference_including_fps(spark, m):
    # m=64 forces false positives; both engines/References must agree
    k = 3
    seen_texts = [f"seen {i}" for i in range(30)]
    batch_texts = [f"seen {i}" for i in range(0, 30, 3)] + \
        [f"new {i}" for i in range(40)]
    seen = _docs(spark, [(i, t) for i, t in enumerate(seen_texts)])
    batch = _docs(spark, [(i, t) for i, t in enumerate(batch_texts)])
    got = {r["doc_id"]: r["bloom_hit"]
           for r in bloom_seen_filter(batch, seen, m_bits=m,
                                      k=k).collect()}
    ref_bits = {p for t in seen_texts for p in _ref_positions(t, m, k)}
    want = {i: _ref_hit(t, ref_bits, m, k)
            for i, t in enumerate(batch_texts)}
    assert got == want
    # every true duplicate must be flagged (no false negatives, ever)
    for i in range(0, 10):
        assert got[i] == 1
    if m == 64:
        # tiny filter: saturation must produce at least one FP
        assert any(want[i] for i, t in enumerate(batch_texts)
                   if t.startswith("new"))


def test_membership_empty_inputs(spark):
    empty = _docs(spark, [])
    seen = _docs(spark, [(1, "x")])
    assert bloom_seen_filter(empty, seen).count() == 0
    # empty seen corpus: word table empty -> nothing is a member
    got = bloom_seen_filter(_docs(spark, [(1, "x")]), empty).collect()
    assert [(r["doc_id"], r["bloom_hit"]) for r in got] == [(1, 0)]


def test_membership_word_table_reuse(spark):
    # the persisted-artifact path: prebuilt word table == end-to-end
    m, k = 1 << 12, 4
    seen = _docs(spark, [(i, f"s{i}") for i in range(10)])
    batch = _docs(spark, [(i, f"s{i}" if i < 5 else f"n{i}")
                          for i in range(12)])
    words = bloom_word_table(seen, m_bits=m, k=k)
    a = sorted(map(tuple, bloom_membership(batch, words, m_bits=m,
                                           k=k).collect()))
    b = sorted(map(tuple, bloom_seen_filter(batch, seen, m_bits=m,
                                            k=k).collect()))
    assert a == b


def test_paragraph_dup_stats(spark):
    m, k = 1 << 16, 4
    seen = _docs(spark, [
        (1, "common line\nrare line one"),
        (2, "another shared line"),
    ])
    batch = _docs(spark, [
        (10, "common line\nanother shared line\ntotally fresh"),
        (11, "totally fresh\n\n\n"),
        (12, ""),          # no non-empty lines
        (13, None),        # NULL text
        (14, "common line\ncommon line"),  # dup line counted twice
    ])
    got = {r["doc_id"]: (r["n_paras"], r["n_dup_paras"])
           for r in paragraph_dup_stats(batch, seen, m_bits=m,
                                        k=k).collect()}
    assert got[10] == (3, 2)
    assert got[11] == (1, 0)
    assert got[12] == (0, 0)
    assert got[13] == (0, 0)
    assert got[14] == (2, 2)


def test_degenerate_params():
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), m_bits=32)
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), k=0)
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), k=17)


def test_k1_single_probe(spark):
    # k=1 is the documented lower bound: one probe, no least() fold
    # (F.least needs >= 2 columns — pinned regression)
    m, k = 1 << 12, 1
    seen = _docs(spark, [(i, f"s{i}") for i in range(8)])
    batch = _docs(spark, [(i, f"s{i}" if i < 4 else f"n{i}")
                          for i in range(8)])
    words = bloom_word_table(seen, m_bits=m, k=k)
    bits = {r["w"] * 64 + b for r in words.collect()
            for b in range(64) if (r["bits"] >> b) & 1}
    got = {r["doc_id"]: r["bloom_hit"]
           for r in bloom_seen_filter(batch, seen, m_bits=m,
                                      k=k).collect()}
    for i in range(8):
        text = f"s{i}" if i < 4 else f"n{i}"
        assert got[i] == _ref_hit(text, bits, m, k)
    assert all(got[i] == 1 for i in range(4))
