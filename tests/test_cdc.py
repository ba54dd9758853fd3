"""Content-defined chunking: reference parity, bounds,
reconstruction, the resync property, and the Spark kernel."""
from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from document_extractor_spark.operators.cdc import (
    _GEAR,
    cdc_boundaries,
    cdc_chunks,
    gear_hashes,
)


def _ref_hash(text: str, t: int) -> int:
    """Independent reference: the classic gear recurrence
    h = (h << 1) + gear[cp] (mod 2^64) run over the whole prefix —
    must equal the vectorized windowed form at every position."""
    h = 0
    for ch in text[: t + 1]:
        h = ((h << 1) + int(_GEAR[ord(ch) & 0xFF])) & 0xFFFFFFFFFFFFFFFF
    return h


def _text(n=4000, seed=7):
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefgh \n") for _ in range(n))


def test_windowed_hash_equals_gear_recurrence():
    t = _text(300)
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    h = gear_hashes(cps)
    for pos in [0, 1, 63, 64, 65, 150, 299]:
        if pos >= 64:
            assert int(h[pos]) == _ref_hash(t, pos), pos
        else:
            # below the window the recurrence and window agree too
            # (nothing has shifted out yet)
            assert int(h[pos]) == _ref_hash(t, pos), pos


def test_bounds_and_reconstruction():
    t = _text()
    bounds = cdc_boundaries(t, min_size=64, avg_size=256, max_size=1024)
    assert bounds[-1] == len(t)
    start = 0
    pieces = []
    for end in bounds:
        assert end - start >= 1
        if end != len(t):  # the tail chunk may be short
            assert 64 <= end - start <= 1024
        else:
            assert end - start <= 1024
        pieces.append(t[start:end])
        start = end
    assert "".join(pieces) == t


def test_resync_after_insertion():
    """THE CDC property: insert one char near the front and the
    boundary sequence re-synchronizes — after the first shared
    content position, all later boundaries are identical (a
    size-based chunker shifts every one of them)."""
    t = _text(6000, seed=11)
    edited = t[:10] + "X" + t[10:]
    b1 = cdc_boundaries(t)
    b2 = cdc_boundaries(edited)
    # map edited boundaries back to original coordinates
    b2_orig = [b - 1 for b in b2 if b > 10]
    shared = sorted(set(b1) & set(b2_orig))
    assert shared, "no resync point found"
    first = shared[0]
    tail1 = [b for b in b1 if b >= first]
    tail2 = [b for b in b2_orig if b >= first]
    assert tail1 == tail2
    assert first < len(t) // 2  # resyncs quickly, not at the end


def test_identical_content_identical_chunks_regardless_of_position():
    block = _text(3000, seed=3)
    a = cdc_boundaries("PREFIX-A-" + block)
    b = cdc_boundaries("totally different prefix ... " + block)
    ha = {("A", x) for x in a}
    # compare chunk CONTENT hashes of the shared block's interior
    def chunk_hashes(text, bounds):
        out, s = [], 0
        for e in bounds:
            out.append(hashlib.md5(text[s:e].encode()).hexdigest())
            s = e
        return out
    h1 = set(chunk_hashes("PREFIX-A-" + block, a))
    h2 = set(chunk_hashes("totally different prefix ... " + block, b))
    assert len(h1 & h2) >= max(len(h1), len(h2)) // 2


def test_param_validation_and_edges():
    assert cdc_boundaries("") == []
    assert cdc_boundaries("short", min_size=64, avg_size=256,
                          max_size=1024) == [5]
    # unicode: char offsets, never mid-codepoint
    t = "中文" * 500
    bounds = cdc_boundaries(t)
    assert bounds[-1] == len(t)


def test_spark_kernel_matches_local(spark):
    import pandas as pd
    texts = {i: _text(2000 + 37 * i, seed=i) for i in range(6)}
    texts[6] = None
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string")
    rows = cdc_chunks(docs).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert 6 not in by_key  # NULL text -> no rows
    for k, t in texts.items():
        if t is None:
            continue
        got = sorted(by_key[k], key=lambda r: r.chunk_idx)
        bounds = cdc_boundaries(t)
        assert [r.start + r.length for r in got] == bounds
        for r in got:
            piece = t[r.start:r.start + r.length]
            assert r.chunk_hash == hashlib.md5(
                piece.encode()).hexdigest()
    with pytest.raises(ValueError):
        cdc_chunks(docs, avg_size=300)  # not a power of two


def test_batch_boundaries_equal_per_doc():
    from document_extractor_spark.operators.cdc import (
        batch_cdc_boundaries)

    texts = [_text(50 + 137 * i, seed=i) for i in range(8)] + ["", "ab"]
    batched = batch_cdc_boundaries(texts)
    assert batched == [cdc_boundaries(t) for t in texts]


def test_batch_memory_grouping_preserves_output(monkeypatch):
    from document_extractor_spark.operators import cdc as cdc_mod

    texts = [_text(400 + 91 * i, seed=100 + i) for i in range(10)]
    expected = [cdc_boundaries(t) for t in texts]
    # force tiny sub-groups: every doc lands in its own hash pass
    monkeypatch.setattr(cdc_mod, "_MAX_BATCH_CHARS", 100)
    assert cdc_mod.batch_cdc_boundaries(texts) == expected
