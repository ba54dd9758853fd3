"""Chunk bin-packing (A9) + rendered-doc template (S6) tests."""
from hypothesis import given, settings
from hypothesis import strategies as st

from document_extractor_spark.operators.chunker import (
    DOCUMENT_BREAK,
    assign_chunks,
    render_doc_text,
)


def _pack_local(sizes, max_bytes):
    """Reference-semantics greedy packer (output_writer.py:62-116)."""
    chunk, used, out = 1, 0, []
    for s in sizes:
        if used > 0 and used + s > max_bytes:
            chunk, used = chunk + 1, 0
        used += s
        out.append(chunk)
    return out


def test_assign_chunks_matches_greedy(spark):
    rows = [("r1", f"u{i:03d}", s) for i, s in enumerate(
        [100, 200, 300, 250, 900, 50, 1000, 10, 10, 980])]
    df = spark.createDataFrame(rows, "run_id string, url string, doc_bytes long")
    got = (
        assign_chunks(df, max_bytes=1000).toPandas()
        .sort_values("url").chunk_id.tolist()
    )
    assert got == _pack_local(
        [100, 200, 300, 250, 900, 50, 1000, 10, 10, 980], 1000)


@given(st.lists(st.integers(1, 500), min_size=1, max_size=50),
       st.integers(100, 1000))
@settings(max_examples=50, deadline=None)
def test_chunk_invariant(sizes, max_bytes):
    """Every chunk <= limit OR contains exactly one oversized doc
    (output_writer.py:99-101 behavior)."""
    ids = _pack_local(sizes, max_bytes)
    by_chunk: dict[int, list[int]] = {}
    for cid, s in zip(ids, sizes):
        by_chunk.setdefault(cid, []).append(s)
    for members in by_chunk.values():
        assert sum(members) <= max_bytes or len(members) == 1
    # never-split + sequential: ids are non-decreasing starting at 1
    assert ids[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))


def test_render_doc_text_template():
    """Byte-parity with output_writer.py:168-193."""
    out = render_doc_text(
        url="https://x.example.com/a/doc1",
        relative_path="a/doc1",
        pages=[(1, "first page text"), (2, "")],
        pass_used="pdf_text",
        score=0.8123,
        status="OK",
        processed_at="2026-01-01T00:00:00Z",
    )
    assert out == (
        "# original_file: https://x.example.com/a/doc1\n"
        "# original_name: doc1\n"
        "# relative_path: a/doc1\n"
        "# pages: 2\n"
        "# processed_at: 2026-01-01T00:00:00Z\n"
        "# pass_used: pdf_text\n"
        "# score: 0.8123\n"
        "# status: OK\n"
        "\n"
        "=== [PAGE 1] ===\n"
        "\n"
        "first page text\n"
        "\n"
        "=== [PAGE 2] ===\n"
        "\n"
        "\n"
    )
    assert DOCUMENT_BREAK == "----- DOCUMENT BREAK -----\n\n"


def test_artifacts_render_and_chunk(spark, pages_df, cfg):
    """S6/S7 integration: rendered blocks + greedy chunk assignment
    over the real extraction output."""
    from document_extractor_spark.artifacts import chunked_docs, rendered_docs
    from document_extractor_spark.pipeline import run_extraction

    res = run_extraction(spark, pages_df.limit(80), cfg, persist=False)
    rendered = rendered_docs(res.extracted).cache()
    rows = rendered.toPandas()
    assert len(rows) > 0
    sample = rows.iloc[0]
    assert sample.rendered_text.startswith(
        f"# original_file: {sample.url}\n")
    assert "=== [PAGE " in sample.rendered_text
    assert sample.rendered_text.endswith("\n")

    chunks = chunked_docs(rendered, max_bytes=4000).toPandas()
    assert (chunks.chunk_id >= 1).all()
    grp = chunks.groupby("chunk_id").doc_bytes.agg(["sum", "count"])
    assert ((grp["sum"] <= 4000) | (grp["count"] == 1)).all()


def _pack_ref(sizes, max_bytes, brk):
    """Byte-faithful simulation of the reference's append loop:
    fit test excludes the incoming break; on-disk grows by size+brk."""
    chunk, used, out = 1, 0, []
    for s in sizes:
        if used > 0 and used + s > max_bytes:
            chunk, used = chunk + 1, 0
        used += s + brk
        out.append(chunk)
    return out


def test_assign_chunks_break_accounting(spark):
    """ADVICE parity fix: with break_bytes the packer must place a doc
    that fits WITHOUT its own break but not WITH it (the reference
    accepts it — output_writer.py:100 excludes the incoming break)."""
    brk = len(DOCUMENT_BREAK.encode("utf-8"))
    # doc2 fits only when its own break is excluded from the fit test
    sizes = [500, 1000 - 500 - brk, 400]
    rows = [("r1", f"u{i}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "run_id string, url string, doc_bytes long")
    got = (assign_chunks(df, max_bytes=1000, break_bytes=brk)
           .toPandas().sort_values("url").chunk_id.tolist())
    want = _pack_ref(sizes, 1000, brk)
    assert got == want
    assert got[:2] == [1, 1]  # doc2 shares chunk 1 (break excluded)
    # the OLD accounting (break folded into every size) would have split
    old = _pack_local([s + brk for s in sizes], 1000)
    assert old[:2] == [1, 2]


def test_rendered_docs_jvm_matches_python_template(spark, pages_df, cfg):
    """S6 byte parity: the JVM Column render must equal the Python
    render_doc_text golden for every document, incl. per-page docs."""
    from document_extractor_spark.artifacts import rendered_docs
    from document_extractor_spark.pipeline import run_extraction

    res = run_extraction(spark, pages_df, cfg, persist=False)
    got = rendered_docs(res.extracted).toPandas().set_index("url")
    ext = res.extracted.drop("spans").toPandas()
    src = ext[ext.status.eq("OK") & ext.text.notna()]
    assert len(got) == src.url.nunique()
    for url, grp in src.groupby("url"):
        pages = sorted(
            (int(p) if p == p else 1, t)
            for p, t in zip(grp.page, grp.text))
        want = render_doc_text(
            url=url,
            relative_path=url.split("://", 1)[-1],
            pages=pages,
            pass_used=grp.method.iloc[0],
            score=grp.reliability.max(),
            status="OK",
            processed_at="1970-01-01T00:00:00Z",
        )
        assert got.loc[url, "rendered_text"] == want, url


def test_write_chunks_files_byte_parity(spark, pages_df, cfg, tmp_path):
    """S7 tail: exported chunk files are byte-identical to the
    reference's append loop (block + DOCUMENT BREAK per doc, in url
    order) and respect the size bound."""
    import glob
    import os

    from document_extractor_spark.artifacts import (
        chunked_docs, rendered_docs, write_chunks)
    from document_extractor_spark.pipeline import run_extraction

    res = run_extraction(spark, pages_df.limit(80), cfg, persist=False)
    rendered = rendered_docs(res.extracted).cache()
    chunked = chunked_docs(rendered, max_bytes=4000).cache()
    out = str(tmp_path / "chunks")
    write_chunks(chunked, out)

    pdf = chunked.toPandas().sort_values("url")
    brk = DOCUMENT_BREAK.encode("utf-8")
    for (run_id, cid), grp in pdf.groupby(["run_id", "chunk_id"]):
        files = glob.glob(
            f"{out}/run_id={run_id}/chunk_id={cid}/part-*.txt")
        assert len(files) == 1, (run_id, cid, files)
        data = open(files[0], "rb").read()
        want = b"".join(
            t.encode("utf-8") + brk for t in grp.rendered_text)
        assert data == want, (run_id, cid)
        # size bound: <= max_bytes + trailing break, or a lone oversized doc
        assert len(data) <= 4000 + len(brk) or len(grp) == 1
    # every chunk dir accounted for
    ndirs = len(glob.glob(f"{out}/run_id=*/chunk_id=*"))
    assert ndirs == pdf.groupby(["run_id", "chunk_id"]).ngroups


def test_token_windows_semantics(spark):
    """Window/stride/short-tail semantics of the training-sample
    windower, incl. docs shorter than one window."""
    from document_extractor_spark.operators.chunker import token_windows

    text20 = " ".join(f"t{i}" for i in range(1, 21))  # 20 tokens
    rows = [(1, text20), (2, "a b c"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (token_windows(df, window=8, stride=6).toPandas()
           .sort_values(["doc_id", "win_idx"]).reset_index(drop=True))

    d1 = got[got.doc_id == 1]
    # starts: 1, 7, 13 (last full-window start = 20-8+1=13)
    assert d1.start_tok.tolist() == [1, 7, 13]
    assert d1.n_tokens.tolist() == [8, 8, 8]
    assert d1.window_text.iloc[0] == " ".join(f"t{i}" for i in range(1, 9))
    assert d1.window_text.iloc[2] == " ".join(f"t{i}" for i in range(13, 21))
    # overlap: stride 6 < window 8 -> consecutive windows share 2 tokens
    assert d1.window_text.iloc[0].split()[-2:] == \
        d1.window_text.iloc[1].split()[:2]

    d2 = got[got.doc_id == 2]  # shorter than one window: single tail
    assert len(d2) == 1
    assert (d2.iloc[0].start_tok, d2.iloc[0].n_tokens) == (1, 3)
    assert d2.iloc[0].window_text == "a b c"

    assert (got.doc_id != 3).all()  # empty text -> no windows
    assert (got.doc_id != 4).all()  # null text -> no windows


def test_token_windows_tail_coverage(spark):
    """EVERY token lands in at least one window: a misaligned tail
    (n - window not a multiple of stride) gets a shorter final window
    instead of silently vanishing."""
    from document_extractor_spark.operators.chunker import token_windows

    for n, w, s_ in [(100, 64, 48), (10, 8, 6), (20, 8, 6), (65, 64, 48),
                     (130, 64, 48), (7, 8, 6), (64, 64, 48)]:
        text = " ".join(f"t{i}" for i in range(1, n + 1))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = (token_windows(df, window=w, stride=s_).toPandas()
               .sort_values("win_idx"))
        covered = set()
        for r in got.itertuples():
            toks = r.window_text.split()
            assert len(toks) == r.n_tokens
            assert toks[0] == f"t{r.start_tok}"
            covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
        assert covered == set(range(1, n + 1)), (n, w, s_, sorted(covered)[-5:])
        # windows are stride-spaced with at most one short tail
        starts = got.start_tok.tolist()
        assert starts == sorted(starts)
        assert all(b - a == s_ for a, b in zip(starts, starts[1:])), starts


def test_render_whale_doc_cap(spark):
    """A doc beyond the render page cap must be excluded BEFORE the
    collect_list buffer and surface in render_quarantine as
    render_too_large; normal docs render as before; max_pages=None
    disables the guard."""
    from document_extractor_spark.artifacts import (
        render_quarantine, rendered_docs)

    whale = [("u://whale", "r0", "pdf_text", "OK", 0.9, p, f"page {p}")
             for p in range(1, 51)]
    normal = [("u://ok", "r0", "pdf_text", "OK", 0.8, 1, "single page")]
    df = spark.createDataFrame(
        whale + normal,
        "url string, run_id string, method string, status string, "
        "reliability double, page int, text string")

    rendered = rendered_docs(df, max_pages=10).toPandas()
    assert rendered.url.tolist() == ["u://ok"]

    quar = render_quarantine(df, max_pages=10).toPandas()
    assert quar.url.tolist() == ["u://whale"]
    assert quar.reason.tolist() == ["render_too_large"]
    assert "50 pages > cap 10" in quar.note.iloc[0]

    uncapped = rendered_docs(df, max_pages=None).toPandas()
    assert sorted(uncapped.url) == ["u://ok", "u://whale"]
    assert "=== [PAGE 50] ===" in uncapped.set_index("url").loc[
        "u://whale"].rendered_text


def test_rendered_docs_null_text_header_only(spark):
    """An OK doc whose text is NULL must still render (header-only
    block, '# pages: 0') instead of silently vanishing from the
    output; a doc with a NULL page among real pages keeps the real
    ones."""
    from document_extractor_spark.artifacts import rendered_docs

    rows = [
        ("u://null-doc", "r1", "pdf_text", "OK", 0.5, None, None),
        ("u://mixed", "r1", "pdf_text", "OK", 0.9, 1, "page one text"),
        ("u://mixed", "r1", "pdf_text", "OK", 0.9, 2, None),
        ("u://err", "r1", "pdf_text", "ERROR", 0.0, None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, run_id string, method string, status string,"
              " reliability double, page int, text string")
    got = rendered_docs(df).toPandas().set_index("url")
    assert "u://null-doc" in got.index
    assert "# pages: 0" in got.loc["u://null-doc", "rendered_text"]
    assert got.loc["u://null-doc", "rendered_text"].endswith("\n\n")
    assert "# pages: 1" in got.loc["u://mixed", "rendered_text"]
    assert "page one text" in got.loc["u://mixed", "rendered_text"]
    assert "u://err" not in got.index
