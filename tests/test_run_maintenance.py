"""Round-5 run-maintenance surface: the CSV index sink (S5/R7), the
single-file-run naming rule (S4), the low-disk OCR guard (R6), and
run-dir cleanup (S11) — reference process_run.py:111-122/205-300,
common.py:123-155, common_pdf.sh:37, pass_pdf.py:168-173."""
from __future__ import annotations

import csv
import glob
import io
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from document_extractor_spark.config import PipelineConfig
from document_extractor_spark.functions.textnorm import csv_safe_text
from document_extractor_spark.io_tables import cleanup_run_dir


def _art():
    # artifacts.py defines a module-level pandas_udf — import lazily,
    # after the session fixture exists (same seam as test_jsonl_shards)
    from document_extractor_spark import artifacts
    return artifacts


# ---------------------------------------------------------------- R7 ------
def test_csv_safe_text_matches_reference_sed_chain(spark):
    # clean_text() { sed 's/\r//g' | sed ... 's/\n/\\n/g' | sed 's/"/""/g'; }
    cases = [
        ("plain", "plain"),
        ("a\r\nb", "a\\nb"),          # CR stripped, LF escaped
        ('say "hi"', 'say ""hi""'),
        ("multi\nline\ntext", "multi\\nline\\ntext"),
        ("back\\slash", "back\\slash"),  # backslashes untouched
        ("", ""),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)],
                               "i int, t string")
    got = {r.i: r.c for r in df.select(
        "i", csv_safe_text(F.col("t")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def _extracted_df(spark):
    rows = [
        # url, run_id, page, text, method, used_fallback, reliability, status
        ("https://h/a/doc1", "r1", 1, 'line1\nline2 "q"', "pdf_text",
         False, 0.8403499999999999, "OK"),
        ("https://h/a/doc1", "r1", 2, "p2", "pdf_text", False, 0.5, "OK"),
        ("https://h/a/doc2", "r1", None, "whole doc", "html_text",
         True, 0.03125, "OK"),  # dyadic 4dp tie
        ("https://h/a/doc3", "r1", None, None, "txt", False, 1.0, "ERROR"),
    ]
    return spark.createDataFrame(
        rows, "url string, run_id string, page int, text string, "
              "method string, used_fallback boolean, reliability double, "
              "status string")


def test_csv_index_cells_pinned(spark):
    lines = {(r.url, r.page): r.csv_line
             for r in _art().csv_index_lines(_extracted_df(spark)).collect()}
    # format_number's HALF_EVEN == printf %.4f, incl. the dyadic tie
    assert lines[("https://h/a/doc1", 1)] == (
        '"doc1","1","line1\\nline2 ""q""","pdf_text","False","0.8403"')
    assert lines[("https://h/a/doc2", None)] == (
        '"doc2","","whole doc","html_text","True","0.0312"')
    con = duckdb.connect()
    assert con.execute(
        "select printf('%.4f', 0.8403499999999999), "
        "printf('%.4f', 0.03125)").fetchone() == ("0.8403", "0.0312")


def test_write_csv_index_roundtrips_via_csv_module(spark, tmp_path):
    out = str(tmp_path / "csv_index")
    _art().write_csv_index(_extracted_df(spark), out)
    files = glob.glob(f"{out}/run_id=r1/part-*.txt")
    assert files
    raw = b"".join(open(f, "rb").read() for f in sorted(files))
    text = raw.decode("utf-8")
    # reference csv module line terminator is CRLF
    assert text.startswith(_art().CSV_INDEX_HEADER + "\r\n")
    rows = list(csv.reader(io.StringIO(text)))
    assert rows[0] == ["filename", "page", "text", "method",
                       "used_ocr", "reliability"]
    # ERROR row excluded; 3 OK rows, (url, page) sorted
    assert len(rows) == 4
    body = {(r[0], r[1]): r for r in rows[1:]}
    r1 = body[("doc1", "1")]
    # the \n -> literal-\n escape inverts to the original text
    assert r1[2].replace("\\n", "\n") == 'line1\nline2 "q"'
    assert body[("doc2", "")][4] == "True"


# ---------------------------------------------------------------- S4 ------
_HTML = b"<!DOCTYPE html><html><body>hello body text</body></html>"
_WAV = b"RIFF\x24\x00\x00\x00WAVEfmt " + bytes(32)
_PDFB = b"%PDF-1.4 broken"
_BIN = b"\x00\x01\x02garbage\x00"


def test_single_file_run_names(spark):
    rows = [
        # one processable + noise + unsupported -> named by stem
        ("https://one.example.com/drop/report-final.pdf", _PDFB, None),
        ("https://one.example.com/drop/song.wav", _WAV, None),
        ("https://one.example.com/drop/blob.bin", _BIN, None),
        # two processable -> named by run
        ("https://two.example.com/drop/a.html", _HTML, None),
        ("https://two.example.com/drop/b.html", _HTML, None),
        # only noise -> run absent from the output
        ("https://none.example.com/drop/x.wav", _WAV, None),
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, text string")
    got = {r.run: (r.n_processable, r.output_name)
           for r in _art().single_file_run_names(pages).collect()}
    assert got["one.example.com"] == (1, "report-final")
    assert got["two.example.com"] == (2, "two.example.com")
    assert "none.example.com" not in got


# ---------------------------------------------------------------- R6 ------
@pytest.fixture(scope="module")
def lowdisk_extraction(spark, pages_df):
    from document_extractor_spark.pipeline import run_extraction

    cfg = PipelineConfig(bigdoc_page_limit=6, workdir_free_bytes=0)
    res = run_extraction(spark, pages_df, cfg, persist=False)
    return {
        "extracted": res.extracted.toPandas(),
        "quarantine": res.quarantine.toPandas(),
    }


def test_low_disk_fails_ocr_docs_to_quarantine(lowdisk_extraction):
    q = lowdisk_extraction["quarantine"]
    low = q[q["reason"] == "low_disk"]
    # every img fixture and every scanned pdf (OCR-needing) fails
    assert (low["url"].str.contains("/img_scan/").any())
    assert (low["url"].str.contains("/pdf_scanned/").any())
    # nothing that doesn't need OCR picks up the reason
    assert low["url"].str.split("/").str[3].isin(
        {"img_scan", "pdf_scanned", "pdf_scanonly", "container"}).all()


def test_low_disk_leaves_cheap_branches_untouched(spark, pages_df,
                                                  extraction,
                                                  lowdisk_extraction):
    base = extraction["extracted"]
    low = lowdisk_extraction["extracted"]
    # container fixtures carry scanned-PNG child attachments that
    # route to OCR, so the whole class is OCR-eligible
    ocr_classes = ("img_scan", "pdf_scanned", "container")

    def _cheap(df):
        cls = df["url"].str.split("/").str[3]
        keep = df[~cls.isin(ocr_classes)]
        return (keep.sort_values(["url", "page"])
                [["url", "page", "text", "method", "status"]]
                .reset_index(drop=True))

    import pandas.testing as pdt
    pdt.assert_frame_equal(_cheap(base), _cheap(low))


def test_low_disk_guard_permissive_with_space(spark, pages_df, extraction):
    from document_extractor_spark.pipeline import run_extraction

    cfg = PipelineConfig(bigdoc_page_limit=6,
                         workdir_free_bytes=10 << 30)
    res = run_extraction(spark, pages_df, cfg, persist=False)
    got = (res.extracted.toPandas()
           .sort_values(["url", "page"])[["url", "page", "text", "status"]]
           .reset_index(drop=True))
    base = (extraction["extracted"]
            .sort_values(["url", "page"])[["url", "page", "text", "status"]]
            .reset_index(drop=True))
    import pandas.testing as pdt
    pdt.assert_frame_equal(got, base)


# ---------------------------------------------------------------- S11 -----
def test_cleanup_run_dir_prunes_and_removes(tmp_path):
    root = tmp_path / "input"
    run = root / "run-001"
    (run / "sub" / "deeper").mkdir(parents=True)
    (run / ".DS_Store").write_bytes(b"junk")
    (run / "sub" / "Thumbs.db").write_bytes(b"junk")
    got = cleanup_run_dir(str(run), str(root))
    assert got == {"junk_removed": 2, "dirs_removed": 2,
                   "run_dir_removed": True}
    assert not run.exists() and root.exists()


def test_cleanup_run_dir_keeps_nonempty_and_guards_root(tmp_path):
    root = tmp_path / "input"
    run = root / "run-002"
    run.mkdir(parents=True)
    (run / "keep.txt").write_text("data")
    got = cleanup_run_dir(str(run), str(root))
    assert got["run_dir_removed"] is False
    assert (run / "keep.txt").read_text() == "data"
    # input root itself is never removed, even when empty
    empty_root = tmp_path / "empty_root"
    empty_root.mkdir()
    got = cleanup_run_dir(str(empty_root), str(empty_root))
    assert got["run_dir_removed"] is False and empty_root.exists()
    # a dir that is not a direct child of the input root stays
    nested = root / "a" / "b"
    nested.mkdir(parents=True)
    got = cleanup_run_dir(str(nested), str(root))
    assert got["run_dir_removed"] is False and nested.exists()


def test_cleanup_run_dir_refuses_outside_root(tmp_path):
    """Containment gate: a run_dir outside the input root (mis-join or
    symlink escape) must not be walked at all — no junk unlink, no
    empty-dir prune."""
    from document_extractor_spark.io_tables import cleanup_run_dir

    root = tmp_path / "input"
    outside = tmp_path / "elsewhere" / "runA"
    (outside / "empty").mkdir(parents=True)
    (outside / ".DS_Store").write_bytes(b"")
    got = cleanup_run_dir(str(outside), str(root))
    assert got == {"junk_removed": 0, "dirs_removed": 0,
                   "run_dir_removed": False}
    assert (outside / ".DS_Store").exists()
    assert (outside / "empty").is_dir()

    # symlink under the root resolving outside: also refused
    root.mkdir()
    link = root / "runL"
    link.symlink_to(outside)
    got = cleanup_run_dir(str(link), str(root))
    assert got["junk_removed"] == 0 and (outside / ".DS_Store").exists()
