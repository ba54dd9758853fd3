"""Deterministic synthetic Common-Crawl-style corpus generator.

Builds the `pages(url, warc_ts, html, text, lang)` table
(BASELINE.json input_hint) plus the golden `expected_extracted` /
`expected_quarantine` tables per FIXTURES.md §2-3. Everything is
seeded (``random.Random(f"{seed}:{i}")`` — SHA-512 string seeding is
platform-stable), so the same (n, seed) regenerates byte-identically.

The expected extracted text is *ground truth known at generation
time* (the content paragraphs placed in <main>, the PDF page lines,
the lossy-decoded plaintext), NOT a snapshot of the extractor's own
output — keeping the byte-identity test non-circular.

Reference analogs for each fixture class are cited in FIXTURES.md §2
(routing: process_run.py:35-37, 93-109).
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import pandas as pd

from .functions.doc_mini import _build_cfb, build_doc
from .functions.docx_mini import build_docx
from .functions.scoring import exact_median, score_reliability
from .pdf_gen import build_pdf

_WORDS = {
    "en": (
        "the quick market report growth revenue margin supply chain policy "
        "energy climate research model data system network science health "
        "industry council budget election transport housing culture review "
        "analysis forecast quarter annual global regional strong weak stable "
        "rising falling record noted early later major minor public private"
    ).split(),
    "de": (
        "der die das bericht markt wachstum umsatz marge politik energie "
        "klima forschung modell daten system netz wissenschaft gesundheit "
        "industrie rat haushalt wahl verkehr wohnen kultur analyse prognose "
        "quartal global stark schwach stabil steigend fallend rekord neue"
    ).split(),
    "fr": (
        "le la rapport marche croissance revenu marge politique energie "
        "climat recherche modele donnees systeme reseau science sante "
        "industrie conseil budget election transport logement culture "
        "analyse prevision trimestre mondial fort faible stable record"
    ).split(),
}

_HOT_DOMAINS = [
    ("news.example.com", 0.30),
    ("blog.example.org", 0.20),
    ("portal.example.net", 0.10),
]

# fixture class -> cumulative weight (FIXTURES.md §2 mix)
_MIX = [
    ("html_clean", 0.34),
    ("html_noisy", 0.46),
    ("html_garbage", 0.50),
    ("pdf_text", 0.64),
    ("pdf_big", 0.67),
    ("pdf_scanonly", 0.69),
    ("plaintext", 0.80),
    ("pretext", 0.82),
    ("container", 0.86),
    ("docx", 0.895),
    ("doc", 0.925),
    ("gzip_html", 0.945),
    ("noise", 0.96),
    ("unsupported", 0.97),
    # scanned pages (machine-font PNG, reference pass_img route);
    # carved from the tail of the old unsupported range so every
    # other fixture's class assignment is unchanged
    ("img_scan", 0.98),
    # scanned PDFs (grayscale raster pages, no text layer): triage ->
    # OCR-A/OCR-B cascade; carved from the head of the dup range
    ("pdf_scanned", 0.985),
    ("dup", 1.00),
]

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


_FUNCTION_WORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def _sentence(rng: random.Random, lang: str, n_lo: int = 8, n_hi: int = 14) -> str:
    words = _WORDS[lang]
    fn_words = _FUNCTION_WORDS[lang]
    n = rng.randint(n_lo, n_hi)
    toks = []
    for i in range(n):
        # natural text interleaves function words (~1 in 4)
        if i > 0 and rng.random() < 0.25:
            toks.append(rng.choice(fn_words))
        toks.append(rng.choice(words))
    return toks[0].capitalize() + " " + " ".join(toks[1:]) + "."


def _paragraph(rng: random.Random, lang: str, lo: int = 2, hi: int = 5) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(lo, hi)))


_JUNK_TOKENS = ["####", "@@@@", "====", "%%%%", "~~~~", "----", "...."]


def _junk_paragraph(rng: random.Random) -> str:
    """Symbol-heavy ASCII text whose alnum ratio lands well under every
    office cutoff (~0.4), yet is non-blank and printable — the
    below-cutoff-but-salvageable office body (E10 fixtures). ASCII-only
    and &<>-free so DOCX XML escaping and the .doc cp1252 piece both
    round-trip it byte-identically."""
    parts = []
    for _ in range(rng.randint(3, 5)):
        parts.append(rng.choice(_JUNK_TOKENS))
        parts.append(rng.choice(
            ["lot", "ref", "qty", "id", "page", "rev"])
            + str(rng.randint(0, 99)))
    parts.append(rng.choice(_JUNK_TOKENS))
    return " ".join(parts)


def _domain(rng: random.Random) -> str:
    r = rng.random()
    acc = 0.0
    for dom, w in _HOT_DOMAINS:
        acc += w
        if r < acc:
            return dom
    return f"site{rng.randint(0, 999)}.example.com"


def _render_html(
    rng: random.Random,
    lang: str,
    title: str,
    paragraphs: list[str],
    malformed: bool = False,
) -> str:
    nav = "".join(
        f'<li><a href="/{p}">{p.capitalize()}</a></li>'
        for p in ("home", "world", "business", "tech", "about")
    )
    related = " ".join(
        f'<a href="/story/{rng.randint(1, 9999)}">'
        f"{_sentence(rng, lang, 3, 5)}</a>"
        for _ in range(3)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paragraphs)
    aside = f"<aside><p>{_paragraph(rng, lang, 1, 2)}</p></aside>"
    article_close = "</main>" if malformed else "</article></main>"
    stray = "</section>" if malformed else ""
    return f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>{title} | Site</title>
<meta charset="utf-8"><style>body{{margin:0}}</style></head>
<body>
<header><div><a href="/">Logo</a></div></header>
<nav><ul>{nav}</ul></nav>
<main><article>
<h1>{title}</h1>
{body_paras}{stray}
<div class="related">{related}</div>
<div>Ad!</div>
{article_close}
{aside}
<footer><p>Copyright 2026 Example Corp. All rights reserved.</p></footer>
</body></html>"""


@dataclass
class Corpus:
    pages: pd.DataFrame
    expected: pd.DataFrame
    expected_quarantine: pd.DataFrame
    noise_urls: list[str] = field(default_factory=list)


def _pick_class(rng: random.Random) -> str:
    r = rng.random()
    for name, cum in _MIX:
        if r < cum:
            return name
    return "html_clean"


def generate_corpus(
    n_rows: int,
    seed: int = 42,
    big_pdf_pages: int = 8,
) -> Corpus:
    pages: list[dict] = []
    expected: list[dict] = []
    quarantine: list[dict] = []
    noise_urls: list[str] = []
    last_clean: dict | None = None
    last_clean_expected: dict | None = None

    for i in range(n_rows):
        rng = random.Random(f"{seed}:{i}")
        cls = _pick_class(rng)
        lang = rng.choices(["en", "de", "fr"], weights=[0.8, 0.1, 0.1])[0]
        domain = _domain(rng)
        url = f"https://{domain}/{cls}/{i:07d}"
        ts = _EPOCH + timedelta(seconds=i)
        row = {"url": url, "warc_ts": ts, "html": None, "text": None, "lang": lang}

        def _exp(text: str, method: str, fallback: bool, rel: float,
                 page: int | None = None, pages_n: int = 1,
                 status: str = "OK", u: str | None = None) -> dict:
            return {
                "url": u or url, "extracted_text": text, "page": page,
                "pages": pages_n, "method": method,
                "used_fallback": fallback, "reliability": rel,
                "status": status, "fixture_class": cls,
            }

        if cls in ("html_clean", "html_noisy", "dup"):
            if cls == "dup" and last_clean is not None:
                row["html"] = last_clean["html"]
                expected.append(dict(
                    last_clean_expected, url=url, fixture_class="dup"))
                pages.append(row)
                continue
            title = _sentence(rng, lang, 4, 7)[:-1]  # no trailing period
            paras = [_paragraph(rng, lang, 2, 4)
                     for _ in range(rng.randint(3, 6))]
            html = _render_html(
                rng, lang, title, paras, malformed=(cls == "html_noisy"))
            row["html"] = html.encode("utf-8")
            truth = "\n".join([title] + paras)
            method = "html_text" if cls != "html_noisy" else "html_lenient"
            e = _exp(truth, method, cls == "html_noisy",
                     score_reliability(truth))
            expected.append(e)
            if cls == "html_clean":
                last_clean, last_clean_expected = row, e

        elif cls == "html_garbage":
            soup = " ".join(
                "".join(rng.choices("#$%^&*()!@~;:,._+=-|<>?", k=rng.randint(3, 8)))
                for _ in range(rng.randint(30, 60))
            )
            row["html"] = f"<html><body><div>{soup}</div><p></body>".encode()
            quarantine.append({"url": url, "reason": "extract_below_cutoff",
                               "fixture_class": cls})

        elif cls in ("pdf_text", "pdf_big", "pdf_scanonly"):
            if cls == "pdf_scanonly":
                # nearly-empty text layer -> triage reject (common.py:216-244)
                pdf_pages = [[""] for _ in range(rng.randint(2, 4))]
            elif cls == "pdf_big":
                pdf_pages = [
                    [_sentence(rng, lang) for _ in range(rng.randint(2, 4))]
                    for _ in range(big_pdf_pages)
                ]
            else:
                pdf_pages = [
                    [_sentence(rng, lang) for _ in range(rng.randint(2, 5))]
                    for _ in range(rng.randint(2, 4))
                ]
            row["html"] = build_pdf(pdf_pages, compress=rng.random() < 0.5)
            if cls == "pdf_scanonly":
                quarantine.append({"url": url, "reason": "pdf_below_cutoff",
                                   "fixture_class": cls})
            else:
                page_texts = ["\n".join(lines) for lines in pdf_pages]
                rels = [score_reliability(t) for t in page_texts]
                if cls == "pdf_big":
                    for k, (t, r) in enumerate(zip(page_texts, rels), 1):
                        expected.append(_exp(t, "pdf_text", False, r,
                                             page=k, pages_n=len(page_texts)))
                else:
                    expected.append(_exp(
                        "\n".join(page_texts), "pdf_text", False,
                        exact_median(rels), pages_n=len(page_texts)))

        elif cls == "plaintext":
            text = "\n".join(
                _paragraph(rng, lang, 1, 3) for _ in range(rng.randint(2, 5)))
            variant = rng.random()
            if variant < 0.15:
                payload = ("café résumé " + text).encode("latin-1")
            elif variant < 0.30:
                payload = b"\xef\xbb\xbf" + text.encode("utf-8")
            else:
                payload = text.encode("utf-8")
            row["html"] = payload
            # reference parity: utf-8 lossy decode (pass_txt.py:30-31)
            dec = payload.decode("utf-8", errors="ignore")
            expected.append(_exp(dec, "txt", False, score_reliability(dec)))

        elif cls == "pretext":
            text = _paragraph(rng, lang, 2, 4)
            row["text"] = text
            expected.append(_exp(text, "txt", False, score_reliability(text)))

        elif cls == "container":
            children = []
            child_expected = []
            for c in range(rng.randint(2, 3)):
                ctext = _paragraph(rng, lang, 1, 3)
                cname = f"child{c}.txt"
                children.append((cname, ctext.encode("utf-8")))
                child_expected.append(_exp(
                    ctext, "txt", False, score_reliability(ctext),
                    u=f"{url}::{cname}"))
            if rng.random() < 0.5:
                # a scanned attachment: the explode re-sniff routes
                # the PNG child into the OCR branch (r5)
                from .functions.bitfont import (
                    normalize_content, render_scan)
                stext = _sentence(rng, lang)
                cname = "scan.png"
                children.append((cname, render_scan(stext)))
                child_expected.append(_exp(
                    normalize_content(stext), "ocr_a", False,
                    score_reliability(normalize_content(stext)),
                    u=f"{url}::{cname}"))
            row["html"] = build_pdf(
                [["Container manifest page."]], attachments=children)
            expected.extend(child_expected)

        elif cls == "docx":
            if rng.random() < 0.25:
                # below-cutoff body: symbol-heavy text scores under
                # PASS_DOCX_CUTOFF, so the E10 salvage pass re-extracts
                # leniently and accepts at cutoff=0.0 (pass_doc.py:
                # 105-186 second chance; method doc_salvage_text)
                paras = [_junk_paragraph(rng) for _ in range(2)]
                row["html"] = build_docx(paras, None)
                truth = "\n".join(paras)
                expected.append(_exp(
                    truth, "doc_salvage_text", True,
                    score_reliability(truth)))
            else:
                paras = [_paragraph(rng, lang, 1, 3)
                         for _ in range(rng.randint(2, 4))]
                table = None
                if rng.random() < 0.5:
                    table = [[_sentence(rng, lang, 3, 6)
                              for _ in range(2)] for _ in range(2)]
                row["html"] = build_docx(paras, table)
                # reference walk order: all paragraphs, then table
                # cells (pass_doc.py:63-76), joined "\n"
                truth = "\n".join(
                    paras
                    + ([c for r_ in table for c in r_] if table else []))
                expected.append(_exp(
                    truth, "docx_text", False, score_reliability(truth)))

        elif cls == "doc":
            # legacy Word binary (E9): piece-table variants — plain
            # cp1252, split pieces, a non-cp1252 paragraph forcing a
            # UTF-16 piece, a truncated file, and a non-Word CFB
            # (the .xls deny-list analog, process_run.py:35-37)
            paras = [_paragraph(rng, lang, 1, 3)
                     for _ in range(rng.randint(2, 4))]
            variant = rng.random()
            if variant < 0.40:
                row["html"] = build_doc(paras)
            elif variant < 0.60:
                row["html"] = build_doc(paras, split_pieces=True)
            elif variant < 0.75:
                paras[-1] += " — συμπέρασμα"  # forces a UTF-16LE piece
                row["html"] = build_doc(paras, split_pieces=True)
            elif variant < 0.85:
                # below-cutoff body -> E10 salvage (pass_doc.py:105-186):
                # the lenient printable-run scrape of the single cp1252
                # piece recovers exactly the paragraph text
                paras = [_junk_paragraph(rng) for _ in range(2)]
                row["html"] = build_doc(paras)
            elif variant < 0.95:
                row["html"] = build_doc(paras)[:600]  # truncated CFB
                quarantine.append({"url": url, "reason": "doc_open_failed",
                                   "fixture_class": cls})
            else:
                row["html"] = _build_cfb(
                    [("Workbook", b"\x09\x08" + bytes(128))])
                quarantine.append({"url": url, "reason": "unsupported",
                                   "fixture_class": cls})
            if variant < 0.75:
                truth = "\n".join(paras)
                expected.append(_exp(
                    truth, "doc_text", False, score_reliability(truth)))
            elif variant < 0.85:
                truth = "\n".join(paras)
                expected.append(_exp(
                    truth, "doc_salvage_text", True,
                    score_reliability(truth)))

        elif cls == "gzip_html":
            # Common-Crawl payloads often arrive gzip-compressed: the
            # engine must decompress and route the inner html (mtime=0
            # keeps the bytes deterministic)
            import gzip as _gzip
            import io as _io

            title = _sentence(rng, lang, 4, 7)[:-1]
            paras = [_paragraph(rng, lang, 2, 4)
                     for _ in range(rng.randint(3, 5))]
            html = _render_html(rng, lang, title, paras, malformed=False)
            buf = _io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(html.encode("utf-8"))
            row["html"] = buf.getvalue()
            truth = "\n".join([title] + paras)
            expected.append(_exp(truth, "html_text", False,
                                 score_reliability(truth)))

        elif cls == "noise":
            row["html"] = b"RIFF\x24\x00\x00\x00WAVEfmt " + bytes(32)
            noise_urls.append(url)

        elif cls == "unsupported":
            row["html"] = b"PK\x03\x04" + bytes(60)
            quarantine.append({"url": url, "reason": "unsupported",
                               "fixture_class": cls})

        elif cls == "pdf_scanned":
            # scanned PDF (E3-E6): raster-only pages through the
            # reference's TXT -> OCR-A -> OCR-B cascade
            # (pass_pdf.py:112-255); OCR forces per-page granularity
            # (A7, pass_pdf.py:163-166)
            from .functions.bitfont import (
                normalize_content, render_page_bitmap)
            from .pdf_gen import build_scanned_pdf

            page_strs = [" ".join(_sentence(rng, lang)
                                  for _ in range(rng.randint(1, 3)))
                         for _ in range(rng.randint(2, 3))]
            variant = rng.random()
            if variant < 0.40:
                bitmaps = [render_page_bitmap(t) for t in page_strs]
                method = "ocr_a"
            elif variant < 0.65:
                bitmaps = [render_page_bitmap(t, rotate=True)
                           for t in page_strs]
                method = "ocr_b"
            elif variant < 0.90:
                bitmaps = [render_page_bitmap(
                    t, noise_seed=f"{url}#{k}", noise_px=2)
                    for k, t in enumerate(page_strs)]
                method = "ocr_b"
            else:
                # unreadable mush: ink everywhere -> every cell is
                # beyond both passes -> pdf_below_cutoff quarantine
                import numpy as _np
                bitmaps = [_np.zeros((17, 31), dtype=_np.uint8)
                           for _ in page_strs]
                method = None
            row["html"] = build_scanned_pdf(bitmaps)
            if method is None:
                quarantine.append({"url": url,
                                   "reason": "pdf_below_cutoff",
                                   "fixture_class": cls})
            else:
                contents = [normalize_content(t) for t in page_strs]
                for k, t in enumerate(contents, 1):
                    expected.append(_exp(
                        t, method, method == "ocr_b",
                        score_reliability(t), page=k,
                        pages_n=len(contents)))

        elif cls == "img_scan":
            # scanned page in the machine-readable font (E4-E7 via
            # pass_img route): clean upright -> OCR-A; 180-rotated or
            # 2 px scanner dirt -> OCR-B recovery; truncated PNG ->
            # quarantine
            from .functions.bitfont import normalize_content, render_scan

            truth = " ".join(_sentence(rng, lang)
                             for _ in range(rng.randint(2, 5)))
            content = normalize_content(truth)
            variant = rng.random()
            if variant < 0.40:
                row["html"] = render_scan(truth)
                method = "ocr_a"
            elif variant < 0.65:
                row["html"] = render_scan(truth, rotate=True)
                method = "ocr_b"
            elif variant < 0.90:
                row["html"] = render_scan(truth, noise_seed=url,
                                          noise_px=2)
                method = "ocr_b"
            else:
                row["html"] = render_scan(truth)[:40]  # truncated PNG
                quarantine.append({
                    "url": url, "reason": "img_parse_failed",
                    "fixture_class": cls})
                pages.append(row)
                continue
            expected.append(_exp(content, method, method == "ocr_b",
                                 score_reliability(content)))

        pages.append(row)

    pages_df = pd.DataFrame(
        pages, columns=["url", "warc_ts", "html", "text", "lang"])
    exp_cols = ["url", "extracted_text", "page", "pages", "method",
                "used_fallback", "reliability", "status", "fixture_class"]
    expected_df = pd.DataFrame(expected, columns=exp_cols)
    quarantine_df = pd.DataFrame(
        quarantine, columns=["url", "reason", "fixture_class"])
    return Corpus(pages_df, expected_df, quarantine_df, noise_urls)


def write_corpus(out_dir: str, n_rows: int, seed: int = 42,
                 big_pdf_pages: int = 8) -> dict[str, str]:
    """Write pages/expected/quarantine parquet files; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    corpus = generate_corpus(n_rows, seed=seed, big_pdf_pages=big_pdf_pages)
    paths = {}
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    paths["pages"] = f"{out_dir}/pages.parquet"
    # many small row groups: a single 50k-row row group is ONE Spark
    # scan split regardless of byte-range splitting — parallel reads
    # need row-group granularity (real Common-Crawl parquet has it)
    pq.write_table(
        pa.Table.from_pandas(corpus.pages, schema=schema,
                             preserve_index=False),
        paths["pages"], row_group_size=1024)
    paths["expected"] = f"{out_dir}/expected.parquet"
    pq.write_table(
        pa.Table.from_pandas(corpus.expected, preserve_index=False),
        paths["expected"])
    paths["expected_quarantine"] = f"{out_dir}/expected_quarantine.parquet"
    pq.write_table(
        pa.Table.from_pandas(corpus.expected_quarantine, preserve_index=False),
        paths["expected_quarantine"])
    return paths
