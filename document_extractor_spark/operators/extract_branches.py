"""Per-format extraction branches as Arrow-batched mapInPandas stages.

Each branch yields the common intermediate schema ``BRANCH_SCHEMA``
(url, method, status, page structs, spans, doc reliability, ...) which
the pipeline unions (reference analog: every pass appends rows to the
same run CSV via output_writer.write_result, output_writer.py:119-257).

The HTML cascade carries the binary payload through each stage output
(nulled on acceptance) so the next stage can run on the remainder with
a narrow filter — no shuffle, no re-read; Spark never invokes the
expensive stage-k parse on rows accepted at stage k-1. This is the
structural twin of the reference's TXT -> OCR-A -> OCR-B escalation
(pass_pdf.py:112-255) expressed as dataflow (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..config import PipelineConfig
from ..functions.pdf_mini import parse_pdf
from ..functions.scoring import (
    exact_median,
    likely_scan_only,
    sample_page_indices,
    score_reliability,
)
from ..functions.textnorm import decode_detect, decode_reference
from .html_extract import StrictParseError, extract_html, extract_raw

# common intermediate row produced by every branch
BRANCH_SCHEMA = (
    "url string, warc_ts timestamp, lang string, fmt string, "
    "method string, status string, used_fallback boolean, "
    "per_page boolean, n_pages int, "
    "pages array<struct<page:int,text:string,reliability:double>>, "
    "spans array<struct<start:bigint,end:bigint>>, "
    "reliability double, error string"
)
# cascade stages additionally carry the payload for the remainder rows
CASCADE_SCHEMA = BRANCH_SCHEMA + ", html binary, accepted boolean"

_BRANCH_COLS = [
    "url", "warc_ts", "lang", "fmt", "method", "status", "used_fallback",
    "per_page", "n_pages", "pages", "spans", "reliability", "error",
]


def _row(url, warc_ts, lang, fmt, method, status, used_fallback,
         per_page, n_pages, pages, spans, reliability, error="") -> dict:
    return {
        "url": url, "warc_ts": warc_ts, "lang": lang, "fmt": fmt,
        "method": method, "status": status, "used_fallback": used_fallback,
        "per_page": per_page, "n_pages": n_pages, "pages": pages,
        "spans": spans, "reliability": reliability, "error": error,
    }


def _empty(cols=None) -> pd.DataFrame:
    return pd.DataFrame(columns=cols or _BRANCH_COLS)


# --------------------------------------------------------------------------
# txt branch (reference pass_txt.py): lossy utf-8 decode, whole text is
# page 1, always "succeeds" (status ERROR only when empty — rc is 0 either
# way, so txt rows are never quarantined).
# --------------------------------------------------------------------------
def make_txt_branch(cfg: PipelineConfig):
    def txt_branch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = []
            for r in pdf_batch.itertuples(index=False):
                if r.fmt == "pretext":
                    text = r.text or ""
                else:
                    text = decode_reference(r.html)
                rel = score_reliability(text)
                has_text = bool(text.strip())
                pages = [(1, text, rel)] if has_text else []
                spans = [(0, len(text))] if has_text else []
                out.append(_row(
                    r.url, r.warc_ts, r.lang, r.fmt, "txt",
                    "OK" if has_text else "ERROR", False,
                    False, 1 if has_text else 0, pages, spans, rel,
                    "" if has_text else "empty_text",
                ))
            yield pd.DataFrame(out, columns=_BRANCH_COLS) if out else _empty()

    return txt_branch


# --------------------------------------------------------------------------
# pdf branch (reference pass_pdf.py + pass_pdf_txt.py): native text layer,
# scan-only triage, exact-median gating, per-doc/per-page granularity.
# --------------------------------------------------------------------------
def make_pdf_branch(cfg: PipelineConfig):
    cutoff = cfg.pdf_text_cutoff
    size_limit = cfg.bigdoc_size_limit_bytes
    page_limit = cfg.bigdoc_page_limit
    t_pages, t_chars, t_cap = (
        cfg.triage_sample_pages, cfg.triage_min_chars, cfg.triage_rel_cap)

    def pdf_branch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = []
            for r in pdf_batch.itertuples(index=False):
                payload = r.html
                doc = parse_pdf(payload)
                if not doc.ok:
                    out.append(_row(
                        r.url, r.warc_ts, r.lang, "pdf", "pdf_text",
                        "ERROR", False, False, 0, [], [], 0.0,
                        f"pdf_parse_failed: {doc.error}"))
                    continue
                n = doc.n_pages
                per_page = (
                    len(payload) >= size_limit or n >= page_limit
                )  # reference pass_pdf.py:108-110
                # triage (reference pass_pdf_txt.py:38-51)
                idxs = sample_page_indices(n, target=min(t_pages, n))
                samples = [doc.page_texts[i - 1] for i in idxs]
                if likely_scan_only(samples, t_chars, t_cap):
                    out.append(_row(
                        r.url, r.warc_ts, r.lang, "pdf", "pdf_text",
                        "ERROR", False, per_page, n, [], [], 0.0,
                        "pdf_below_cutoff: likely scan-only, no text layer"))
                    continue
                rels = [score_reliability(t) for t in doc.page_texts]
                med = exact_median(rels)
                if med < cutoff:
                    out.append(_row(
                        r.url, r.warc_ts, r.lang, "pdf", "pdf_text",
                        "ERROR", False, per_page, n, [], [], med,
                        f"pdf_below_cutoff: median={med:.4f}"))
                    continue
                pages = [
                    (i + 1, t, rel)
                    for i, (t, rel) in enumerate(zip(doc.page_texts, rels))
                ]
                # spans: page offsets within the "\n".join(pages) doc text
                spans, off = [], 0
                for t in doc.page_texts:
                    spans.append((off, off + len(t)))
                    off += len(t) + 1  # the joining "\n"
                out.append(_row(
                    r.url, r.warc_ts, r.lang, "pdf", "pdf_text", "OK",
                    False, per_page, n, pages, spans, med))
            yield pd.DataFrame(out, columns=_BRANCH_COLS) if out else _empty()

    return pdf_branch


# --------------------------------------------------------------------------
# html cascade stages (SURVEY.md M3): strict -> lenient -> raw, each an
# independent mapInPandas over the previous stage's remainder.
# --------------------------------------------------------------------------
_CASCADE_COLS = _BRANCH_COLS + ["html", "accepted"]

_STAGES = {
    "strict": ("html_text", False),
    "lenient": ("html_lenient", True),
    "raw": ("html_raw", True),
}


def make_html_stage(cfg: PipelineConfig, stage: str, final: bool = False):
    method, fallback = _STAGES[stage]
    cutoff = {
        "strict": cfg.html_strict_cutoff,
        "lenient": cfg.html_lenient_cutoff,
        "raw": cfg.html_raw_cutoff,
    }[stage]
    min_chars, max_ld = cfg.min_block_chars, cfg.max_link_density

    def html_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = []
            for r in pdf_batch.itertuples(index=False):
                payload = r.html
                source, _charset = decode_detect(payload)
                text, spans, err = "", [], ""
                try:
                    if stage == "raw":
                        text = extract_raw(source)
                        spans = []
                    else:
                        text, spans = extract_html(
                            source, strict=(stage == "strict"),
                            min_block_chars=min_chars,
                            max_link_density=max_ld)
                except StrictParseError as exc:
                    err = f"strict_parse: {exc}"
                rel = score_reliability(text)
                accepted = not err and rel >= cutoff and bool(text.strip())
                if accepted:
                    row = _row(
                        r.url, r.warc_ts, r.lang, "html", method, "OK",
                        fallback, False, 1,
                        [(1, text, rel)],
                        [(int(s), int(e)) for s, e in spans], rel)
                    row["html"] = None
                elif final:
                    row = _row(
                        r.url, r.warc_ts, r.lang, "html", method, "ERROR",
                        fallback, False, 0, [], [], rel,
                        err or f"extract_below_cutoff: rel={rel:.4f}")
                    row["html"] = None
                else:
                    row = _row(
                        r.url, r.warc_ts, r.lang, "html", method,
                        "ESCALATE", fallback, False, 0, [], [], rel, err)
                    row["html"] = payload  # carry payload to next stage
                row["accepted"] = accepted
                out.append(row)
            yield (pd.DataFrame(out, columns=_CASCADE_COLS)
                   if out else _empty(_CASCADE_COLS))

    return html_stage
