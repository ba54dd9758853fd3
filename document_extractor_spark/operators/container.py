"""Container (portfolio) explode pre-pass.

Reference: portfolio_unpack.py:92-177 finds PDFs with embedded
attachments via ``pdfdetach -list``, extracts them, renames children
``Parent.pdf::Child.ext`` (:156-160) and hides the parent so it is
never extracted (:59-90). Our Spark analog: a mapInPandas pre-pass
over the pdf-routed rows that

- passes non-container PDFs through untouched (a cheap
  ``/EmbeddedFile`` byte-scan avoids a full parse on the common path),
- for containers, emits one child row per attachment with
  ``url = parent_url + '::' + child_name`` and the child payload as
  the new `html` binary (children are re-sniffed downstream, so a
  .txt child routes to the text branch and an .html child into the
  cascade), and
- drops the parent row (tagged consumed, like the hidden parent).

Output keeps the `pages` input schema, so the result unions straight
back into the dispatch stream.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..functions.pdf_mini import parse_pdf
from ..schemas import PAGES_COLS


def _is_container(payload) -> bool:
    return payload is not None and b"/EmbeddedFile" in payload


def explode_containers(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf_batch in batches:
        # common path: zero containers in the batch -> pass the Arrow
        # batch through UNTOUCHED instead of re-materializing every
        # multi-KB binary payload through per-row Python dicts
        mask = pdf_batch["html"].map(_is_container)
        if not mask.any():
            yield pdf_batch[PAGES_COLS]
            continue
        out = list(pdf_batch[~mask][PAGES_COLS]
                   .to_dict("records"))
        for r in pdf_batch[mask].itertuples(index=False):
            doc = parse_pdf(r.html)
            if not doc.attachments:
                out.append({
                    "url": r.url, "warc_ts": r.warc_ts, "html": r.html,
                    "text": r.text, "lang": r.lang,
                })
                continue
            for name, child_bytes in doc.attachments:
                out.append({
                    "url": f"{r.url}::{name}",  # portfolio_unpack.py:156-160
                    "warc_ts": r.warc_ts, "html": child_bytes,
                    "text": None, "lang": r.lang,
                })
        yield pd.DataFrame(out, columns=PAGES_COLS)
