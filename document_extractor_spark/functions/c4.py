"""The published C4 cleaning heuristics (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning with a Unified Text-to-Text
Transformer", §2.2) as one JVM-side projection.

Line rules (applied to newline-split lines, trimmed):
- keep only lines ending in a terminal punctuation mark (. ! ? ")
- keep only lines with >= `min_line_words` words (paper: 5 — word =
  run between the repo's pinned whitespace class)
- drop lines containing the word "javascript" (case-insensitive)

Page rules (on the ORIGINAL text):
- drop pages with fewer than `min_sentences` sentences (paper: 3;
  sentence = terminal-punctuation occurrence, the common proxy)
- drop pages containing "lorem ipsum" (case-insensitive)
- drop pages containing a curly brace "{"

Everything is pure `pyspark.sql.functions` Column work — zero
shuffles, zero Python — and every predicate has a byte-identical
DuckDB twin (same split class, same regexes in the Java∩RE2 subset).
The paper's three-sentence-span dedup step lives elsewhere in this
repo (operators/dedup.py `dup_window_spans` covers span-level
duplication).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the repo-wide pinned whitespace class (CLAUDE.md): Java and RE2
# disagree on \x0B inside \s, so the class is always written out
WS = "[ \\t\\n\\x0B\\f\\r]"
# terminal punctuation per the paper's description (period, bang,
# question mark, closing double quote after a terminal mark is the
# common reading — keep the simple 4-char set, documented)
_TERMINAL = '[.!?"]'


def _trimmed_lines(text_col: Column) -> Column:
    """Newline-split lines with surrounding whitespace trimmed (the
    same trim class on both engines), empties removed.

    Anchors: `\\z`, not `$` — Java's `$` matches BEFORE a final line
    terminator (U+2028/U+2029/U+0085) while RE2's matches only
    end-of-string, so `$` is outside the Java∩RE2 subset this repo
    pins (CLAUDE.md); `\\z` means end-of-input in both."""
    return F.filter(
        F.transform(
            F.split(text_col, "\n"),
            lambda ln: F.regexp_replace(
                F.regexp_replace(ln, f"^{WS}+", ""), f"{WS}+\\z", "")),
        lambda ln: ln != "")


def c4_clean(docs: DataFrame, key_col: str = "doc_id",
             text_col: str = "text", min_line_words: int = 5,
             min_sentences: int = 3) -> DataFrame:
    """(key, kept_text, n_lines_kept, n_sentences, keep, drop_reason).

    `kept_text` is the surviving lines re-joined with "\\n";
    `keep` is the page verdict after both line and page rules;
    `drop_reason` names the FIRST failing page rule (the same
    precedence the oracle encodes), NULL when kept.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(text)
    lines = _trimmed_lines(text)
    # terminal test on the LAST CHARACTER, not a `$`-anchored regex:
    # Java `$` matches before a trailing U+2028/U+2029/U+0085 and
    # RE2's does not (see _trimmed_lines)
    line_ok = (
        lambda ln: F.substring(ln, -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.filter(F.split(ln, f"{WS}+"), lambda w: w != ""))
           >= min_line_words)
        & ~F.lower(ln).contains("javascript"))
    kept = F.filter(lines, line_ok)
    n_sentences = F.size(F.split(text, _TERMINAL, -1)) - 1
    reason = (
        F.when(lower.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(text.contains("{"), F.lit("curly_brace"))
        .when(n_sentences < min_sentences, F.lit("too_few_sentences"))
        .when(F.size(kept) == 0, F.lit("no_surviving_lines"))
    )
    return docs.select(
        F.col(key_col),
        F.array_join(kept, "\n").alias("kept_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )
