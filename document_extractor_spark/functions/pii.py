"""PII detection and redaction for webtext training corpora.

A standard pre-training scrub pass (C4/RefinedWeb-style): find and
replace e-mail addresses, IPv4 addresses, and international-format
phone numbers with typed placeholder tokens, and count what was
removed so the metrics table records scrub rates per source.

The reference pipeline (strahd-zarovich/document-extractor) stops at
extraction and has no PII stage; this module is part of the
training-data surface this engine adds on top (SURVEY.md §2.5). It is
pure Column work — `regexp_replace` / `regexp_count` run inside
whole-stage codegen, so the scrub costs one projection over the
corpus, no shuffle, no Python.

Regex dialect parity: patterns are written in the Java ∩ RE2 common
subset (character classes, bounded repetition, alternation, `\\b`) so
the DuckDB oracle applies the *same* strings. No lookaround (RE2 has
none), no possessive quantifiers, no `\\p{...}` classes.

KNOWN DIALECT EDGE (pinned by test_pii.py): `\\b` itself is not fully
portable — Java's \\b treats Unicode letters as word characters while
RE2's is ASCII-only, so a non-ASCII letter glued directly to a
redactable token ("é1.2.3.4") forms a boundary in RE2 but not in
Java. Parity holds whenever the character adjacent to a match is
ASCII or a separator — i.e. for real crawl text; fuzz coverage runs
on an ASCII alphabet and a dedicated test documents the divergence.

Order matters: IPv4 must be redacted BEFORE phone numbers, otherwise
the phone pattern's digit-run alternative could swallow dotted octets
partially. E-mail goes first of all, since an address like
`bob.192.168.0.1@host` must stay one `<EMAIL>` token.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local-part: the practical unquoted subset; domain: dotted labels with
# a 2+ alpha TLD. Anchored with \b on both sides so `a@b.co,c@d.co`
# yields two matches.
EMAIL_PATTERN = (
    r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9]"
    r"[A-Za-z0-9-]*(\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}\b"
)

# Dotted-quad with per-octet range check (25x|2[0-4]x|1xx|xx|x) —
# avoids tagging `999.999.999.999`; \b keeps version strings like
# `1.2.3.4000` out on the tail side.
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_PATTERN = rf"\b{_OCT}\.{_OCT}\.{_OCT}\.{_OCT}\b"

# Phone: NANP-shaped numbers (3-3-4 digit groups separated by
# space/dash/dot, area code optionally parenthesized, optional +CC
# prefix) — enough digits to be a number, not a year. Two top-level
# alternatives because the run-start guard differs: with a +CC
# prefix the literal '+' anchors the start (a \b between CC and a
# sep-less area code would never match — '+1555 123-4567' is legal),
# while the bare form \b-guards its leading digit run so a longer id
# ('ref 99555 123-4567') can't get its tail redacted. No lookbehind
# in RE2, so the guard must live inside each alternative.
_PHONE_CORE = r"[0-9]{3}[ .-][0-9]{4}\b"
PHONE_PATTERN = (
    r"\+[0-9]{1,3}[ .-]?(\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])"
    + _PHONE_CORE
    + r"|(\([0-9]{3}\)[ .-]?|\b[0-9]{3}[ .-])"
    + _PHONE_CORE
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column) -> Column:
    """Struct of match counts per PII class (pre-redaction).

    Counted on the raw text independently, in the same precedence
    order the redactor applies (email > ip > phone): each counter
    runs on the text with the higher-precedence classes already
    blanked, so a dotted quad inside an e-mail is counted once, as
    e-mail — counts always equal the number of tokens the redactor
    emits.
    """
    after_email = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, IP_TOKEN)
    # regexp_count, not size(regexp_extract_all): counting must not
    # materialize an array of every matched substring per row
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_PATTERN)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_PATTERN)).alias("n_phones"),
    )


def pii_redact(text: Column) -> Column:
    """Replace every e-mail / IPv4 / phone match with its typed token.

    Single projection, three chained `regexp_replace` calls — all
    JVM-side, fused by whole-stage codegen. Precedence: email > ip >
    phone (see module docstring).
    """
    out = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IP_TOKEN)
    out = F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)
    return out
