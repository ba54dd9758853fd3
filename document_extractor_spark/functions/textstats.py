"""Text analysis for training-data pipelines: tokens, language-ID,
quality scoring, fingerprints. Every Column-returning helper here is
pure JVM expression (codegen path) and has an exact ANSI-SQL twin used
by the DuckDB oracle (__spark_entry__.oracle_sql).

The quality blend generalizes the reference's legacy shell scorer
(common_pdf.sh:85-156: density + stopword-ratio + repetition blend,
weights .5/.3/.2) into deterministic column math.
"""
from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# BPE-ish tokenization: letter/digit runs, plus single punctuation
# marks. The whitespace exclusion is the PINNED class written out,
# never \s: this exact string is interpolated into DuckDB (RE2) SQL
# twins, and Java \s includes \x0B while RE2's does not — a \s here
# made a vertical tab a punctuation token in exactly one engine.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def ascii_alnum_ratio(text: Column) -> Column:
    """ASCII alnum density — the SQL-twin variant of the reliability
    scorer (the Unicode-exact scorer lives in functions/scoring.py)."""
    return F.when(F.length(text) > 0,
                  F.length(F.regexp_replace(text, "[^0-9A-Za-z]", ""))
                  / F.length(text).cast("double")).otherwise(F.lit(0.0))


def dup_unigram_ratio(text: Column) -> Column:
    """Fraction of repeated words — a Gopher-style repetition signal
    (high ratio = boilerplate/spam). 0.0 for empty text. Pure Column
    expression: stays in whole-stage codegen, no Python in the path.
    Words split on the PINNED whitespace class with empties removed —
    a single-space split counted the empty strings between runs of
    spaces as duplicate 'words', inflating the signal on typographic
    double-spacing."""
    w = F.filter(F.split(text, WS_CLASS + "+"), lambda x: x != "")
    return F.when(
        F.size(w) > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w).cast("double"),
    ).otherwise(F.lit(0.0))


def dup_bigram_ratio(text: Column) -> Column:
    """Fraction of repeated word-bigrams (catches phrase-level template
    repetition that unigrams miss). 0.0 for texts under two words.

    Built as zip_with(w[:-1], w[1:]) rather than
    transform(sequence(...), i -> element_at(w, i)...): Catalyst
    inlines `w` into each lambda use, so the element_at form
    re-evaluates the split PER ELEMENT — O(words^2) per row, measured
    5.5 s for 5000 short docs. The slice form evaluates the split a
    constant number of times per row (0.3 s same input). Same pinned
    word split as dup_unigram_ratio."""
    w = F.filter(F.split(text, WS_CLASS + "+"), lambda x: x != "")
    n = F.size(w)
    grams = F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.when(
        n >= 2,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))


def _occurrences(padded: Column, word: str) -> Column:
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(_occurrences(padded, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """Marker-word argmax language-ID; ties break in en>de>fr>es order;
    all-zero -> 'unknown'. (n-gram heuristic class of detectors)."""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"])
               & (s["en"] >= s["es"]) & (s["en"] > 0), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0),
              F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column) -> Column:
    """0.6 * alnum-density(capped at 0.8) + 0.4 * length factor."""
    density = F.least(F.lit(1.0), ascii_alnum_ratio(text) / F.lit(0.8))
    length_factor = F.least(
        F.lit(1.0), token_count(text).cast("double") / F.lit(200.0))
    return F.round(F.lit(0.6) * density + F.lit(0.4) * length_factor, 4)


# --------------------------------------------------------------------------
# Legacy rich reliability scorer (A2): exact behavioral twin of the
# reference's awk scorer (common_pdf.sh:85-156), weights .5/.3/.2 over
# density / stopword-ratio / repetition. Pure Column math, SQL twin in
# __spark_entry__._ORACLE_LEGACY.
# --------------------------------------------------------------------------
# the embedded list verbatim (common_pdf.sh:87-96). Entries containing
# a Unicode apostrophe ("there's"-style) can never match: the awk
# tokenizer maps every non-[a-z] char to space first, so only the
# pure-ascii-alpha entries are effective — we keep exactly those.
_LEGACY_SW_RAW = """a an and are as at be but by for from has have if in into
  is it its of on or that the their there these they this to was were what
  when where which who why will with without within would about above after
  again against all also any because been before being below between both
  did do does doing down during each few further he her here hers herself
  him himself his how i into itself just me more most my myself no nor not
  now off once only other our ours ourselves out over own same she should so
  some such than then those through too under until up very we you your
  yours yourself yourselves""".split()
LEGACY_STOPWORDS = sorted(set(_LEGACY_SW_RAW))


def legacy_reliability(text: Column, d_norm: float = 400.0) -> Column:
    """clamp(0.5*D + 0.3*W + 0.2*R, 0, 1) rounded to 4 decimals.

    D = non-whitespace chars / d_norm, capped at 1 (RELIABILITY_D_NORM
        defaults to 400, common_pdf.sh:35);
    W = stopword hits / tokens, tokens = lowercase text with every
        non-[a-z] run collapsed to a space;
    R = 1 - max character frequency ratio over non-whitespace chars
        (the awk repetition penalty).
    """
    t = F.coalesce(text, F.lit(""))
    # the exact awk [[:space:]] class (C locale): NOT \s — Python's \s
    # also eats \xa0 (nbsp) and Java/RE2 disagree on \x0B, so all three
    # engines pin the literal six-char class
    nonws = F.regexp_replace(t, "[ \\t\\n\\x0B\\f\\r]", "")
    n = F.length(nonws).cast("double")
    d = F.least(F.lit(1.0), n / F.lit(float(d_norm)))

    toks = F.filter(
        F.split(F.regexp_replace(F.lower(t), "[^a-z]+", " "), " "),
        lambda x: x != "")
    sw = F.array(*[F.lit(w) for w in LEGACY_STOPWORDS])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    w_ratio = F.when(
        F.size(toks) > 0,
        hits.cast("double") / F.size(toks).cast("double"),
    ).otherwise(F.lit(0.0))

    # max char frequency = longest run in the SORTED char array: the
    # JVM sort is native, then ONE interpreted aggregate pass tracks
    # (current run, best run, prev char) — O(n log n) + O(n) per row
    # vs the O(distinct x n) distinct-x-filter formulation (measured
    # ~5x faster at sf0.1)
    sorted_chars = F.array_sort(F.split(nonws, ""))
    acc0 = F.struct(
        F.lit(0).alias("run"), F.lit(0).alias("best"),
        F.lit(" ").alias("prev"))
    scan = F.aggregate(
        sorted_chars, acc0,
        lambda a, x: F.struct(
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)))
            .alias("best"),
            x.alias("prev")))
    r = F.when(
        n > 0,
        F.lit(1.0) - scan["best"].cast("double") / n,
    ).otherwise(F.lit(0.0))

    score = F.lit(0.5) * d + F.lit(0.3) * w_ratio + F.lit(0.2) * r
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)), 4)


def legacy_reliability_py(text: str | None, d_norm: float = 400.0) -> float:
    """Python twin of legacy_reliability (hypothesis parity tests)."""
    import re

    t = text or ""
    nonws = re.sub("[ \t\n\x0b\f\r]", "", t)
    d = min(1.0, len(nonws) / d_norm)
    toks = [x for x in re.sub("[^a-z]+", " ", t.lower()).split(" ") if x]
    sw = set(LEGACY_STOPWORDS)
    w = (sum(1 for x in toks if x in sw) / len(toks)) if toks else 0.0
    if nonws:
        freq: dict[str, int] = {}
        for ch in nonws:
            freq[ch] = freq.get(ch, 0) + 1
        r = 1.0 - max(freq.values()) / len(nonws)
    else:
        r = 0.0
    # Spark's round() is HALF_UP on the decimal repr, not Python's
    # banker's rounding — match it exactly
    from decimal import ROUND_HALF_UP, Decimal

    v = max(0.0, min(1.0, 0.5 * d + 0.3 * w + 0.2 * r))
    return float(Decimal(repr(v)).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP))


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: md5 of lower + ws-collapsed.
    Collapse BEFORE trim: trim() strips only spaces, so stray
    tabs/newlines must first become spaces."""
    return F.md5(F.trim(F.regexp_replace(
        F.lower(text), "[ \\t\\n\\x0B\\f\\r]+", " ")))


# --------------------------------------------------------------------------
# Winnowing fingerprint (rolling-hash document sketch) — Python-side,
# used via pandas UDF; no SQL twin (rows-only oracle check).
# --------------------------------------------------------------------------
def winnow(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Classic winnowing: k-gram rolling hashes, min per window,
    deduplicated in order. Deterministic md5-based hash."""
    if not text or len(text) < k:
        return []
    grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    hashes = [
        int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
        >> 1  # keep positive in int64
        for g in grams
    ]
    out: list[int] = []
    for i in range(max(1, len(hashes) - window + 1)):
        m = min(hashes[i:i + window])
        if not out or out[-1] != m:
            out.append(m)
    return out


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprint(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: winnow(t) if isinstance(t, str) else [])


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
# Appendix A.1.1) — the standard pre-training document filter. All
# pure Column work in the Java ∩ RE2 dialect subset so the DuckDB
# oracle applies identical pattern strings.
# ---------------------------------------------------------------------------

# the published required-stopword set; a doc must contain >= 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")

# the pinned six-char whitespace class (see legacy_reliability: \s is
# NOT portable across Python/Java/RE2)
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def gopher_quality(text: Column,
                   min_words: int = 50,
                   max_words: int = 100_000) -> Column:
    """Struct of the seven Gopher document-quality signals + verdict.

    Signals (thresholds in parentheses are the published defaults):
      n_words        word count                    (50..100000 incl.)
      mean_word_len  total word chars / n_words    (3..10 incl.)
      symbol_ratio   ('#' + '...' + ellipsis char) / n_words  (< 0.1)
      bullet_ratio   lines starting with a bullet  (< 0.9)
      ellipsis_ratio lines ending with ellipsis    (< 0.3)
      alpha_ratio    words containing an [A-Za-z]  (>= 0.8)
      stop_hits      distinct GOPHER_STOPWORDS present   (>= 2)
      passes         AND of all seven

    Stays in whole-stage codegen end to end: split / filter /
    transform / regexp over arrays, no shuffle, no Python stage —
    the filter costs one projection over the corpus at any scale.
    """
    t = F.coalesce(text, F.lit(""))
    words = F.filter(F.split(t, WS_CLASS + "+"), lambda x: x != "")
    n_words = F.size(words)
    nd = n_words.cast("double")
    total_chars = F.length(F.regexp_replace(t, WS_CLASS, "")).cast("double")
    mean_word_len = F.when(n_words > 0, total_chars / nd).otherwise(
        F.lit(0.0))

    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellip = F.size(F.regexp_extract_all(
        t, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = F.when(n_words > 0,
                          (n_hash + n_ellip) / nd).otherwise(F.lit(0.0))

    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(
        lines, lambda x: F.ltrim(x).rlike(r"^[-*•‣]")))
    # \r*\z, not $: lines split on \n keep a trailing \r under CRLF,
    # and Java's $ matches BEFORE a final terminator while RE2's does
    # not — \z is end-of-input in both (Java∩RE2 subset)
    ellip_lines = F.size(F.filter(
        lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)\r*\z")))
    bullet_ratio = F.when(n_lines > 0,
                          bullet_lines / n_lines.cast("double")
                          ).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0,
                            ellip_lines / n_lines.cast("double")
                            ).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter(
        words, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0,
                         alpha_words / nd).otherwise(F.lit(0.0))

    lower_words = F.transform(words, F.lower)
    stop_hits = sum(
        (F.array_contains(lower_words, sw).cast("int")
         for sw in GOPHER_STOPWORDS),
        F.lit(0))

    passes = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_ratio < 0.9)
        & (ellipsis_ratio < 0.3)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )
    return F.struct(
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        passes.alias("passes"),
    )


# ---------------------------------------------------------------------------
# Unicode script profiling — language-ID support signal for multilingual
# crawls. Codepoint-range classes (\x{...}-\x{...}) rather than named
# \p{Script=...} properties: the range syntax is the Java ∩ RE2 common
# subset (named script classes differ between the engines: Java wants
# \p{IsCyrillic}, RE2 wants \p{Cyrillic}), verified match on both.
# ---------------------------------------------------------------------------

SCRIPT_CLASSES = (
    # (name, regex char class) — priority order for dominant-script
    # tie-breaks; Latin covers ASCII + Latin-1/Extended-A/B letters
    ("latin", r"[A-Za-z\x{00C0}-\x{024F}]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
    ("devanagari", r"[\x{0900}-\x{097F}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
)


def script_profile(text: Column) -> Column:
    """Struct of per-script letter counts, the dominant script, and
    its share of all classified letters.

    One projection, N small regex scans, all codegen-resident; the
    dominant pick is a fixed-priority CASE (first class in
    SCRIPT_CLASSES order wins ties), so output is deterministic and
    reproducible in any regex engine that honors codepoint ranges.
    'unknown' when no classified letters at all (digits, punctuation,
    unlisted scripts).
    """
    t = F.coalesce(text, F.lit(""))
    # length-diff idiom, not size(regexp_extract_all): counting
    # single-char class matches must not build an array of every
    # matched character per row (same trick as n_hash in
    # gopher_quality); counts are identical
    counts = {
        name: F.length(t) - F.length(F.regexp_replace(t, cls, ""))
        for name, cls in SCRIPT_CLASSES
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    mx = F.greatest(*counts.values())
    dominant = F.lit("unknown")
    for name, _ in reversed(SCRIPT_CLASSES):
        dominant = F.when((mx > 0) & (counts[name] == mx),
                          F.lit(name)).otherwise(dominant)
    share = F.when(total > 0,
                   F.round(mx / total.cast("double"), 6)).otherwise(
        F.lit(0.0))
    return F.struct(
        *[counts[name].cast("long").alias(f"n_{name}")
          for name, _ in SCRIPT_CLASSES],
        total.cast("long").alias("n_letters"),
        dominant.alias("dominant"),
        share.alias("dominant_share"),
    )
