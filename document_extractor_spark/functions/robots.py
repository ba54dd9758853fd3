"""From-scratch robots.txt parsing + URL politeness filtering.

A crawl-facing corpus pipeline must honor (or at least be able to
reason about) robots exclusions: REP — the Robots Exclusion Protocol
(RFC 9309) — ships one `robots.txt` per host with `User-agent`
groups of `Allow`/`Disallow` path prefixes. This module implements
the protocol subset that matters for corpus filtering, stdlib-only:

- :func:`parse_robots` — group-structured parse of a robots.txt
  body: `User-agent` lines open a group (consecutive UA lines share
  it), `Allow`/`Disallow` rules attach to the open group, unknown
  directives and comments are skipped. Returns the rules for the
  requested agent, falling back to the `*` group, as the spec
  requires.
- :func:`robots_rules_table` — explode a `(domain, robots_txt)`
  table into `(domain, prefix, allow)` rules rows via an
  Arrow-batched kernel.
- :func:`filter_allowed` — the corpus-side filter: URLs joined
  against the BROADCAST rules table on domain; the longest matching
  prefix decides (RFC 9309 §2.2.2), ties broken toward Allow. An
  unlisted domain is allowed (no robots.txt = no restrictions).

Matching semantics implemented: literal path prefixes and the `$`
end-anchor; `*` wildcards inside rules are dropped at the wildcard
(the prefix before the first `*` is used) — a documented
conservative approximation that only ever errs toward matching MORE
(i.e. stricter filtering), never toward crawling a disallowed path.

Scale shape: robots.txt tables are host-cardinality (dim-sized next
to a 10^12-page corpus); the rules explode is tiny, the URL filter
is one broadcast join + a longest-prefix aggregation per URL, and
the corpus never shuffles.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(body: str | None, agent: str = "*") -> list[tuple[str, bool]]:
    """Rules `(path_prefix, allow)` for `agent` from a robots.txt
    body — the agent's own group if present, else the `*` group.

    Never raises: garbage lines are skipped; an empty/None body
    yields no rules (everything allowed).
    """
    if not body:
        return []
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    open_agents: list[str] | None = None
    rules_of_open: list[tuple[str, bool]] | None = None
    expecting_ua = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if expecting_ua and open_agents is not None:
                open_agents.append(value.lower())
            else:
                open_agents = [value.lower()]
                rules_of_open = []
                groups.append((open_agents, rules_of_open))
            expecting_ua = True
        elif key in ("allow", "disallow"):
            expecting_ua = False
            if rules_of_open is None:
                continue  # rule before any User-agent line: skipped
            if value == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            # conservative wildcard handling: keep the prefix before
            # the first '*' (matches a superset of the spec pattern)
            prefix = value.split("*", 1)[0] if "*" in value else value
            rules_of_open.append((prefix, key == "allow"))
        else:
            expecting_ua = False
    # RFC 9309 §2.2.1: ALL groups matching the agent are combined —
    # real robots.txt files routinely repeat `User-agent: *` blocks,
    # and returning only the first would silently drop the later
    # rules (erring toward crawling disallowed paths)
    agent = agent.lower()
    own: list[tuple[str, bool]] = []
    own_group_seen = False
    star: list[tuple[str, bool]] = []
    for agents, rules in groups:
        if agent != "*" and agent in agents:
            own_group_seen = True
            own.extend(rules)
        if "*" in agents:
            star.extend(rules)
    # RFC 9309 §2.2.1: a group MATCHING the agent applies even when it
    # carries no rules — 'User-agent: mybot\nDisallow:' is the
    # canonical exemption pattern (empty Disallow = allow all) and
    # must NOT fall back to the '*' group; fallback happens only when
    # no specific group exists at all
    if agent != "*" and own_group_seen:
        return own
    return star


def _rules_kernel(agent: str):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["domain", "prefix", "allow"]
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                for prefix, allow in parse_robots(r.robots_txt, agent):
                    rows.append({"domain": r.domain, "prefix": prefix,
                                 "allow": allow})
            yield pd.DataFrame(rows, columns=cols)
    return kernel


def robots_rules_table(robots: DataFrame, agent: str = "*") -> DataFrame:
    """`(domain, robots_txt)` → `(domain, prefix, allow)` rules rows
    for `agent`. Host-cardinality input; Arrow-batched parse."""
    return robots.mapInPandas(
        _rules_kernel(agent), "domain string, prefix string, allow boolean")


def filter_allowed(urls: DataFrame, rules: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Keep URLs permitted by the rules table (RFC 9309 longest-match;
    tie → Allow; unlisted domain → allowed).

    Rules are pre-grouped into one array per domain (dim-sized), the
    corpus takes ONE broadcast join, and the longest-match decision
    is a per-row JVM `aggregate` over that array — rank = 2·len +
    is_allow, so the winning rank is odd iff the verdict is Allow
    (ties at equal length break toward Allow for free). ZERO corpus
    shuffles, no row collapsing, `$`-anchored rules match exactly.
    """
    from .urlnorm import host_of

    u = F.col(url_col)
    domain = host_of(u)
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^#]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # hostnames are case-insensitive: normalize the rules side too,
    # or a mixed-case domain row would match nothing and its
    # Disallow rules would be silently ignored
    # the dim side's key is renamed to a private column: keeping it
    # as 'domain' makes the final select(*urls.columns) ambiguous the
    # moment the urls table itself carries a 'domain' column
    per_domain = (
        rules.select(F.lower(F.col("domain")).alias("_rb_dom"),
                     "prefix", "allow")
        .groupBy("_rb_dom")
        .agg(F.collect_list(F.struct("prefix", "allow")).alias("_rules")))
    with_dom = urls.withColumn("_dom", domain).withColumn("_path", path)
    joined = with_dom.join(F.broadcast(per_domain),
                           with_dom._dom == per_domain._rb_dom, "left")

    def rank(acc, r):
        pfx = r["prefix"]
        anchored = pfx.endswith("$")
        m = F.when(
            anchored,
            F.col("_path") == pfx.substr(F.lit(1), F.length(pfx) - 1)
        ).otherwise(F.col("_path").startswith(pfx))
        return F.greatest(
            acc,
            F.when(m, F.length(pfx) * 2 + r["allow"].cast("int"))
            .otherwise(F.lit(-1)))

    best = F.aggregate(
        F.coalesce(F.col("_rules"),
                   F.expr("array()").cast(
                       "array<struct<prefix:string,allow:boolean>>")),
        F.lit(-1), rank)
    return (
        joined.withColumn("_best", best)
        .filter((F.col("_best") < 0) | (F.col("_best") % 2 == 1))
        .select(*urls.columns)
    )
