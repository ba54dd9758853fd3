"""URL canonicalization for Common-Crawl-style corpora — pure Column
expressions (whole-stage codegen; the SQL twins live in
__spark_entry__._ORACLE_URL_DEDUP).

A crawl sees the same page under many spellings: scheme/host case,
`www.` prefixes, default ports, tracking query params, fragments,
trailing slashes. Canonical-url dedup collapses those BEFORE any
content hashing — at 10^12 pages it is the cheapest dedup level
(string ops + one groupBy) and typically removes a double-digit
percentage of fetches. Rules (each a deterministic regex, applied in
order so both engines agree):

1. drop the #fragment
2. lowercase the scheme and the host (path case is preserved)
3. drop a leading `www.` from the host
4. drop default ports (:80 for http, :443 for https)
5. drop tracking params (utm_*, fbclid, gclid), then a dangling
   `?`/`&`
6. drop a single trailing slash on a non-root path
"""
from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# anchored to a ?/& boundary: un-anchored, the pattern would match
# INSIDE longer param names ("afbclid=1") or values, collapsing
# genuinely distinct urls into one canonical form
_TRACKING = r"([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")             # 1
    # split scheme://host[:port]/rest to lowercase only scheme+host
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    host = F.regexp_replace(hostport, r"^www\.", "")   # 3
    host = F.when(scheme == "http",
                  F.regexp_replace(host, ":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(host, ":443$", "")) \
        .otherwise(host)                               # 4
    rest = F.regexp_replace(rest, _TRACKING, "$1")     # 5
    rest = F.regexp_replace(rest, r"&&+", "&")         # a=1&&b=2 -> &
    rest = F.regexp_replace(rest, r"\?&+", "?")        # ?&b=2 -> ?b=2
    rest = F.regexp_replace(rest, r"[?&]+$", "")       # dangling ?/&
    rest = F.regexp_replace(rest, r"(.)/(\?|$)", "$1$2")  # 6
    out = F.concat(scheme, F.lit("://"), host, rest)
    # a url without scheme://host passes through untouched (defensive)
    return F.when(scheme == "", url).otherwise(out)


def canonical_url_py(url: str) -> str:
    """Python twin (property tests)."""
    u = re.sub(r"#.*$", "", url)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", u,
                 re.DOTALL)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    rest = m.group(3)
    host = re.sub(r"^www\.", "", host)
    if scheme == "http":
        host = re.sub(":80$", "", host)
    elif scheme == "https":
        host = re.sub(":443$", "", host)
    rest = re.sub(_TRACKING, r"\1", rest)
    rest = re.sub(r"&&+", "&", rest)
    rest = re.sub(r"\?&+", "?", rest)
    rest = re.sub(r"[?&]+$", "", rest)
    rest = re.sub(r"(.)/(\?|$)", r"\1\2", rest)
    return f"{scheme}://{host}{rest}"


def host_of(col: Column) -> Column:
    """Lowercased host of an absolute (`scheme://host/...`) or
    protocol-relative (`//host/...`) URL; NULL for anything else
    (relative paths, fragments, and scheme-without-authority links
    like `mailto:` / `javascript:` / `tel:`).

    The ONE host parser shared by the link graph, the anchor index,
    and the robots filter — keep host semantics in a single place
    (review finding: three drifting copies of this regex).
    """
    abs_host = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rel_host = F.regexp_extract(col, r"^//([^/?#]*)", 1)
    return (F.when(abs_host != "", F.lower(abs_host))
             .when(rel_host != "", F.lower(rel_host)))


def has_opaque_scheme(col: Column) -> Column:
    """True for hrefs with a scheme but NO authority (`mailto:x`,
    `javascript:void(0)`, `tel:+1...`) — non-fetchable links that
    must never resolve to the source domain."""
    return (col.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
            & host_of(col).isNull())
