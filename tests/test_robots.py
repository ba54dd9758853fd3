"""robots.txt parsing + politeness filtering (RFC 9309 subset)."""
from __future__ import annotations

from document_extractor_spark.functions.robots import (
    filter_allowed,
    parse_robots,
    robots_rules_table,
)

_BODY = """
# comment line
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /tmp/
Allow: /tmp/public/
Disallow: /exact$
Disallow: /wild*/deep
Disallow:
Unknown-directive: ignored
"""


class TestParse:
    def test_star_group_and_agent_fallback(self):
        star = parse_robots(_BODY, "*")
        assert ("/tmp/", False) in star
        assert ("/tmp/public/", True) in star
        # agent with its own group gets ONLY that group
        goog = parse_robots(_BODY, "googlebot")
        assert goog == [("/private/", False)]
        # unknown agent falls back to *
        assert parse_robots(_BODY, "mybot") == star

    def test_wildcard_conservative_prefix(self):
        star = parse_robots(_BODY, "*")
        assert ("/wild", False) in star  # cut at the first '*'

    def test_empty_disallow_and_garbage(self):
        assert parse_robots("", "*") == []
        assert parse_robots(None, "*") == []
        assert parse_robots("random garbage\nno colons here", "*") == []
        assert parse_robots("Disallow: /orphan\n", "*") == []  # no UA

    def test_consecutive_user_agents_share_group(self):
        body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots(body, "a") == [("/x", False)]
        assert parse_robots(body, "b") == [("/x", False)]


class TestSparkFilter:
    def _rules(self, spark):
        robots = spark.createDataFrame(
            [("site.example.com", _BODY),
             ("open.example.com", "")],
            "domain string, robots_txt string")
        return robots_rules_table(robots, agent="*")

    def test_longest_match_and_anchors(self, spark):
        urls = spark.createDataFrame(
            [("http://site.example.com/tmp/secret",),      # disallow
             ("http://site.example.com/tmp/public/x",),    # allow (longer)
             ("http://site.example.com/exact",),           # $ exact: block
             ("http://site.example.com/exactly",),         # not exact: ok
             ("http://site.example.com/wildcard/deep",),   # prefix cut
             ("http://site.example.com/",),                # no match
             ("http://open.example.com/anything",),        # empty robots
             ("http://unlisted.example.com/x",)],          # unlisted
            "url string")
        kept = {r.url for r in
                filter_allowed(urls, self._rules(spark)).collect()}
        assert kept == {
            "http://site.example.com/tmp/public/x",
            "http://site.example.com/exactly",
            "http://site.example.com/",
            "http://open.example.com/anything",
            "http://unlisted.example.com/x",
        }

    def test_no_corpus_shuffle_and_no_row_collapse(self, spark):
        urls = spark.createDataFrame(
            [("http://unlisted.example.com/x", 1),
             ("http://unlisted.example.com/x", 2)],  # duplicate url
            "url string, payload int")
        out = filter_allowed(urls, self._rules(spark))
        assert out.count() == 2  # duplicates survive (no groupBy)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # corpus side: zero hash/range exchanges (the rules groupBy is
        # on the dim side of the broadcast)
        import re
        corpus_exchanges = len(re.findall(
            r"Exchange (hash|range)partitioning", plan))
        assert corpus_exchanges <= 1  # only the dim-side rules groupBy
        assert "BroadcastHashJoin" in plan


class TestReviewRegressions:
    def test_multiple_star_groups_are_merged(self):
        body = ("User-agent: *\nDisallow: /a\n\n"
                "User-agent: *\nDisallow: /b\n")
        rules = parse_robots(body, "*")
        assert ("/a", False) in rules and ("/b", False) in rules
        # an agent's own groups merge too, and exclude the * group
        body2 = ("User-agent: bot\nDisallow: /x\n\n"
                 "User-agent: *\nDisallow: /star\n\n"
                 "User-agent: bot\nDisallow: /y\n")
        own = parse_robots(body2, "bot")
        assert set(own) == {("/x", False), ("/y", False)}

    def test_mixed_case_rules_domain_still_blocks(self, spark):
        robots = spark.createDataFrame(
            [("Site.Example.COM", "User-agent: *\nDisallow: /\n")],
            "domain string, robots_txt string")
        urls = spark.createDataFrame(
            [("http://site.example.com/x",)], "url string")
        kept = filter_allowed(urls, robots_rules_table(robots)).count()
        assert kept == 0


class TestFuzz:
    def test_parse_never_raises(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=150, deadline=None)
        @given(st.text(max_size=400), st.text(max_size=12))
        def prop(body, agent):
            rules = parse_robots(body, agent or "*")
            assert isinstance(rules, list)
            for prefix, allow in rules:
                assert isinstance(prefix, str)
                assert isinstance(allow, bool)
                assert "*" not in prefix  # wildcard always cut

        prop()


def test_empty_specific_group_exempts_agent():
    """RFC 9309: a group matching the agent applies even when empty —
    'User-agent: mybot / Disallow:' is the canonical exemption and
    must NOT fall back to the '*' group."""
    from document_extractor_spark.functions.robots import parse_robots

    body = "User-agent: mybot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(body, "mybot") == []      # allowed everywhere
    assert parse_robots(body, "otherbot") == [("/", False)]
    # a specific group WITH rules still returns its own rules
    body2 = ("User-agent: mybot\nDisallow: /private\n\n"
             "User-agent: *\nDisallow: /\n")
    assert parse_robots(body2, "mybot") == [("/private", False)]


def test_filter_allowed_urls_table_with_domain_column(spark):
    """A urls table that already carries a 'domain' column must not
    make the rules join ambiguous."""
    from document_extractor_spark.functions.robots import (
        filter_allowed, robots_rules_table)

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /no\n")],
        "domain string, robots_txt string")
    rules = robots_rules_table(robots)
    urls = spark.createDataFrame(
        [("http://a.com/ok", "a.com"), ("http://a.com/no/x", "a.com")],
        "url string, domain string")
    got = filter_allowed(urls, rules).toPandas()
    assert list(got.columns) == ["url", "domain"]
    assert set(got.url) == {"http://a.com/ok"}
