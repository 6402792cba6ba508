"""robots.txt parser tests: RFC 9309 subset — user-agent grouping with
forward fill, case-insensitive directives, comments, crawl-delay, and the
parsed table feeding the broadcast annotate step."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark import robots

BODY_STAR = """# global rules
User-Agent: *
Disallow: /private
disallow: /tmp/
Crawl-Delay: 2

User-agent: googlebot
Disallow: /only-for-google
"""

BODY_OTHER = """User-agent: bingbot
Disallow: /everything
"""


def _raw(spark):
    return spark.createDataFrame(
        [("h1.com", BODY_STAR), ("h2.com", BODY_OTHER)], "host string, body string"
    )


def test_parse_rules_star_group_only(spark):
    rules = {r["host"]: r for r in robots.parse_rules(_raw(spark)).collect()}
    # h1: only the * group's directives, sorted; delay 2 s -> 2000 ms
    assert list(rules["h1.com"]["disallow_prefix"]) == ["/private", "/tmp/"]
    assert rules["h1.com"]["crawl_delay_ms"] == 2000
    # h2 has no * group -> no rules row (annotate treats absent as allowed)
    assert "h2.com" not in rules


def test_parsed_rules_drive_annotate(spark):
    rules = robots.parse_rules(_raw(spark))
    frontier = spark.createDataFrame(
        [
            ("h1.com", "https://h1.com/private/x"),
            ("h1.com", "https://h1.com/public"),
            ("h2.com", "https://h2.com/everything"),
        ],
        "host string, url string",
    )
    got = {r["url"]: r["blocked"] for r in robots.annotate(frontier, rules).collect()}
    assert got["https://h1.com/private/x"] is True
    assert got["https://h1.com/public"] is False
    assert got["https://h2.com/everything"] is False  # no * rules for h2


def test_parse_rules_stacked_user_agents_share_rules(spark):
    """RFC 9309 §2.1: consecutive User-agent lines form one group; rules
    below apply to ALL of them, even when '*' is not the last UA line."""
    body = "User-agent: *\nUser-agent: googlebot\nDisallow: /private\n"
    rules = {r["host"]: r for r in robots.parse_rules(
        spark.createDataFrame([("h.com", body)], "host string, body string")
    ).collect()}
    assert list(rules["h.com"]["disallow_prefix"]) == ["/private"]


def test_parse_rules_survives_malformed_crawl_delay(spark):
    """A junk Crawl-delay value must not abort the job (ANSI cast) — it is
    ignored; and the delay min must be NUMERIC, not lexicographic."""
    body = (
        "User-agent: *\nCrawl-delay: abc\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n\n"
        "User-agent: *\nCrawl-delay: 2\n"
    )
    rules = {r["host"]: r for r in robots.parse_rules(
        spark.createDataFrame([("h.com", body)], "host string, body string")
    ).collect()}
    # numeric min(10, 2) = 2 -> 2000 ms (a string min would pick '10')
    assert rules["h.com"]["crawl_delay_ms"] == 2000


def test_parse_rules_ignores_rules_before_any_group(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    rules = {r["host"]: r for r in robots.parse_rules(
        spark.createDataFrame([("h.com", body)], "host string, body string")
    ).collect()}
    assert list(rules["h.com"]["disallow_prefix"]) == ["/real"]


def test_parse_rules_degenerate_bodies(spark):
    """Empty bodies, comment-only bodies, and a UA group with no rules all
    parse without error and yield sane rows (or none)."""
    raw = spark.createDataFrame(
        [
            ("empty.com", ""),
            ("comments.com", "# nothing here\n\n# still nothing"),
            ("bare.com", "User-agent: *\n"),
        ],
        "host string, body string",
    )
    rules = {r["host"]: r for r in robots.parse_rules(raw).collect()}
    assert "empty.com" not in rules and "comments.com" not in rules
    assert list(rules["bare.com"]["disallow_prefix"]) == []
    assert rules["bare.com"]["crawl_delay_ms"] is None
