"""robots.txt politeness (operators/robots.py)."""

from __future__ import annotations

from slower_whisper_spark.operators.robots import (
    parse_robots,
    parse_robots_body,
    robots_verdicts,
)


def test_parse_body_groups_comments_empty():
    body = (
        "# header comment\n"
        "Disallow: /dangling\n"            # before any group: dropped
        "User-agent: A\n"
        "User-agent: B\n"                  # stacked agents share rules
        "Disallow: /x # trailing comment\n"
        "Allow: /x/ok\n"
        "Disallow:\n"                      # empty = unrestricted, no rule
        "Crawl-delay: 5\n"                 # unknown directive ignored
        "User-agent: *\n"
        "Disallow: /private\n"
    )
    rules = parse_robots_body(body)
    assert ("a", "disallow", "/x") in rules and ("b", "disallow", "/x") in rules
    assert ("a", "allow", "/x/ok") in rules
    assert ("*", "disallow", "/private") in rules
    assert not any(p == "/dangling" for _, _, p in rules)
    assert not any(p == "" for _, _, p in rules)


def test_verdicts_longest_match_allow_wins(spark):
    robots = spark.createDataFrame(
        [("site.org", "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /a/b")],
        "domain string, body string",
    )
    pages = spark.createDataFrame(
        [
            ("https://www.site.org/a/x",),     # /a disallow
            ("https://www.site.org/a/b/c",),   # tie at len 4: allow wins
            ("https://www.site.org/free",),    # no rule
            ("https://other.org/a/x",),        # no robots for domain
        ],
        "url string",
    )
    got = {r.url: r for r in robots_verdicts(pages, parse_robots(robots)).collect()}
    assert got["https://www.site.org/a/x"].verdict == "blocked"
    tie = got["https://www.site.org/a/b/c"]
    assert tie.verdict == "allowed" and tie.matched_prefix == "/a/b"
    free = got["https://www.site.org/free"]
    assert free.verdict == "allowed" and free.matched_rule is None
    assert got["https://other.org/a/x"].verdict == "allowed"


def test_agent_specific_group(spark):
    robots = spark.createDataFrame(
        [("s.org", "User-agent: mybot\nDisallow: /\n\nUser-agent: *\nAllow: /")],
        "domain string, body string",
    )
    pages = spark.createDataFrame([("https://s.org/x",)], "url string")
    rules = parse_robots(robots)
    assert robots_verdicts(pages, rules, agent="mybot").collect()[0].verdict == "blocked"
    # generic agent: its group is Allow-/ and mybot's group does not apply
    assert robots_verdicts(pages, rules, agent="nicebot").collect()[0].verdict == "allowed"
