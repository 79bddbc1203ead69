"""robots.txt parsing + URL filtering (sources/robots.py): RFC 9309
group/matching semantics and the Spark join surface."""

import pandas as pd
import pytest

from csvweb_spark.sources.robots import (_pattern_regex, filter_allowed,
                                         parse_robots_text,
                                         robots_verdicts)

BODY = """# politeness
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /cat/
Allow: /cat/open
Disallow: /*.zip$
Crawl-delay: 10
"""


def test_pattern_regex_translation():
    assert _pattern_regex("/a/") == "^/a/"
    assert _pattern_regex("/*.zip$") == "^/.*\\.zip$"
    assert _pattern_regex("/p?x=*") == "^/p\\?x=.*"


def test_parse_groups_comments_and_fields():
    rules = parse_robots_text("h", BODY)
    # (agent, pattern, allow)
    flat = {(r[1], r[2], r[4]) for r in rules}
    assert flat == {("badbot", "/", False),
                    ("*", "/cat/", False),
                    ("*", "/cat/open", True),
                    ("*", "/*.zip$", False)}


def test_agent_run_shares_rules_and_headless_rules_drop():
    body = ("Disallow: /ignored\n"        # before any group: dropped
            "User-agent: a\nUser-agent: b\nDisallow: /x\n"
            "User-agent: c\nDisallow:\n")  # empty pattern: dropped
    rules = parse_robots_text("h", body)
    assert {(r[1], r[2]) for r in rules} == {("a", "/x"), ("b", "/x")}


def test_field_names_case_insensitive():
    rules = parse_robots_text("h", "USER-AGENT: *\nDISALLOW: /y\n")
    assert [(r[1], r[2], r[4]) for r in rules] == [("*", "/y", False)]


@pytest.fixture()
def crawl(spark):
    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["h1", "h3"],
                      "body": [BODY, "User-agent: *\nAllow: /\n"]}))
    pages = spark.createDataFrame(pd.DataFrame({"url": [
        "http://h1/cat/item1",    # longest match /cat/ -> disallow
        "http://h1/cat/open2",    # /cat/open beats /cat/ -> allow
        "http://h1/f/a.zip",      # wildcard + $ -> disallow
        "http://h1/f/a.zip.html",  # $ anchor does NOT match -> allow
        "http://h1/pub",          # no rule matches -> allow
        "http://h2/cat/item1",    # no robots for host -> allow
        "http://h3/cat/item1",    # allow-all robots
        "http://h1",              # bare origin -> path '/'
    ]}))
    return pages, robots


def test_verdicts_longest_match_and_defaults(spark, crawl):
    pages, robots = crawl
    got = {r.url: r.allowed
           for r in robots_verdicts(pages, robots, "crawler").collect()}
    assert got == {
        "http://h1/cat/item1": False,
        "http://h1/cat/open2": True,
        "http://h1/f/a.zip": False,
        "http://h1/f/a.zip.html": True,
        "http://h1/pub": True,
        "http://h2/cat/item1": True,
        "http://h3/cat/item1": True,
        "http://h1": True,
    }


def test_exact_agent_group_shadows_star(spark, crawl):
    pages, robots = crawl
    got = {r.url: r.allowed
           for r in robots_verdicts(pages, robots, "BadBot").collect()}
    # badbot group: Disallow / -> everything on h1 blocked
    assert not got["http://h1/pub"] and not got["http://h1"]
    assert got["http://h2/cat/item1"] and got["http://h3/cat/item1"]


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(pd.DataFrame(
        {"host": ["h"], "body": ["User-agent: *\nDisallow: /p/\n"
                                 "Allow: /q/\n"]}))
    # same-length allow+disallow on one path: craft via two rules that
    # both match with equal pat_len
    robots2 = spark.createDataFrame(pd.DataFrame(
        {"host": ["h"], "body": ["User-agent: *\nDisallow: /a*\n"
                                 "Allow: /a$\n"]}))
    pages = spark.createDataFrame(pd.DataFrame({"url": ["http://h/a"]}))
    got = robots_verdicts(pages, robots2, "x").collect()[0]
    assert got.allowed is True


def test_filter_allowed_drops_rows(spark, crawl):
    pages, robots = crawl
    kept = {r.url for r in
            filter_allowed(pages, robots, "crawler").collect()}
    assert kept == {"http://h1/cat/open2", "http://h1/f/a.zip.html",
                    "http://h1/pub", "http://h2/cat/item1",
                    "http://h3/cat/item1", "http://h1"}


def test_broadcast_rules_pins_page_side_unshuffled(spark, crawl):
    pages, robots = crawl
    out = robots_verdicts(pages, robots, "crawler",
                          broadcast_rules=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
