"""robots.txt text parsing -> engine rule dicts (T8 ingestion path)."""

from vbpl_web_crawl_spark.crawl.politeness import (
    DEFAULT_CRAWL_DELAY,
    host_budget,
    parse_robots_txt,
)

ROBOTS = """\
# comments are ignored
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 3

User-agent: vbpl-crawler
Disallow: /internal/
Crawl-delay: 0.5
"""


def test_wildcard_group():
    r = parse_robots_txt(ROBOTS)
    assert r["crawl_delay"] == 3.0
    assert r["disallow"] == ("/private/", "/tmp/")


def test_specific_agent_wins():
    r = parse_robots_txt(ROBOTS, agent="vbpl-crawler")
    assert r["crawl_delay"] == 0.5
    assert r["disallow"] == ("/internal/",)


def test_shared_group_and_defaults():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    for agent in ("a", "b"):
        r = parse_robots_txt(txt, agent=agent)
        assert r["disallow"] == ("/x/",)
        assert r["crawl_delay"] == DEFAULT_CRAWL_DELAY
    # unknown agent, no '*' group -> allow all with default delay
    r = parse_robots_txt(txt, agent="zzz")
    assert r["disallow"] == ()


def test_empty_disallow_means_allow_all():
    r = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert r["disallow"] == ()


def test_parsed_rules_feed_budget():
    r = parse_robots_txt(ROBOTS)
    assert host_budget(r["crawl_delay"], 60.0) == 20
