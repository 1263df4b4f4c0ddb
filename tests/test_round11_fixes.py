"""Focused tests for the round-11 (optimization round) changes.

Each test pins the behavior of a fix or an optimization-touched
operator internal, per OPTIMIZATION_r11.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---- 1. robots_crawl_delay host normalization (ADVICE r10 item 2) ----


def test_robots_crawl_delay_normalizes_host(spark):
    """The r10 host normalization landed only in robots_allowed;
    robots_crawl_delay emitted raw hosts, so a mixed-case or
    port-suffixed robots corpus silently failed its Crawl-delay open
    to the default when the frontier joined on the normalized
    url_host. Both halves of the robots contract now share the key."""
    from sslr_spark.functions.robots import robots_crawl_delay

    robots = spark.createDataFrame(
        [
            ("EXAMPLE.com", "User-agent: *\nCrawl-delay: 7\n"),
            ("shop.example.org:8080", "User-agent: *\nCrawl-delay: 3\n"),
            ("plain.test", "User-agent: *\nDisallow: /x\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r.host: r.crawl_delay_s
        for r in robots_crawl_delay(robots, agent="sslr-bot").collect()
    }
    # pre-fix: keys came back raw ("EXAMPLE.com", "...:8080") and the
    # normalized-host join in crawl_frontier coalesced delays to 0
    assert got == {
        "example.com": 7,
        "shop.example.org": 3,
        "plain.test": 0,
    }
