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


# ---- 2. simhash single-shuffle fingerprint (occurrence-sum form) ----

def test_simhash_occurrence_sum_equals_freq_weighted_form(spark):
    """The r11 simhash removes the (doc, word) frequency aggregate by
    summing each OCCURRENCE's ±1 bit contribution directly. On a
    corpus with heavy word repetition (where freq-weighting matters)
    the fingerprints must equal the explicit freq-weighted reference
    computed here, for both hash modes."""
    from sslr_spark.functions.dedup import simhash
    from sslr_spark.functions.hashing import h60, h64_fast
    from sslr_spark.functions.text import words

    rows = [
        (1, "spark spark spark join join shuffle"),
        (2, "one of each word here now"),
        (3, "aaa aaa bbb bbb aaa ccc aaa"),
        (4, "x"),
        (5, "   "),  # empty after trim: must NOT appear in output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for mode, word_hash in (("fast", h64_fast(F.col("word"))),
                            ("portable", h60(F.col("word")))):
        got = {
            r.doc_id: r.simhash
            for r in simhash(df, hash_mode=mode).collect()
        }
        wc = (
            df.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
            .groupBy("doc_id", "word")
            .agg(F.count(F.lit(1)).alias("freq"))
            .withColumn("h", word_hash)
        )
        per_bit = wc.groupBy("doc_id").agg(
            *[
                F.sum(F.expr(f"freq * (((h >> {b}) & 1) * 2 - 1)"))
                .alias(f"s{b}")
                for b in range(32)
            ]
        )
        fp = None
        for b in range(32):
            term = F.when(
                F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            fp = term if fp is None else fp + term
        want = {
            r.doc_id: r.simhash
            for r in per_bit.select("doc_id", fp.alias("simhash")).collect()
        }
        assert got == want, mode
        assert 5 not in got  # all-whitespace doc stays absent
