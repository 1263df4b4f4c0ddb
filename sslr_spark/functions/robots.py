"""robots.txt parsing and crawl-permission evaluation (RFC 9309).

Completes the crawl front door (WARC ingest -> HTTP split -> HTML
extract -> link graph): before a URL enters the frontier, the fetch
policy of its host decides whether it may be crawled at all. This
module parses per-host robots.txt bodies into rule rows and evaluates
URL lists against them — all as narrow DataFrame expressions plus
per-host windows, so a 100-million-host robots corpus parses with one
host-partitioned pass and URL evaluation is one equi-join on host.

RFC 9309 semantics implemented:
- groups: consecutive ``User-agent`` lines share one group; rules
  bind to the nearest group above them; rules before any group are
  ignored;
- group selection: the most specific match wins — groups naming the
  crawler's product token exactly beat ``*`` groups; if neither
  exists, everything is allowed;
- rule precedence: longest-path-prefix match wins; at equal length
  ``Allow`` beats ``Disallow``; no matching rule = allowed;
- empty ``Disallow:`` matches nothing (the classic allow-all idiom);
- comments (#...) and unknown directives are dropped.

Deliberate simplification (documented boundary): ``*`` / ``$``
wildcards inside rule paths match literally, not as patterns — the
prefix-match core is what the oracle replays; a production crawler
swaps in a regex compile per rule with identical plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sslr_spark.functions.urls import URL_RE

# shared literal — the DuckDB oracle runs this exact pattern
ROBOTS_LINE_RE = "^(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*)$"


def _effective_group_rows(
    robots_df: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Shared robots parsing core: line explode, comment strip,
    directive extraction, consecutive-UA group numbering and
    most-specific-group selection — returns every DIRECTIVE row
    (allow/disallow/crawl-delay) of each host's selected group as
    (host, directive, value). :func:`robots_rules` and
    :func:`robots_crawl_delay` are projections of this."""
    agent_lc = agent.lower()
    lines = robots_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "ln",
        F.lower(
            F.regexp_extract(F.lower(F.col("line")), ROBOTS_LINE_RE, 1)
        ).alias("directive"),
        F.trim(
            F.regexp_extract(F.col("line"), "(?i)" + ROBOTS_LINE_RE, 2)
        ).alias("value"),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("ln")
    grouped = parsed.select(
        "host",
        "ln",
        "directive",
        "value",
        F.sum(
            F.when(
                (F.col("directive") == "user-agent")
                & (
                    F.coalesce(F.lag("directive").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        )
        .over(w)
        .alias("gid"),
    )
    # group class: 2 = names our agent exactly, 1 = '*', else 0
    agents = grouped.filter(F.col("directive") == "user-agent").select(
        "host",
        "gid",
        F.when(F.lower(F.col("value")) == agent_lc, 2)
        .when(F.col("value") == "*", 1)
        .otherwise(0)
        .alias("cls"),
    )
    gclass = agents.groupBy("host", "gid").agg(F.max("cls").alias("cls"))
    top = gclass.filter(F.col("cls") > 0).groupBy("host").agg(
        F.max("cls").alias("top_cls")
    )
    eligible = gclass.join(top, "host").filter(
        F.col("cls") == F.col("top_cls")
    )
    rules = grouped.filter(
        (F.col("directive") != "user-agent") & (F.col("gid") > 0)
    )
    return rules.join(eligible, ["host", "gid"]).select(
        "host", "directive", "value"
    )


def robots_rules(
    robots_df: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into the effective rule set for
    ``agent``: (host, allow boolean, path) — only the rules of each
    host's most-specific matching group survive.

    One narrow line explode + two per-host windows (group numbering,
    group-class max); no cross-host data movement beyond the initial
    host partitioning.
    """
    rows = _effective_group_rows(robots_df, agent, host_col, body_col)
    return (
        rows.filter(F.col("directive").isin("allow", "disallow"))
        .filter(F.col("value") != "")  # empty Disallow: matches nothing
        .select(
            "host",
            (F.col("directive") == "allow").alias("allow"),
            F.col("value").alias("path"),
        )
        .distinct()
    )


def robots_crawl_delay(
    robots_df: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "robots_txt",
    default_s: int = 0,
) -> DataFrame:
    """Per-host ``Crawl-delay`` (the de-facto politeness directive —
    not in RFC 9309 but honored by most crawlers): the selected
    group's delay in seconds, ``default_s`` when absent or
    non-numeric, the MAX when a group repeats it (be conservative).
    Output: (host, crawl_delay_s) for every host with a robots body.
    """
    rows = _effective_group_rows(robots_df, agent, host_col, body_col)
    # Normalize host the same way robots_allowed normalizes rule and
    # URL hosts (ADVICE r10 item 2): a robots corpus keyed by
    # mixed-case or port-suffixed hosts must not silently fail its
    # Crawl-delay open to the default when the frontier joins delays
    # against the normalized url_host.
    norm = F.lower(F.regexp_replace(F.col("host"), ":[0-9]+$", ""))
    delays = rows.filter(F.col("directive") == "crawl-delay").select(
        norm.alias("host"),
        # try_cast: a malformed delay means "no usable directive",
        # not a poisoned job (ANSI mode makes a plain cast throw)
        F.col("value").try_cast("int").alias("__d"),
    )
    hosts = (
        robots_df.select(F.col(host_col).alias("host"))
        .select(norm.alias("host"))
        .distinct()
    )
    return (
        hosts.join(
            delays.groupBy("host").agg(F.max("__d").alias("__d")),
            "host",
            "left",
        )
        .select(
            "host",
            F.coalesce(F.col("__d"), F.lit(default_s))
            .cast("int")
            .alias("crawl_delay_s"),
        )
    )


def robots_allowed(
    urls_df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Evaluate URLs against :func:`robots_rules` output: longest
    path-prefix match decides; Allow wins length ties; hosts with no
    matching rule (or no rules at all) are allowed.

    One equi-join on host + one per-URL max — rules fan out only to
    URLs of their own host. Every input COLUMN and ROW rides through
    (grouping is by the full input row, so duplicate URLs under
    different ids stay distinct rows).

    ``rules.host`` is normalized (lowercase, ``:port`` stripped) the
    same way the per-URL host is, so a rules corpus keyed by
    mixed-case or port-suffixed hosts still matches instead of
    failing open to allowed=true.
    """
    rules = rules.withColumn(
        "host",
        F.lower(F.regexp_replace(F.col("host"), ":[0-9]+$", "")),
    )
    carry = [c for c in urls_df.columns if c != url_col]
    targets = urls_df.select(
        *carry,
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_replace(
                F.regexp_extract(F.col(url_col), URL_RE, 2), ":[0-9]+$", ""
            )
        ).alias("host"),
        F.when(
            F.regexp_extract(F.col(url_col), URL_RE, 3) == "", "/"
        )
        .otherwise(F.regexp_extract(F.col(url_col), URL_RE, 3))
        .alias("__path"),
    )
    matched = (
        targets.join(rules, "host", "left")
        .withColumn(
            "__hit",
            F.col("path").isNotNull()
            & F.col("__path").startswith(F.col("path")),
        )
        .groupBy(*carry, "url")
        .agg(
            # verdict of the longest matching rule, allow breaking
            # ties: max over (len, allow) tuples of matching rules
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.length("path").alias("l"),
                        F.col("allow").alias("a"),
                    ),
                )
            ).alias("__best")
        )
        .select(
            *carry,
            "url",
            F.coalesce(F.col("__best.a"), F.lit(True)).alias("allowed"),
            F.coalesce(F.col("__best.l"), F.lit(0))
            .cast("int")
            .alias("rule_len"),
        )
    )
    return matched


# shared literals — the DuckDB oracle runs these exact patterns
SITEMAP_ENTRY_RE = "(?s)<url>(.*?)</url>"
SITEMAP_LOC_RE = "(?s)<loc>\\s*(.*?)\\s*</loc>"
SITEMAP_LASTMOD_RE = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>"


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap ingestion — the crawl's OTHER discovery channel next
    to link extraction (sitemaps.org protocol; robots.txt points at
    them via ``Sitemap:`` lines): split the XML into ``<url>``
    entries, recover each entry's ``<loc>`` (whitespace-trimmed, as
    the protocol requires parsers to accept) and optional
    ``<lastmod>`` — the freshness hint a recrawl scheduler keys on.
    A regex cascade over shared literals (the html_to_text
    convention), one narrow explode, zero shuffle, zero UDF; entries
    with no ``<loc>`` are protocol violations and are dropped.

    Every input column rides through; adds (url, lastmod)."""
    carry = [c for c in df.columns if c != xml_col]
    entries = df.select(
        *carry,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_ENTRY_RE), 1)
        ).alias("__entry"),
    )
    return entries.select(
        *carry,
        F.regexp_extract(F.col("__entry"), SITEMAP_LOC_RE, 1).alias("url"),
        F.nullif(
            F.regexp_extract(F.col("__entry"), SITEMAP_LASTMOD_RE, 1),
            F.lit(""),
        ).alias("lastmod"),
    ).filter(F.col("url") != "")
