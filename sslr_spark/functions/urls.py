"""URL canonicalization and URL-level dedup — the crawl pipeline's
first dedup pass (Common Crawl carries the same page under
``HTTP://Host.com:80/x#frag`` and ``http://host.com/x``; URL-level
collapse runs before any content hash because it needs no payload).

Engine parity: Spark's ``parse_url`` has no DuckDB analog, so parts
come from ONE shared RFC-3986-shaped regex literal evaluated by both
engines (Java regex and RE2 agree on it — no backrefs, no
lookaround). All pure codegen expressions, no UDF, no shuffle for the
canonicalization itself.

Beyond-reference surface (crawl ingestion support, with
sources/warc.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# groups: 1 scheme, 2 authority (host[:port]), 3 path, 4 query
# (fragment is matched and dropped). Shared literal — the oracle uses
# the same string via URL_RE_SQL.
URL_RE = (
    "^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)"
    "([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
)


def _grp(col: Column, i: int) -> Column:
    return F.regexp_extract(col, URL_RE, i)


def canonical_url(col: Column) -> Column:
    """Canonical form: scheme and host lowercased, default ports
    stripped (:80 for http, :443 for https), fragment dropped, empty
    path -> '/', query kept verbatim when non-empty (parameter
    re-ordering is a site-semantics judgement this operator refuses
    to make). Scheme-less inputs canonicalize to 'http'."""
    scheme = F.lower(F.nullif(_grp(col, 1), F.lit("")))
    scheme = F.coalesce(scheme, F.lit("http"))
    auth = F.lower(_grp(col, 2))
    host = F.regexp_replace(auth, ":[0-9]+$", "")
    port = F.regexp_extract(auth, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = _grp(col, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _grp(col, 4)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )


def url_host(col: Column) -> Column:
    """Lowercased host with any port stripped — the grouping key for
    host-level caps and per-site stats."""
    return F.regexp_replace(F.lower(_grp(col, 2)), ":[0-9]+$", "")


def url_dedup(
    df: DataFrame, url_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: one survivor (smallest ``id_col``) per
    canonical URL. Output: (canonical_url, n_urls, keep_id).

    100 TB shape: canonicalization is a per-row expression; the
    collapse is ONE map-side-combined hash aggregate on the canonical
    string — the exact_dedup_groups shape, no pair join, no window.
    """
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min(id_col).alias("keep_id"),
        )
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB spelling of :func:`canonical_url` over the same shared
    regex literal."""
    re = URL_RE.replace("\\", "\\")
    g = lambda i: f"regexp_extract({expr}, '{re}', {i})"  # noqa: E731
    scheme = f"coalesce(nullif(lower({g(1)}), ''), 'http')"
    auth = f"lower({g(2)})"
    host = f"regexp_replace({auth}, ':[0-9]+$', '')"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} != '' and not ({scheme} = 'http' and {port} = '80')"
        f" and not ({scheme} = 'https' and {port} = '443'))"
    )
    path = f"case when {g(3)} = '' then '/' else {g(3)} end"
    query = g(4)
    return (
        f"concat({scheme}, '://', {host}, "
        f"case when {keep_port} then concat(':', {port}) else '' end, "
        f"{path}, "
        f"case when {query} != '' then concat('?', {query}) "
        f"else '' end)"
    )
