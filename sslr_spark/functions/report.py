"""Corpus release report — the "dataset card" numbers every corpus
ship publishes (docs/chars/words totals, language and source
composition, length quantiles, exact-duplication rate) as ONE
operator call, so release tooling doesn't hand-assemble (and skew)
them from ad-hoc queries.

All-integer output in long format (section, k, v) — bit-exact in any
engine, order-insensitive, and schema-stable as sections grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sslr_spark.functions.text import words


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
    quantiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """One-call corpus summary: (section, k, v) rows —

    - ('total', 'docs' | 'chars' | 'words', count)
    - ('lang', <lang>, docs)         — language composition
    - ('source', <source>, docs)     — provenance composition
    - ('len_quantile', 'p<q>', n)    — exact char-length quantiles:
      the smallest length whose ascending cumulative doc count reaches
      ceil(q/100 * N) (percentile_disc semantics spelled out by hand,
      so no engine's quantile interpolation flavor leaks in)
    - ('dup', 'exact_groups', g)     — distinct md5 content groups
    - ('dup', 'exact_dup_ppm', ppm)  — share of docs that are NOT
      their group's keeper, round-half-up integer ppm

    100 TB shape: one full pass feeds three map-side-combined
    aggregates (totals, per-lang, per-source — each bounded by its
    group cardinality); the quantile section aggregates a length
    histogram (bounded by distinct lengths) and runs its cumulative
    window over THAT, never over documents; the dup section is the
    exact-dedup hash aggregate reduced to two numbers. No window over
    raw rows, no sort, no collect.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("long")

    totals = df.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(n_chars).alias("chars"),
        F.sum(F.size(words(t)).cast("long")).alias("words"),
    )
    tot_rows = totals.selectExpr(
        "stack(3, 'docs', docs, 'chars', chars, 'words', words) as (k, v)"
    ).select(F.lit("total").alias("section"), "k", "v")

    lang_rows = (
        df.groupBy(F.coalesce(F.col(lang_col), F.lit("?")).alias("k"))
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("lang").alias("section"), "k", "v")
    )
    source_rows = (
        df.groupBy(F.coalesce(F.col(source_col), F.lit("?")).alias("k"))
        .agg(F.count(F.lit(1)).alias("v"))
        .select(F.lit("source").alias("section"), "k", "v")
    )

    hist = df.select(n_chars.alias("__len")).groupBy("__len").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wcum = (
        Window.orderBy("__len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the histogram is bounded (distinct lengths), so the global-order
    # window runs over a small frame — same contract as the quantile
    # gate's per-group histogram
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum)).crossJoin(
        F.broadcast(totals.select("docs"))
    )
    q_parts = [
        cum.filter(
            F.col("__cum")
            >= F.ceil(F.lit(q) * F.col("docs") / F.lit(100.0))
        )
        .agg(F.min("__len").alias("v"))
        .select(
            F.lit("len_quantile").alias("section"),
            F.lit(f"p{q}").alias("k"),
            "v",
        )
        for q in quantiles
    ]

    groups = df.groupBy(F.md5(t).alias("__fp")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    dup = groups.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum(F.col("__n") - 1).alias("extra"),
        F.sum("__n").alias("n"),
    )
    dup_rows = dup.select(
        F.lit("dup").alias("section"),
        F.lit("exact_groups").alias("k"),
        F.col("g").cast("long").alias("v"),
    ).unionByName(
        dup.select(
            F.lit("dup").alias("section"),
            F.lit("exact_dup_ppm").alias("k"),
            F.when(F.col("n") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("(2000000 * extra + n) div (2 * n)").cast("long")
            ).alias("v"),
        )
    )

    out = tot_rows
    for part in (lang_rows, source_rows, *q_parts, dup_rows):
        out = out.unionByName(part)
    return out
