"""Bucketed parquet tables: co-located joins without a shuffle.

The sync engine's bucket column (operators/deletes.py with_bucket)
diffs tables bucket-by-bucket; THIS module is the storage-layout twin:
Spark's native ``bucketBy`` writer pins rows to hash buckets ON DISK,
so two tables bucketed the same way join with ZERO Exchange — at
100 TB the single biggest join cost simply disappears for every
repeated join on the bucket key (fact-to-fact joins, CDC merge reads,
repeated dedup-pair verification). The price is paid once at write
time (one shuffle into the bucket layout) and amortized over every
subsequent join; that trade is the whole point of bucketing.

Bucketed tables need a catalog entry (bucket metadata lives in the
table definition, not the files), so writes go through
``saveAsTable`` with an explicit ``path`` — works against the default
in-memory catalog of a vanilla session; no Hive metastore required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    path: str,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed parquet table and return the
    catalog-backed read handle (reading through ``spark.table`` is
    what lets the planner SEE the bucketing and drop the join
    Exchange — a plain ``spark.read.parquet`` of the same files
    would not).

    The pre-write ``repartition(n_buckets, bucket_cols)`` gives one
    file per bucket, which also lets ``sort_cols`` survive as a
    per-bucket sort the sort-merge join can reuse."""
    spark = df.sparkSession
    spark.sql(f"drop table if exists {table_name}")
    w = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)
    return spark.table(table_name)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    path: str,
    n_buckets: int = 8,
    name_prefix: str = "bucketed",
    tag: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stage two DataFrames as same-bucketing tables keyed for an
    exchange-free join: both bucketed into ``n_buckets`` on their join
    key and sorted within buckets.

    Table names are DETERMINISTIC per ``name_prefix`` so repeated
    calls in one session (e.g. bench reps) reclaim the previous
    pair's catalog entries and table directory through
    write_bucketed's drop-if-exists + overwrite, instead of
    accumulating uuid-suffixed tables.  Pass ``tag`` when two pairs
    must coexist in one session (the in-memory catalog is
    session-global)."""
    suffix = f"_{tag}" if tag else ""
    lt = write_bucketed(
        left, f"{path}/l", f"{name_prefix}_l{suffix}",
        [key_left], n_buckets, sort_cols=[key_left],
    )
    rt = write_bucketed(
        right, f"{path}/r", f"{name_prefix}_r{suffix}",
        [key_right], n_buckets, sort_cols=[key_right],
    )
    return lt, rt
