"""Full filtered table copy (reference S1 -> S3).

The reference streams ``select * from t [where f]`` row-by-row into a
truncate+COPY transaction (reference internal/copy.go:11-59). Spark
version: a declarative filtered read written atomically — Catalyst
pushes the filter to the scan (parquet row-group pruning / JDBC WHERE)
and executors write in parallel; the staged-rename overwrite supplies
the truncate+COPY transactionality.

Progress reporting (reference internal/copy.go:61-105 logs every
10k/100k/500k rows) maps to ``df.observe`` — a zero-cost accumulator
collected on the same job, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from sslr_spark.sources.parquet import ParquetDatabase


def filtered_source(
    df: DataFrame, where: str | None, drop_version: str | None = None
) -> DataFrame:
    """Apply the user filter and optionally drop the engine's version
    column from the payload (the reference strips xmin from copied
    columns, internal/updates.go:117-124).

    The filter is evaluated through ``spark.sql`` (not ``F.expr``)
    because the reference allows arbitrary SQL in ``where`` including
    subqueries over 'uses' tables (reference sslr.json:15-24, P9) —
    callers register those as temp views first. Catalyst produces the
    same pushed-down plan either way."""
    if where:
        import uuid

        spark = df.sparkSession
        name = f"__sslr_src_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(name)
        try:
            df = spark.sql(f"select * from {name} where {where}")
            # force analysis while the view exists, then drop it — the
            # resolved plan no longer needs the view
            df.schema
        finally:
            spark.catalog.dropTempView(name)
    if drop_version and drop_version in df.columns:
        df = df.drop(drop_version)
    return df


def copy_full_table(
    source_df: DataFrame,
    target: ParquetDatabase,
    table: str,
    where: str | None = None,
    drop_version: str | None = None,
) -> int:
    """Overwrite ``table`` in the target with the filtered source.

    Returns the number of rows copied, counted via ``observe`` on the
    write job itself (no extra scan). ``drop_version`` strips the
    engine's version column from the payload (JDBC targets — the
    reference strips xmin, internal/updates.go:117-124).
    """
    obs = Observation(f"copy_{table}")
    df = filtered_source(source_df, where, drop_version=drop_version).observe(
        obs, F.count(F.lit(1)).alias("rows")
    )
    target.overwrite(table, df)
    return int(obs.get["rows"])
