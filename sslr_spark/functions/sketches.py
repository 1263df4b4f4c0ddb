"""Distinct-count statistics: exact and sketched (HLL++).

The exact form is the ORACLE-PARITY path (ANSI ``count(distinct x)``,
DuckDB-checkable). The approx form is the production path for
100 TB-scale cardinality work: Spark's native HyperLogLog++
(``approx_count_distinct``) aggregates a fixed-size sketch map-side —
no per-group distinct shuffle of the raw values — with relative
standard deviation ``rsd``. Same dual-path pattern as the IVF
quantizer (fixed deterministic variant hash-checked, scalable variant
for production).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | Column,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group row count + distinct-value count of ``value_col``.

    ``exact=True``: ANSI ``count(distinct ...)`` — Spark expands this
    to a two-phase aggregate (distinct on (group, value), then count):
    correct but shuffles every distinct pair.

    ``exact=False``: HLL++ sketch with relative standard deviation
    ``rsd`` — one map-side-combinable pass, constant memory per group;
    the right plan when groups hold billions of distinct values.

    Output: ``group_cols..., n_rows, n_distinct``.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    counter = (
        F.count_distinct(v) if exact else F.approx_count_distinct(v, rsd=rsd)
    )
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        counter.cast("long").alias("n_distinct"),
    )
