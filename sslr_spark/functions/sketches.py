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


def quantile_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles of ``value_col``.

    ``exact=True`` uses ``percentile`` (exact interpolated — the
    oracle-parity path, same semantics as DuckDB ``quantile_cont``;
    sorts each group's values). ``exact=False`` uses
    ``approx_percentile`` (Greenwald-Khanna sketch, bounded memory,
    map-side combinable — rank error ≤ 1/accuracy) for groups too big
    to sort. Output: ``group_cols..., n_rows, q_50, q_95, ...``
    (quantile column names from the percentage points).
    """
    v = F.col(value_col)
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    agg = (
        F.percentile(v, qarr)
        if exact
        else F.percentile_approx(v, qarr, F.lit(accuracy))
    )
    # permille-based names are unambiguous for any quantile:
    # 0.5 -> q_500, 0.95 -> q_950, 0.125 -> q_125, 1.0 -> q_1000
    names = [f"q_{int(round(q * 1000))}" for q in quantiles]
    out = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"), agg.alias("__q")
    )
    return out.select(
        *group_cols,
        "n_rows",
        *[
            F.col("__q").getItem(i).cast("double").alias(n)
            for i, n in enumerate(names)
        ],
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    exact: bool = True,
    support: float = 0.01,
) -> DataFrame:
    """Most frequent values of ``value_col``.

    ``exact=True``: full count + global top-k (TakeOrdered — no full
    sort; the oracle-parity path). ``exact=False``: Spark's
    ``freqItems`` (Karp-Papadimitriou-Shenker single-pass sketch) —
    returns a SUPERSET of the values with frequency > ``support``
    (possible false positives, no false negatives), constant memory,
    for corpora where even the (value, count) aggregate is too big.
    Exact output: ``value, cnt``; sketch output: ``value`` only
    (frequencies are not tracked by the sketch).
    """
    if exact:
        return (
            df.groupBy(F.col(value_col).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("value"))
            .limit(k)
        )
    row = df.select(value_col).stat.freqItems([value_col], support).first()
    # the sketch can surface a frequent NULL — sort it last instead of
    # crashing sorted() on a None comparison
    vals = sorted(
        row[f"{value_col}_freqItems"], key=lambda v: (v is None, v)
    )
    return df.sparkSession.createDataFrame(
        [(v,) for v in vals], f"value {dict(df.dtypes)[value_col]}"
    )
