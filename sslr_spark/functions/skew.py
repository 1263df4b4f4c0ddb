"""Skew-handling utilities.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense; these helpers cover the cases AQE can't fix:

- ``salted_join``: a shuffle join where one side has pathological hot
  keys — salt the big side, replicate the small side across salts, so
  a hot key spreads over ``n_salts`` reducers instead of one straggler.
- ``two_stage_distinct_count``: COUNT(DISTINCT x) GROUP BY k with a
  hot k — pre-aggregate on (k, x) first (spreads by x), then count per
  k; classic partial-dedup rewrite.

Both are pure plan rewrites (same results, different shuffle shape) —
exactly the kind of strategy you reach for at 100 TB when one tenant /
null-key / default-value dominates a join column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__sslr_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed (big) side salted and the small side
    replicated ``n_salts``x. Result identical to a plain join on
    ``on_cols``; hot keys now occupy ``n_salts`` reducers.

    The salt derives from the full row hash — no RNG, so retried tasks
    recompute identical salts (determinism under speculative retry).
    """
    s = skewed.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(replicated, on_cols + [SALT_COL], how).drop(SALT_COL)


def two_stage_distinct_count(
    df: DataFrame, group_cols: list[str], distinct_col: str, alias: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_cols without funneling
    every hot group's rows through one reducer: stage 1 dedups on
    (group, value) — partitioned by both, so hot groups spread — and
    stage 2 counts per group over the already-small dedup output."""
    return (
        df.select(*group_cols, distinct_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(alias))
    )
