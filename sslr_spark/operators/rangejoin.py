"""Bucketized range join — interval/tolerance joins without the
BroadcastNestedLoopJoin trap.

Spark compiles a join whose ONLY condition is a range predicate
(``abs(a.ts - b.ts) <= tol``) to a broadcast-nested-loop or cartesian
plan — O(|A| x |B|) row comparisons, a non-starter at cluster scale.
The standard fix (what Databricks' range-join optimization does under
the hood) is binning: quantize the range key into buckets of the
tolerance width, equi-join on the bucket id (left side exploded to its
bucket and both neighbors, so every in-tolerance pair shares a bucket
key), then apply the exact range predicate as a post-filter. Cost:
3x row amplification on one side + ONE hash shuffle on the bucket id,
instead of the all-pairs loop. Time-locality bounds bucket sizes;
AQE's skew-join splitting handles hot buckets.

Optional equi keys (user_id, symbol, ...) compose into the join key,
tightening buckets further — that is the as-of-join's sibling shape
(operators/asof.py) for "all matches in window" instead of "latest
before".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tolerance_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    tolerance: int,
    equi_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with ``|left_on - right_on| <= tolerance``
    (numeric range keys, e.g. epoch-microsecond longs), optionally also
    matching on ``equi_keys``.

    Output: left columns (aliased ``l_``-prefix-free, as-is) joined to
    right columns prefixed ``r_``. ``how='inner'`` (pairs) or
    ``'left'`` (keep unmatched left rows with null right side).

    The left side explodes to its bucket and both neighbors; the right
    side carries its single bucket — amplify the PROBE side, keep the
    (usually bigger) build side single-copy. One shuffle on
    (equi_keys..., bucket).
    """
    if tolerance <= 0:
        raise ValueError("tolerance must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    eq = list(equi_keys or [])
    lb = F.floor(F.col(left_on) / F.lit(tolerance)).cast("long")
    rb = F.floor(F.col(right_on) / F.lit(tolerance)).cast("long")
    lcols = left.columns
    rcols = right.columns
    rx = right.withColumn("__bucket", rb).select(
        "__bucket", F.lit(1).alias("__rmark"),
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    )
    cond = (
        F.abs(F.col(left_on) - F.col(f"r_{right_on}")) <= F.lit(tolerance)
    )
    if how == "inner":
        lx = left.withColumn(
            "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
        )
        return (
            lx.join(
                rx,
                [lx["__bucket"] == rx["__bucket"]]
                + [lx[k] == F.col(f"r_{k}") for k in eq],
                "inner",
            )
            .filter(cond)
            .select(*lcols, *[f"r_{c}" for c in rcols])
        )
    # left outer: ONE plan evaluation end-to-end. A previous design
    # keyed reconstruction on monotonically_increasing_id evaluated in
    # two separate join branches — nondeterministic row ids between the
    # evaluations can duplicate or drop rows. Here the row id is
    # assigned once, the range predicate lives in the join ON clause
    # (unmatched bucket copies get a null right side), and a window
    # over the id picks matched rows or one representative null row.
    from pyspark.sql import Window

    lx = left.select(
        F.monotonically_increasing_id().alias("__lid"), "*"
    ).select(
        "__lid", *lcols,
        F.posexplode(F.array(lb - 1, lb, lb + 1)).alias("__pos", "__bucket"),
    )
    on = (
        (lx["__bucket"] == rx["__bucket"])
        & cond
        & F.lit(True)
    )
    for k in eq:
        on = on & (lx[k] == F.col(f"r_{k}"))
    j = lx.join(rx, on, "left")
    w = Window.partitionBy("__lid")
    j = j.withColumn(
        "__any", F.max(F.col("__rmark").isNotNull().cast("int")).over(w)
    )
    keep = F.col("__rmark").isNotNull() | (
        (F.col("__any") == 0) & (F.col("__pos") == 0)
    )
    return j.filter(keep).select(*lcols, *[f"r_{c}" for c in rcols])
