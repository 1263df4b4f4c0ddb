"""Z-order (Morton) clustering expression — the plain-parquet analog
of Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Sorting a table by one column gives tight parquet row-group min/max
spans on THAT column only; predicates on a second column still scan
everything. Interleaving the bits of several columns' normalized ranks
into one sort key makes row-group statistics selective on EVERY
participating column at once (each loses ~bits/n of resolution — the
classic space-filling-curve trade).

Everything is built-in JVM expressions (shift/or chains unroll inside
whole-stage codegen — ``bits * n_cols`` terms, 32 for the default
2-column key); the only driver-side work is one bounded min/max agg
(2 scalars per column) to normalize ranges. Use the resulting column
as ``sort_cols`` for the partitioned writers or
``ParquetDatabase.compact_partitions`` to Z-cluster during
maintenance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Normalize a numeric column into an unsigned ``bits``-bit rank.
    Degenerate ranges (mn == mx, or all-null stats) map to 0; nulls
    sort first (rank 0) like Spark's default null ordering."""
    top = (1 << bits) - 1
    if mx <= mn:
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
    # NaN values would otherwise poison the clamp (NaN compares
    # greatest in Spark, so least(NaN, 1.0) = 1.0 silently pins the
    # rank to top); send them to rank 0 with the nulls instead
    frac = F.when(F.isnan(frac), F.lit(0.0)).otherwise(frac)
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.coalesce(
        F.floor(clamped * top).cast("long"), F.lit(0).cast("long")
    )


def morton_code(
    df: DataFrame, cols: list[str], bits: int = 16
) -> Column:
    """Morton (Z-curve) key over ``cols``: per-column min/max
    normalization to ``bits``-bit ranks, then bit interleave
    (column i contributes bit b at position ``b * n + i``).

    One driver-bounded stats agg (2 scalars per column); the returned
    Column is a pure per-row expression. ``bits * len(cols)`` must fit
    a signed long (<= 62)."""
    n = len(cols)
    if n == 0:
        raise ValueError("morton_code needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits * n_cols = {bits * n} exceeds long range")
    # NaN-safe stats: Spark's max() ranks NaN above everything, so one
    # NaN row would make mx = NaN and collapse the whole column's
    # ranks to a constant. Exclude NaNs from the range for
    # float/double columns (they rank 0 per _scaled's NaN clamp).
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)

    def _clean(c: str) -> Column:
        if types.get(c) in ("float", "double"):
            return F.when(~F.isnan(F.col(c)), F.col(c))
        return F.col(c)

    stats = df.agg(
        *[F.min(_clean(c)).alias(f"mn{i}") for i, c in enumerate(cols)],
        *[F.max(_clean(c)).alias(f"mx{i}") for i, c in enumerate(cols)],
    ).first()  # bounded: 2 scalars per column
    code = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn{i}"], stats[f"mx{i}"]
        if mn is None or mx is None:
            continue  # all-null column contributes nothing
        rank = _scaled(F.col(c), float(mn), float(mx), bits)
        for b in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(rank, b).bitwiseAND(F.lit(1)), b * n + i
                ).cast("long")
            )
    return code.alias("__zorder")
