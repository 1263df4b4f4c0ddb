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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sslr_spark.functions.hashing import h60


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


# ------------------------------------------------------------------
# Mergeable HyperLogLog registers (engine-portable)
# ------------------------------------------------------------------
#
# Spark's approx_count_distinct is HLL++ but its sketch never leaves
# the aggregate — you cannot persist a per-shard sketch today and
# union it with next week's. This is the PORTABLE register form
# (Flajolet et al. 2007): registers are plain (group, bucket, rho)
# rows built from the oracle-parity h60 hash, so they can be written
# to parquet per shard/day, merged later with a register-wise MAX
# (associative + idempotent — re-merging a shard is harmless), and
# estimated on read. At 100 TB the sketch table is m rows per group
# per shard (m = 2^p, constant), so cross-epoch distinct counts never
# re-touch raw data. The estimate arithmetic is integer until one
# final double division, identical expression shape on both engines.

HLL_P = 6  # 2^6 = 64 registers: ~13% rse — a demo-friendly default


def _hll_rho(h: Column, p: int) -> Column:
    """Position of the first 1-bit (from the left) in the top
    ``60 - p`` bits of the 60-bit hash ``h`` after the bucket bits are
    stripped: rho = (60-p) - bit_length(w) + 1, with the all-zeros
    case pinned to (60-p)+1. bit_length via length(bin(w)) — Spark and
    DuckDB both print minimal-length binary for non-negative longs."""
    # h >> p, NOT h/2^p: double division would round a 60-bit value
    # (2^53 mantissa); shiftright is exact and mirrors DuckDB's >>
    w = F.shiftright(h, p)
    width = F.lit(60 - p)
    return F.when(w == 0, width + 1).otherwise(
        width - F.length(F.bin(w)) + 1
    ).cast("int")


def hll_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL registers of ``value_col``: one row per (group,
    bucket) with the max rho seen — at most 2^p rows per group
    regardless of input size, built with one map-side-combinable
    aggregate. The output IS the sketch: persist it per shard, merge
    with :func:`hll_merge`, estimate with :func:`hll_estimate`."""
    h = F.col("__h")
    hashed = df.select(
        *group_cols,
        h60(F.coalesce(F.col(value_col).cast("string"), F.lit("\x00")))
        .alias("__h"),
    )
    return (
        hashed.select(
            *group_cols,
            (h % F.lit(1 << p)).cast("int").alias("bucket"),
            _hll_rho(h, p).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register rows across shards/epochs: register-wise MAX.
    Associative, commutative, idempotent — the union of any number of
    :func:`hll_build` outputs (same p) is again a valid sketch."""
    return sketch.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """Distinct-count estimate per group from register rows.

    Standard HLL: raw = alpha_m * m^2 / sum(2^-rho) with the
    linear-counting fallback m*ln(m/V) when raw <= 2.5m and some
    register is still zero (V = zero-register count). Engine parity:
    the harmonic sum is the exact BIGINT ``sum(2^(maxw - rho))`` over
    present registers plus ``V * 2^maxw`` for absent ones (maxw =
    61-p, so 64 registers never overflow a long); only the final
    alpha-scale and ln are doubles, with the same literal expression
    shape both sides. Output: (group..., n_buckets_set, estimate)."""
    m = 1 << p
    maxw = 61 - p  # rho <= (60-p)+1 => exponent >= 0, sum < 2^61
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_set"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(maxw) - F.col("rho")).cast("double"))
            .cast("long")
        ).alias("__s_present"),
    )
    v_zero = (F.lit(m) - F.col("n_buckets_set")).cast("long")
    s_total = (
        F.col("__s_present") + v_zero * F.lit(1 << maxw).cast("long")
    ).cast("double")
    raw = (
        F.lit(float(alpha * m * m))
        * F.lit(float(1 << maxw))
        / s_total
    )
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0), lc
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_buckets_set",
        F.floor(est + F.lit(0.5)).cast("long").alias("estimate"),
    )


def column_stats(
    df: DataFrame,
    cols: list[str],
    exact_ndv: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """ANALYZE-shape per-column statistics in ONE scan: for each
    requested column, (n_rows, n_nulls, n_distinct, min_val, max_val)
    — the numbers a planner prunes with (CBO join ordering, scan
    elimination) and an operator (zone maps, bucket pruning, AQE skew
    thresholds) budgets by. All columns aggregate in a single pass
    (one wide aggregate row, unpivoted to long form driver-side-free
    via stack); ``exact_ndv=False`` swaps count_distinct for the
    HLL++ sketch when columns hold billions of distincts.

    min/max are cast to string so heterogeneous column types share
    one output schema — the same convention catalog stats tables use.
    Output: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    """
    aggs = []
    for c in cols:
        v = F.col(c)
        ndv = (
            F.count_distinct(v)
            if exact_ndv
            else F.approx_count_distinct(v, rsd=rsd)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(v.isNull().cast("long")).alias(f"__nulls_{c}"),
            ndv.cast("long").alias(f"__ndv_{c}"),
            F.min(v).cast("string").alias(f"__min_{c}"),
            F.max(v).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )


def topk_bounded(
    df: DataFrame,
    value_col: str,
    shard_col: str,
    m: int = 20,
    k: int = 10,
) -> DataFrame:
    """Communication-efficient distributed top-k with ERROR BOUNDS
    (the TPUT / threshold-algorithm shape, Cao & Wang 2004): each
    shard contributes only its local top-``m`` (value, count) pairs
    plus one residual bound — the count of its m-th item, the most
    any UNREPORTED value could have there. Merged per candidate:
    lb = sum of reported counts, ub = lb + sum of absent shards'
    residuals; a candidate is a CERTIFIED top-k member when its lb
    beats the k-th best ub among the others.

    Why not groupBy(value).count().orderBy? That moves the FULL
    (value, count) table through one shuffle. Here each shard's
    contribution is m+1 rows regardless of how many distinct values
    it holds — at 100 TB the merge input is shards x (m+1) rows. The
    trade is certainty: skewed-across-shards tails may come back
    uncertified (raise m until they do — the standard TPUT round).

    A shard with fewer than m distinct values reports them all and a
    residual of 0 (nothing was withheld). Per-shard ranking windows
    partition by shard — no global window anywhere.

    Output: top-``k`` candidates by (lb desc, value): (value, lb, ub,
    certified).
    """
    counts = df.groupBy(
        F.col(shard_col).alias("__sh"), F.col(value_col).alias("value")
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("__sh").orderBy(
        F.col("__c").desc(), F.col("value")
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    reported = ranked.filter(F.col("__rn") <= m)
    # residual: the m-th count per shard, 0 when the shard reported
    # everything it had
    residual = (
        ranked.groupBy("__sh")
        .agg(
            F.max(F.col("__rn")).alias("__maxrn"),
            F.max(F.when(F.col("__rn") == m, F.col("__c"))).alias("__mth"),
        )
        .select(
            "__sh",
            F.when(F.col("__maxrn") < m, F.lit(0))
            .otherwise(F.col("__mth"))
            .cast("long")
            .alias("__res"),
        )
    )
    cands = reported.select("value").distinct()
    grid = cands.crossJoin(residual)  # candidates x shards — bounded
    merged = (
        grid.join(
            reported.select("__sh", "value", "__c"), ["__sh", "value"], "left"
        )
        .groupBy("value")
        .agg(
            F.sum(F.coalesce(F.col("__c"), F.lit(0))).alias("lb"),
            F.sum(
                F.coalesce(F.col("__c"), F.col("__res"))
            ).alias("ub"),
        )
    )
    topk = merged.orderBy(F.col("lb").desc(), F.col("value")).limit(k)
    # certification: lb must beat every count any OTHER value could
    # reach — the max ub among non-chosen candidates AND the phantom
    # bound for values no shard reported at all (sum of residuals: a
    # value just under every shard's cut could total that much).
    # Conservative spelling over bounded rows.
    phantom = residual.agg(
        F.coalesce(F.sum("__res"), F.lit(0)).alias("__ph")
    )
    others_max_ub = (
        merged.join(topk.select("value"), "value", "left_anti")
        .agg(F.max("ub").alias("__mx0"))
        .crossJoin(F.broadcast(phantom))
        .select(
            F.greatest(
                F.coalesce(F.col("__mx0"), F.lit(0)), F.col("__ph")
            ).alias("__mx")
        )
    )
    return (
        topk.crossJoin(F.broadcast(others_max_ub))
        .select(
            "value",
            F.col("lb").cast("long").alias("lb"),
            F.col("ub").cast("long").alias("ub"),
            # STRICT: a tie with an excluded/unreported value means
            # membership is ambiguous, so refuse to certify it
            (F.col("lb") > F.col("__mx")).alias("certified"),
        )
        .orderBy(F.col("lb").desc(), F.col("value"))
    )


# ------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable
# frequency registers as plain rows — the counting twin of the HLL
# row-form above. depth x width counters per group; point estimates
# are upper bounds with error <= corpus_size * e/width at probability
# 1 - exp(-depth). Registers persist to parquet per shard/epoch and
# merge by SUM — associative and commutative, so cross-shard and
# cross-epoch frequency monitoring never re-touches raw data.
# ------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_cells(value: Column, depth: int, width: int) -> Column:
    """Array of (row, col) cells for a value: row i uses the h60 of a
    row-seeded key — independent-enough hash rows, engine-exact."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    h60(F.concat(F.lit(f"cms{i}:"), value)), F.lit(width)
                )
                .cast("int")
                .alias("col"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-group count-min registers of ``value_col`` occurrences:
    one row per (group, row, col) cell with its counter — at most
    depth*width rows per group regardless of input size, built with
    one explode + one map-side-combinable aggregate. The output IS
    the sketch; merge with :func:`cms_merge`, query with
    :func:`cms_query`."""
    v = F.coalesce(F.col(value_col).cast("string"), F.lit("\x00"))
    return (
        df.select(
            *group_cols,
            F.explode(_cms_cells(v, depth, width)).alias("__c"),
        )
        .groupBy(*group_cols, F.col("__c.row").alias("row"),
                 F.col("__c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register rows across shards/epochs: cell-wise SUM —
    the union of any number of :func:`cms_build` outputs (same
    depth/width) is again a valid sketch."""
    return sketch.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate the count of each (group, item) pair: the MIN
    over the item's depth cells (missing cell = 0). Never
    underestimates the true count — the CMS guarantee — and is exact
    when no other value collides on all depth rows.

    Scale shape: items explode to depth probe rows and equi-join the
    register table on (group, row, col) — a bounded broadcast-size
    probe against a sketch whose size is independent of corpus size.
    Output: group_cols + (value_col, est)."""
    v = F.coalesce(F.col(value_col).cast("string"), F.lit("\x00"))
    probes = items.select(
        *group_cols,
        F.col(value_col),
        F.explode(_cms_cells(v, depth, width)).alias("__c"),
    ).select(
        *group_cols,
        value_col,
        F.col("__c.row").alias("row"),
        F.col("__c.col").alias("col"),
    )
    return (
        probes.join(sketch, [*group_cols, "row", "col"], "left")
        .groupBy(*group_cols, value_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
            .cast("long")
            .alias("est")
        )
    )
