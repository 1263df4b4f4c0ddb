"""General OLAP query shapes (beyond the reference's issued SQL).

The reference never issues joins/windows/rollups itself (SURVEY §2.3,
§2.4 "All exist natively in Spark if ever needed") — these queries
demonstrate that the rebuilt engine covers the standard analytics
surface its users would expect from a Spark-based replacement, each
with a DuckDB oracle.

Float policy: aggregate sums rounded; counts exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sslr_spark.queries import _t, read_events


def q_x_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: multi-aggregate groupBy with computed measures
    over the filtered lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice), 2) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
       round(avg(l_quantity), 6) as avg_qty,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""


def q_x_topk_per_group(spark, sf_dir):
    """Top-3 orders by total price per order priority (window top-k —
    the canonical 'no global sort' ranking pattern)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "o_orderpriority", "rank", "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


SQL_TOPK_GROUP = """
select o_orderpriority, rank, o_orderkey, total from (
  select o_orderpriority,
         cast(row_number() over (partition by o_orderpriority
                                 order by o_totalprice desc, o_orderkey) as bigint) as rank,
         o_orderkey, round(o_totalprice, 2) as total
  from orders
) where rank <= 3
"""


def q_x_pivot(spark, sf_dir):
    """Pivot: revenue by returnflag x linestatus. Spark runs a real
    .pivot(); the oracle spells it as conditional aggregation (the
    portable relational form)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(disc))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("rev_open"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("rev_filled"),
    )


SQL_PIVOT = """
select l_returnflag,
       round(coalesce(sum(case when l_linestatus = 'O'
             then l_extendedprice * (1 - l_discount) end), 0.0), 2) as rev_open,
       round(coalesce(sum(case when l_linestatus = 'F'
             then l_extendedprice * (1 - l_discount) end), 0.0), 2) as rev_filled
from lineitem group by l_returnflag
"""


def q_x_rollup(spark, sf_dir):
    """Rollup: order counts at (status, priority), (status), and total
    levels, with grouping ids for level identification."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


SQL_ROLLUP = """
select o_orderstatus, o_orderpriority, count(*) as n,
       cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) as bigint) as gid
from orders group by rollup(o_orderstatus, o_orderpriority)
"""


def q_x_funnel(spark, sf_dir):
    """Event funnel: per user, did signup -> click -> purchase happen in
    order? Min event times per stage compared pairwise (window-free
    conditional aggregation — one shuffle)."""
    ev = read_events(spark, sf_dir)
    stage = lambda s: F.min(F.when(F.col("event_type") == s, F.col("ts_us")))
    per_user = ev.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    reached2 = F.col("t_signup").isNotNull() & F.col("t_click").isNotNull() & (
        F.col("t_click") > F.col("t_signup")
    )
    reached3 = reached2 & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t_click")
    )
    return per_user.select(
        "user_id",
        F.col("t_signup").isNotNull().alias("reached_signup"),
        reached2.alias("reached_click"),
        reached3.alias("reached_purchase"),
    )


SQL_FUNNEL = """
with per_user as (
  select user_id,
         min(case when event_type = 'signup' then epoch_us(cast(ts as timestamp)) end) as t_signup,
         min(case when event_type = 'click' then epoch_us(cast(ts as timestamp)) end) as t_click,
         min(case when event_type = 'purchase' then epoch_us(cast(ts as timestamp)) end) as t_purchase
  from events group by user_id
)
select user_id,
       t_signup is not null as reached_signup,
       (t_signup is not null and t_click is not null and t_click > t_signup)
         as reached_click,
       (t_signup is not null and t_click is not null and t_click > t_signup
        and t_purchase is not null and t_purchase > t_click) as reached_purchase
from per_user
"""


def q_x_join_star(spark, sf_dir):
    """TPC-H Q5 shape: 5-way star join (region -> nation -> customer ->
    orders -> lineitem), revenue per nation. Catalyst broadcast-joins
    the small dims and reorders; no hints needed."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        region.join(nation, region["r_regionkey"] == nation["n_regionkey"])
        .join(cust, nation["n_nationkey"] == cust["c_nationkey"])
        .join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(disc), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_JOIN_STAR = """
select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*) as n_items
from region
join nation on r_regionkey = n_regionkey
join customer on n_nationkey = c_nationkey
join orders on c_custkey = o_custkey
join lineitem on o_orderkey = l_orderkey
where r_name = 'ASIA'
group by n_name
"""


def q_x_scalar_functions(spark, sf_dir):
    """Scalar-function closure for SURVEY §2.7: every scalar the
    reference's issued SQL uses — md5, coalesce, string concat, casts,
    case when — in one projection."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name")).alias("name_md5"),
        F.coalesce(F.col("p_brand"), F.lit("?")).alias("brand"),
        F.concat_ws("|", F.col("p_type"), F.col("p_size").cast("string")).alias(
            "type_size"
        ),
        F.col("p_partkey").cast("string").alias("key_str"),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .when(F.col("p_retailprice") > 1000, "standard")
        .otherwise("budget")
        .alias("tier"),
    )


SQL_SCALARS = """
select p_partkey,
       md5(p_name) as name_md5,
       coalesce(p_brand, '?') as brand,
       concat_ws('|', p_type, cast(p_size as varchar)) as type_size,
       cast(p_partkey as varchar) as key_str,
       case when p_retailprice > 1500 then 'premium'
            when p_retailprice > 1000 then 'standard'
            else 'budget' end as tier
from part
"""


def q_x_set_ops(spark, sf_dir):
    """Set operations (absent from the reference's issued SQL,
    SURVEY §2.6 — free on Spark): high-value orders EXCEPT ALL
    open-status ones, UNION ALL the intersection of two slices."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("total")
    )
    high = o.filter(F.col("total") > 400000)
    open_ = o.filter(F.col("o_orderstatus") == "O")
    first = o.filter(F.col("o_orderkey") < 1000)
    second = o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500))
    return high.exceptAll(open_).unionByName(first.intersectAll(second))


SQL_SET_OPS = """
with o as (select o_orderkey, o_orderstatus, round(o_totalprice, 2) as total
           from orders)
select * from (select * from o where total > 400000
               except all
               select * from o where o_orderstatus = 'O')
union all
select * from (select * from o where o_orderkey < 1000
               intersect all
               select * from o where o_orderkey >= 500 and o_orderkey < 1500)
"""


def q_x_date_rollup(spark, sf_dir):
    """Time-series rollup on the NTZ ship date: revenue by (year,
    month) — the date-dimension aggregation every CDC-fed warehouse
    runs. NTZ extraction is timezone-free on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy(
            F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
        )
        .agg(
            F.round(F.sum(disc), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DATE_ROLLUP = """
select cast(extract(year from l_shipdate) as int) as y,
       cast(extract(month from l_shipdate) as int) as m,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*) as n_items
from lineitem group by 1, 2
"""


def q_x_cumulative_window(spark, sf_dir):
    """Running-total window frame (rows unbounded-preceding..current):
    cumulative customer spend over their order history — the one
    window frame spec (cumulative) not exercised by the top-k /
    lag-sessionize / funnel queries. Frame order is (date, orderkey),
    unique per customer, so the floating accumulation order is
    deterministic and both engines round identical prefix sums."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    )


SQL_CUMULATIVE = """
select o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') as order_date,
       round(sum(o_totalprice) over (
         partition by o_custkey order by o_orderdate, o_orderkey
         rows between unbounded preceding and current row), 2) as cum_spend
from orders where o_custkey % 50 = 0
"""


def q_x_window_suite(spark, sf_dir):
    """The remaining ranking/navigation window functions in one query:
    lag/lead, rank/dense_rank, ntile, percent_rank/cume_dist over each
    customer's order history. Order (date, orderkey) is unique per
    partition, so every function is deterministic; fractional ranks
    are rounded for float parity."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


SQL_WINDOW_SUITE = """
select o_custkey, o_orderkey,
       round(lag(o_totalprice) over w, 2) as prev_price,
       round(lead(o_totalprice) over w, 2) as next_price,
       cast(rank() over w as bigint) as rnk,
       cast(dense_rank() over w as bigint) as drnk,
       cast(ntile(4) over w as bigint) as quartile,
       round(percent_rank() over w, 6) as pct_rank,
       round(cume_dist() over w, 6) as cdist
from orders where o_custkey % 100 = 0
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
"""


def q_x_cube(spark, sf_dir):
    """CUBE aggregation: all four grouping levels of
    (returnflag, linestatus) with grouping ids — the one grouping-set
    shape x_rollup's hierarchy doesn't produce."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().cast("long").alias("gid"),
    )


SQL_CUBE = """
select l_returnflag, l_linestatus, count(*) as n,
       round(sum(l_quantity), 2) as sum_qty,
       cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint)
         as gid
from lineitem group by cube(l_returnflag, l_linestatus)
"""


def q_x_distinct_stats(spark, sf_dir):
    """Per-priority customer cardinality of orders — the exact
    (oracle-parity) path of functions/sketches.py:distinct_stats; the
    HLL++ ``exact=False`` variant is the production plan for groups
    with billions of distinct values (error-bound-tested in
    tests/test_sketches.py)."""
    from sslr_spark.functions.sketches import distinct_stats

    return distinct_stats(
        _t(spark, sf_dir, "orders"), ["o_orderpriority"], "o_custkey"
    )


SQL_DISTINCT_STATS = """
select o_orderpriority,
       cast(count(*) as bigint) as n_rows,
       cast(count(distinct o_custkey) as bigint) as n_distinct
from orders group by o_orderpriority
"""


def q_x_heavy_hitters(spark, sf_dir):
    """Exact top-10 heavy hitters of lineitem quantities — the
    oracle-parity path of functions/sketches.py:heavy_hitters (global
    top-k via TakeOrdered, no full sort); the ``exact=False``
    freqItems sketch is the superset-guarantee production path for
    value domains too large to aggregate (tested in
    tests/test_sketches.py)."""
    from sslr_spark.functions.sketches import heavy_hitters

    out = heavy_hitters(_t(spark, sf_dir, "lineitem"), "l_quantity", k=10)
    return out.select(F.col("value").cast("long").alias("value"), "cnt")


SQL_HEAVY_HITTERS = """
select cast(l_quantity as bigint) as value, count(*) as cnt
from lineitem group by l_quantity
order by cnt desc, l_quantity limit 10
"""


def q_x_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery: orders priced above their own
    customer's average — Catalyst decorrelates the per-row subquery
    into one aggregate + join (no nested-loop re-execution), which is
    the only plan that survives at 100 TB. Expressed in SQL on temp
    views; the DataFrame spelling of the same plan is the groupBy+join
    the optimizer produces."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_v")
    return spark.sql("""
        select o_orderkey, o_custkey, round(o_totalprice, 2) as price
        from orders_v o
        where o_totalprice > 1.5 * (
          select avg(o2.o_totalprice) from orders_v o2
          where o2.o_custkey = o.o_custkey
        )
    """)


SQL_CORRELATED = """
select o_orderkey, o_custkey, round(o_totalprice, 2) as price
from orders o
where o_totalprice > 1.5 * (
  select avg(o2.o_totalprice) from orders o2
  where o2.o_custkey = o.o_custkey
)
"""


def q_x_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the non-hierarchical subset cube and
    rollup can't express: per-returnflag totals and per-linestatus
    totals in one pass (Expand operator), without the all-pairs level."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


SQL_GROUPING_SETS = """
select l_returnflag, l_linestatus, count(*) as n,
       round(sum(l_quantity), 2) as sum_qty,
       cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint)
         as gid
from lineitem
group by grouping sets ((l_returnflag), (l_linestatus))
"""


def q_x_quantile_stats(spark, sf_dir):
    """Per-group exact quantiles (p50/p95/p99 of extended price by
    return flag) — the oracle-parity path of
    functions/sketches.py:quantile_stats; ``exact=False`` switches to
    the Greenwald-Khanna approx_percentile sketch (map-side
    combinable, bounded memory) for groups too big to sort
    (error-bound-tested in tests/test_sketches.py)."""
    from sslr_spark.functions.sketches import quantile_stats

    out = quantile_stats(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag"], "l_extendedprice"
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        *[F.round(F.col(c), 4).alias(c) for c in ("q_500", "q_950", "q_990")],
    )


SQL_QUANTILE_STATS = """
select l_returnflag,
       cast(count(*) as bigint) as n_rows,
       round(quantile_cont(l_extendedprice, 0.5), 4) as q_500,
       round(quantile_cont(l_extendedprice, 0.95), 4) as q_950,
       round(quantile_cont(l_extendedprice, 0.99), 4) as q_990
from lineitem group by l_returnflag
"""


def q_x_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen week,
    distinct active users per (cohort week, weeks-since-cohort) — the
    standard product-analytics shape (two map-side-combined aggregates
    + one join on user_id; the cohort side is per-user and tiny).
    Integer day/week arithmetic on epoch-microsecond longs so both
    engines bucket identically regardless of session timezone."""
    ev = read_events(spark, sf_dir)
    ue = ev.select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    )
    first = ue.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        ue.join(first, "user_id")
        .groupBy(
            F.expr("cohort div 7").alias("cohort_week"),
            F.expr("(day - cohort) div 7").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_RETENTION = """
with ue as (
  select user_id,
         epoch_us(cast(ts as timestamp)) // 86400000000 as day
  from events
),
f as (select user_id, min(day) as cohort from ue group by 1)
select cohort // 7 as cohort_week,
       (day - cohort) // 7 as week_offset,
       count(distinct ue.user_id) as n_users
from ue join f using (user_id)
group by 1, 2
"""


def q_x_anomaly_zscore(spark, sf_dir):
    """Hourly-count anomaly scan: per event_type, z-score of each
    hour's event count against that type's hourly distribution.
    Variance from exact integer sums (n*sum_x2, sum_x^2) with ONE
    explicitly-ordered double expression — both engines evaluate the
    identical IEEE op sequence, so no stddev-builtin summation-order
    divergence. Two map-side-combined aggregations + a broadcast of
    n_types stat rows; flags |z| >= 2."""
    ev = read_events(spark, sf_dir)
    hours = ev.groupBy(
        "event_type",
        F.expr("ts_us div 3600000000 * 3600").alias("hour_epoch_s"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hours.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sx2"),
    )
    mean = F.col("sx").cast("double") / F.col("n_h")
    var = (
        F.col("sx2").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n_h")
    ) / (F.col("n_h") - 1)
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        hours.join(F.broadcast(stats), "event_type")
        # var > 0 guard BEFORE the projection: a type whose hourly
        # counts are all equal has var = 0, and z would be 0/0 — a
        # DIVIDE_BY_ZERO crash under Spark's default ANSI mode and an
        # engine-divergent NaN in the oracle
        .filter((F.col("n_h") > 1) & (var > 0))
        .select(
            "event_type",
            "hour_epoch_s",
            "n",
            F.round(z, 6).alias("z"),
            (F.abs(F.round(z, 6)) >= 2.0).alias("anomaly"),
        )
    )


SQL_ANOMALY_ZSCORE = """
with hours as (
  select event_type,
         cast(epoch_us(cast(ts as timestamp)) // 3600000000 * 3600 as bigint)
           as hour_epoch_s,
         count(*) as n
  from events group by 1, 2
),
stats as (
  select event_type, count(*) as n_h, sum(n) as sx, sum(n * n) as sx2
  from hours group by 1
)
select h.event_type, h.hour_epoch_s, h.n,
       round((cast(h.n as double) - cast(s.sx as double) / s.n_h)
             / sqrt((cast(s.sx2 as double)
                     - cast(s.sx as double) * s.sx / s.n_h)
                    / (s.n_h - 1)), 6) as z,
       abs(round((cast(h.n as double) - cast(s.sx as double) / s.n_h)
             / sqrt((cast(s.sx2 as double)
                     - cast(s.sx as double) * s.sx / s.n_h)
                    / (s.n_h - 1)), 6)) >= 2.0 as anomaly
from hours h join stats s using (event_type)
where s.n_h > 1
  and (cast(s.sx2 as double)
       - cast(s.sx as double) * s.sx / s.n_h) / (s.n_h - 1) > 0
"""


def q_x_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority revenue): the classic
    3-table star join — selective dimension filters pushed to both
    scans, revenue aggregate per order, top-10 TakeOrdered. The
    generator's orders table has no o_shippriority; o_orderpriority
    stands in."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
select l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       strftime(o_orderdate, '%Y-%m-%d') as o_orderdate,
       o_orderpriority
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < timestamp '1995-03-15 00:00:00'
  and l_shipdate > timestamp '1995-03-15 00:00:00'
group by l_orderkey, o_orderdate, o_orderpriority
order by revenue desc, l_orderkey
limit 10
"""


def q_x_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-filter-aggregate — every predicate pushable to the parquet
    reader, one global 1-row aggregate, zero joins. The whole-stage-
    codegen showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_TPCH_Q6 = """
select round(sum(l_extendedprice * l_discount), 2) as revenue,
       count(*) as n_rows
from lineitem
where l_shipdate >= timestamp '1994-01-01 00:00:00'
  and l_shipdate < timestamp '1995-01-01 00:00:00'
  and l_discount >= 0.05 and l_discount <= 0.07
  and l_quantity < 24
"""


OLAP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "x_grouping_sets": q_x_grouping_sets,
    "x_quantile_stats": q_x_quantile_stats,
    "x_retention": q_x_retention,
    "x_window_suite": q_x_window_suite,
    "x_cube": q_x_cube,
    "x_distinct_stats": q_x_distinct_stats,
    "x_heavy_hitters": q_x_heavy_hitters,
    "x_correlated_subquery": q_x_correlated_subquery,
    "x_set_ops": q_x_set_ops,
    "x_date_rollup": q_x_date_rollup,
    "x_join_star": q_x_join_star,
    "x_scalar_functions": q_x_scalar_functions,
    "x_tpch_q1": q_x_tpch_q1,
    "x_tpch_q3": q_x_tpch_q3,
    "x_tpch_q6": q_x_tpch_q6,
    "x_topk_per_group": q_x_topk_per_group,
    "x_pivot": q_x_pivot,
    "x_rollup": q_x_rollup,
    "x_funnel": q_x_funnel,
    "x_anomaly_zscore": q_x_anomaly_zscore,
    "x_cumulative_window": q_x_cumulative_window,
}

OLAP_ORACLES: dict[str, str] = {
    "x_anomaly_zscore": SQL_ANOMALY_ZSCORE,
    "x_grouping_sets": SQL_GROUPING_SETS,
    "x_quantile_stats": SQL_QUANTILE_STATS,
    "x_retention": SQL_RETENTION,
    "x_window_suite": SQL_WINDOW_SUITE,
    "x_cube": SQL_CUBE,
    "x_distinct_stats": SQL_DISTINCT_STATS,
    "x_heavy_hitters": SQL_HEAVY_HITTERS,
    "x_correlated_subquery": SQL_CORRELATED,
    "x_set_ops": SQL_SET_OPS,
    "x_date_rollup": SQL_DATE_ROLLUP,
    "x_join_star": SQL_JOIN_STAR,
    "x_scalar_functions": SQL_SCALARS,
    "x_tpch_q1": SQL_TPCH_Q1,
    "x_tpch_q3": SQL_TPCH_Q3,
    "x_tpch_q6": SQL_TPCH_Q6,
    "x_topk_per_group": SQL_TOPK_GROUP,
    "x_pivot": SQL_PIVOT,
    "x_rollup": SQL_ROLLUP,
    "x_funnel": SQL_FUNNEL,
    "x_cumulative_window": SQL_CUMULATIVE,
}
