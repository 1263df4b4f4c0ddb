"""Operator query catalog: one (PySpark, DuckDB-oracle-SQL) pair per
implemented operator family from SURVEY.md §2, runnable on the driver's
TPC-H-ish parquet tables.

The reference's operators act on replicated Postgres tables with an
xmin version column; here each operator is demonstrated on the test
tables using a key column as the version proxy (TESTDATA tables carry
no xmin — FIXTURES-style versioned tables are exercised in tests/).

Conventions (driver compare, see __spark_entry__.py):
- every computed column aliased identically in Spark and SQL;
- timestamps formatted to strings (driver session TZ is unknown);
- row_number outputs cast to bigint for type parity.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sslr_spark.functions.hashing import bucket_sql, h60_sql
from sslr_spark.operators.keyrange import range_predicate
from sslr_spark.operators.updates import merge_upsert
from sslr_spark.operators.deletes import mismatched_buckets

LINEITEM_PK = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its timestamp column across
    the physical types the generator has used: TIMESTAMP(NANOS) (read
    as long via the legacy conf, downcast to micros — matching DuckDB's
    ns->us truncation), TIMESTAMP_NTZ (micros, tz-free), or TIMESTAMP.

    ts_us: epoch microseconds — used instead of rendered timestamps in
    query outputs so results are independent of the (driver-controlled,
    unknown) session timezone. For NTZ the wall-clock value is
    interpreted as UTC, the same convention DuckDB's
    ``epoch_us(cast(ts as timestamp))`` applies."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read as raw long
        ev = ev.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    elif ts_type == "timestamp_ntz":
        # unix_micros() rejects NTZ; diff against the NTZ epoch is
        # timezone-free and exact
        ev = ev.withColumn(
            "ts_us",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " timestamp_ntz '1970-01-01 00:00:00', ts)"
            ),
        )
    else:
        ev = ev.withColumn("ts_us", F.unix_micros("ts"))
    return ev


# --------------------------------------------------------------------
# S: scans / sources
# --------------------------------------------------------------------

def q_s1_full_filtered_scan(spark, sf_dir):
    """S1: full filtered table scan (reference internal/copy.go:11-27).
    Filter + projection pushed to the parquet scan by Catalyst."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") <= F.lit("1995-09-02"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round("l_extendedprice", 2).alias("price"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


SQL_S1 = """
select l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice, 2) as price,
       strftime(l_shipdate, '%Y-%m-%d') as ship_date
from lineitem
where l_shipdate <= timestamp '1995-09-02 00:00:00'
  and l_discount >= 0.05 and l_discount <= 0.07
"""


def q_s2_incremental_scan(spark, sf_dir):
    """S2: versioned incremental scan ``version >= watermark``
    (reference internal/updates.go:86-115), o_orderkey as the version
    proxy. No OFFSET/LIMIT: the slice is one partitioned read."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") >= 1200)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                F.round("o_totalprice", 2).alias("total"))
    )


SQL_S2 = """
select o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) as total
from orders where o_orderkey >= 1200
"""


def q_s9_state_upsert(spark, sf_dir):
    """S9/D4: checkpoint-state upsert (ON CONFLICT DO UPDATE,
    reference internal/state.go:64-70) as anti-join + union: per-status
    'state rows' overridden by a new snapshot for status 'O'."""
    orders = _t(spark, sf_dir, "orders")
    old = orders.groupBy(F.col("o_orderstatus").alias("table_name")).agg(
        F.max("o_orderkey").alias("last_seen_version")
    )
    new = spark.createDataFrame([("O", 99_999_999)], "table_name string, last_seen_version long")
    return merge_upsert(old, new, ["table_name"])


SQL_S9 = """
with old as (
  select o_orderstatus as table_name, max(o_orderkey) as last_seen_version
  from orders group by 1
), new as (select 'O' as table_name, 99999999 as last_seen_version)
select * from old where table_name not in (select table_name from new)
union all select * from new
"""


_S5_TABLES = ["lineitem", "orders", "documents", "embeddings"]


def q_s5_catalog_schema(spark, sf_dir):
    """S5: catalog schema scan (reference extractTableSchema,
    internal/schemas.go:91-139) as HASH-VERIFIED rows: the adapter's
    schema projected to engine-agnostic (table, ordinal, column,
    type_class, nullable) — coarse type classes are the granularity
    at which a Spark StructType and DuckDB's information_schema agree
    (the engine-spelled pg_catalog form stays live-PG-tested in
    sources/ddl.py). Four tables covering int64/int32/float64/string/
    timestamp/array classes."""
    from functools import reduce

    from sslr_spark.sources.ddl import schema_projection
    from sslr_spark.sources.parquet import ParquetDatabase

    db = ParquetDatabase(spark, sf_dir)
    parts = [
        schema_projection(spark, db.schema(t), t) for t in _S5_TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


# DuckDB replays the projection from ITS OWN catalog over the same
# parquet views — a genuinely independent second catalog
# implementation agreeing on the classes, not a re-serialization
SQL_S5 = f"""
select table_name, cast(ordinal_position as int) as ordinal,
       column_name,
       case when data_type like 'DECIMAL%' then 'decimal'
            when data_type like '%[]' then 'array'
            when data_type in ('STRUCT', 'MAP') then 'nested'
            when data_type = 'BIGINT' then 'int64'
            when data_type = 'INTEGER' then 'int32'
            when data_type = 'SMALLINT' then 'int16'
            when data_type = 'TINYINT' then 'int8'
            when data_type = 'DOUBLE' then 'float64'
            when data_type in ('FLOAT', 'REAL') then 'float32'
            when data_type = 'VARCHAR' then 'string'
            when data_type = 'BOOLEAN' then 'bool'
            when data_type = 'DATE' then 'date'
            when data_type like 'TIMESTAMP%' then 'timestamp'
            when data_type = 'BLOB' then 'binary'
            else 'other' end as type_class,
       (is_nullable = 'YES') as nullable
from information_schema.columns
where table_name in ({", ".join(f"'{t}'" for t in _S5_TABLES)})
"""


_S7_PROBES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
    "no_such_table", "lineitem_archive",
]


def q_s7_object_exists(spark, sf_dir):
    """S7: object-existence probes (reference objectExists,
    internal/schemas.go:195-200) as HASH-VERIFIED rows: the adapter's
    catalog check over all ten real tables plus two absent names;
    DuckDB answers the same probes from its information_schema."""
    from sslr_spark.sources.ddl import existence_probe
    from sslr_spark.sources.parquet import ParquetDatabase

    return existence_probe(
        spark, ParquetDatabase(spark, sf_dir), _S7_PROBES
    )


SQL_S7 = f"""
with probes(table_name) as (
  values {", ".join(f"('{n}')" for n in _S7_PROBES)}
)
select p.table_name,
       exists(select 1 from information_schema.tables t
              where t.table_name = p.table_name) as table_exists
from probes p
"""


# --------------------------------------------------------------------
# A: aggregates
# --------------------------------------------------------------------

def q_a1_watermark_probe(spark, sf_dir):
    """A1: one-row count + max-version probe over the filtered source
    (reference internal/updates.go:44-51)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("o_orderkey").alias("hi_version"),
        )
    )


SQL_A1 = """
select count(*) as n_rows, max(o_orderkey) as hi_version
from orders where o_orderstatus = 'O'
"""


def q_a2_table_length(spark, sf_dir):
    """A2: table length for the staleness decision
    (reference internal/updates.go:256-277)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


SQL_A2 = "select count(*) as n_rows from lineitem"


def q_a3_min_key_probe(spark, sf_dir):
    """A3/O4: min composite key + scalar-subquery table count in one row
    (reference internal/deletes.go:271-323)."""
    li = _t(spark, sf_dir, "lineitem")
    mk = (
        li.select(*LINEITEM_PK)
        .agg(F.min(F.struct(*LINEITEM_PK)).alias("k"))
        .select(
            F.col("k.l_orderkey").alias("l_orderkey"),
            F.col("k.l_linenumber").alias("l_linenumber"),
            F.col("k.l_partkey").alias("l_partkey"),
            F.col("k.l_suppkey").alias("l_suppkey"),
        )
    )
    return mk.crossJoin(li.agg(F.count(F.lit(1)).alias("n_rows")))


SQL_A3 = """
select l_orderkey, l_linenumber, l_partkey, l_suppkey,
       (select count(*) from lineitem) as n_rows
from lineitem
order by l_orderkey, l_linenumber, l_partkey, l_suppkey
limit 1
"""


def q_a4_bucket_fingerprint(spark, sf_dir):
    """A4: per-bucket commutative key fingerprint (count + bit_xor of a
    60-bit key hash) — the scale-correct replacement for the
    reference's ordered md5-of-array_agg (internal/deletes.go:237-269).
    Map-side combinable; shuffles at most n_buckets rows."""
    from sslr_spark.operators.deletes import bucket_fingerprints

    li = _t(spark, sf_dir, "lineitem")
    return bucket_fingerprints(li, LINEITEM_PK, 64)


def _key_sql(cols: list[str]) -> str:
    parts = ", ".join(f"coalesce(cast({c} as varchar), chr(0))" for c in cols)
    return f"concat_ws(chr(31), {parts})"


SQL_A4 = f"""
select {bucket_sql(_key_sql(LINEITEM_PK), 64)} as bucket,
       count(*) as cnt,
       bit_xor({h60_sql(_key_sql(LINEITEM_PK))}) as fp
from lineitem
group by 1
"""


# --------------------------------------------------------------------
# O: sort / pagination / key probes
# --------------------------------------------------------------------

def q_o2_pagination_window(spark, sf_dir):
    """O2: the reference's OFFSET/LIMIT chunk pagination
    (internal/updates.go:99-103) re-expressed as a row_number window —
    rows 501..600 of the (event_id)-ordered stream.

    PARITY-ONLY: the global (unpartitioned) window is a single-reducer
    sort, fine at oracle scale, a straggler at 100 TB. The engine never
    paginates — it reads the whole watermark slice as one partitioned
    job (SURVEY §2.5 O2); the scale analog of this probe is
    ``operators.keyrange.key_at_offset_scalable``."""
    ev = read_events(spark, sf_dir)
    w = Window.orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") > 500) & (F.col("rn") <= 600))
        .select("rn", "event_id", "event_type", "user_id")
    )


SQL_O2 = """
select rn, event_id, event_type, user_id from (
  select cast(row_number() over (order by event_id) as bigint) as rn,
         event_id, event_type, user_id
  from events
) where rn > 500 and rn <= 600
"""


def q_o3_key_at_offset(spark, sf_dir):
    """O3: key-at-offset probe — the k-th key in PK order
    (reference getKeyAtOffset, internal/deletes.go:91-164).

    PARITY-ONLY window form (exact oracle comparison). The production
    probe is ``operators.keyrange.key_at_offset_scalable``:
    approxQuantile pivot + distributed top-k residual, no
    Exchange SinglePartition — equality-tested against this form in
    tests/test_keyrange.py."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy(*LINEITEM_PK)
    return (
        li.select(*LINEITEM_PK)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 3000)
        .drop("rn")
    )


SQL_O3 = """
select l_orderkey, l_linenumber, l_partkey, l_suppkey from (
  select l_orderkey, l_linenumber, l_partkey, l_suppkey,
         row_number() over (order by l_orderkey, l_linenumber, l_partkey, l_suppkey) as rn
  from lineitem
) where rn = 3000
"""


def q_o1_event_sessionize(spark, sf_dir):
    """O1-adjacent showcase: multi-key window ordering — sessionize the
    events stream (30-min gap) and count sessions per user. The
    reference's only ranking-shaped logic is O3; sessionization is the
    streaming-analytics generalization the rebuild adds."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = (F.col("ts_us") - F.lag("ts_us").over(w)) > 1800 * 1_000_000
    newsess = F.when(gap | F.lag("ts_us").over(w).isNull(), 1).otherwise(0)
    return (
        ev.withColumn("new_session", newsess)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


SQL_O1 = """
with marked as (
  select user_id,
         case when lag(ts) over w is null
                   or epoch_us(cast(ts as timestamp)) - epoch_us(cast(lag(ts) over w as timestamp)) > 1800 * 1000000
              then 1 else 0 end as new_session
  from events
  window w as (partition by user_id order by ts, event_id)
)
select user_id, cast(sum(new_session) as bigint) as n_sessions,
       count(*) as n_events
from marked group by user_id
"""


# --------------------------------------------------------------------
# P: predicates
# --------------------------------------------------------------------

def q_p6_key_range_scan(spark, sf_dir):
    """P6: composite-key closed-interval scan with the reference's
    per-column-conjunction semantics (internal/deletes.go:331-357) —
    deliberately NOT lexicographic tuple comparison."""
    li = _t(spark, sf_dir, "lineitem")
    pred = range_predicate(
        ["l_orderkey", "l_linenumber"], start_key=(400, 2), end_key=(800, 5)
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )


SQL_P6 = """
select l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
from lineitem
where l_orderkey >= 400 and l_linenumber >= 2
  and l_orderkey <= 800 and l_linenumber <= 5
"""


# --------------------------------------------------------------------
# J: join-shaped sync logic
# --------------------------------------------------------------------

def q_j1_semi_join_keyset(spark, sf_dir):
    """J1/P8: semi-join against a key set (the reference's
    delete-by-key-tuple IN-unnest predicate, internal/updates.go:224-254).
    Key side is small => Catalyst broadcasts it."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return orders.join(F.broadcast(keys), on="o_custkey", how="left_semi").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


SQL_J1 = """
select o_orderkey, o_custkey, o_orderstatus
from orders
where o_custkey in (select c_custkey from customer where c_acctbal < 0)
"""


def q_d1_delete_by_keyset(spark, sf_dir):
    """D1: the delete applied — rows whose key is NOT in the delete set
    (anti-join; reference internal/updates.go:241-253)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return orders.join(F.broadcast(keys), on="o_custkey", how="left_anti").select(
        "o_orderkey", "o_custkey"
    )


SQL_D1 = """
select o_orderkey, o_custkey from orders
where o_custkey not in (select c_custkey from customer where c_acctbal < 0)
"""


def q_j2_upsert_merge(spark, sf_dir):
    """J2: the upsert merge (delete-then-insert transaction,
    reference internal/updates.go:171-222) as anti-join + union.
    Updates slice: orders 8000..9000 with doubled price, status 'U'."""
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("total"), "o_orderstatus",
    )
    updates = (
        orders.filter((F.col("o_orderkey") >= 800) & (F.col("o_orderkey") <= 900))
        .select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 2, 2).alias("total"),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    return merge_upsert(target, updates, ["o_orderkey"])


SQL_J2 = """
with target as (
  select o_orderkey, o_custkey, round(o_totalprice, 2) as total, o_orderstatus
  from orders where o_orderkey <= 1000
), updates as (
  select o_orderkey, o_custkey, round(o_totalprice * 2, 2) as total,
         'U' as o_orderstatus
  from orders where o_orderkey >= 800 and o_orderkey <= 900
)
select * from target where o_orderkey not in (select o_orderkey from updates)
union all select * from updates
"""


def q_j3_range_repair(spark, sf_dir):
    """J3: range repair — replace the target's [start,end] key slice
    with the source's slice (reference updateChangedRange,
    internal/deletes.go:166-235). Target simulated with a corrupted
    range (every 10th order missing)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    pred = (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") <= 600)
    target = orders.filter(~pred | (F.col("o_orderkey") % 10 != 3))
    repaired = target.filter(~pred).unionByName(orders.filter(pred))
    return repaired


SQL_J3 = """
with source as (select o_orderkey, o_custkey, o_orderstatus from orders),
target as (
  select * from source
  where not (o_orderkey >= 500 and o_orderkey <= 600) or o_orderkey % 10 != 3
)
select * from target where not (o_orderkey >= 500 and o_orderkey <= 600)
union all
select * from source where o_orderkey >= 500 and o_orderkey <= 600
"""


def q_j4_hash_diff(spark, sf_dir):
    """J4/T4: source/target fingerprint comparison as a bucket
    equi-join; returns mismatched buckets (simulated target missing
    every 1000th-ish order). One parallel pass per side instead of the
    reference's O(log n) probe round trips."""
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 1000 != 7)
    return mismatched_buckets(orders, target, ["o_orderkey"], 128).orderBy("bucket")


SQL_J4 = f"""
with s as (
  select {bucket_sql('coalesce(cast(o_orderkey as varchar), chr(0))', 128)} as bucket,
         count(*) as cnt,
         bit_xor({h60_sql('coalesce(cast(o_orderkey as varchar), chr(0))')}) as fp
  from orders group by 1
), t as (
  select {bucket_sql('coalesce(cast(o_orderkey as varchar), chr(0))', 128)} as bucket,
         count(*) as cnt,
         bit_xor({h60_sql('coalesce(cast(o_orderkey as varchar), chr(0))')}) as fp
  from orders where o_orderkey % 1000 != 7 group by 1
)
select coalesce(s.bucket, t.bucket) as bucket
from s full outer join t on s.bucket = t.bucket
where not (s.cnt is not distinct from t.cnt and s.fp is not distinct from t.fp)
"""


# --------------------------------------------------------------------
# D: set ops / DML shapes
# --------------------------------------------------------------------

def q_d2_range_delete(spark, sf_dir):
    """D2: range delete — the complement of a key-range predicate
    (reference internal/deletes.go:215-218)."""
    li = _t(spark, sf_dir, "lineitem")
    pred = range_predicate(["l_orderkey"], start_key=(300,), end_key=(700,))
    return li.filter(~pred).select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")


SQL_D2 = """
select l_orderkey, l_linenumber, l_partkey, l_suppkey
from lineitem where not (l_orderkey >= 300 and l_orderkey <= 700)
"""


# --------------------------------------------------------------------
# T: orchestration decisions
# --------------------------------------------------------------------

def q_t3_staleness_check(spark, sf_dir):
    """T3: full-copy-vs-incremental decision — compare source/target
    counts against the threshold (reference internal/updates.go:53-62)."""
    orders = _t(spark, sf_dir, "orders")
    src = orders.agg(F.count(F.lit(1)).alias("source_rows"))
    tgt = orders.filter(F.col("o_orderkey") < 300).agg(
        F.count(F.lit(1)).alias("target_rows")
    )
    return src.crossJoin(tgt).select(
        "source_rows",
        "target_rows",
        (F.col("target_rows") < F.col("source_rows") * 0.5).alias("need_full_copy"),
    )


SQL_T3 = """
select source_rows, target_rows,
       target_rows < source_rows * 0.5 as need_full_copy
from (select count(*) as source_rows from orders),
     (select count(*) as target_rows from orders where o_orderkey < 300)
"""


def q_t6_event_window_agg(spark, sf_dir):
    """T6-adjacent: tumbling-window aggregation over the event stream —
    the batch-equivalent of the Structured Streaming windowed agg the
    continuous mode runs (hour buckets x event_type)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.expr("ts_us div 3600000000 * 3600").alias("hour_epoch_s"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


SQL_T6 = """
select cast(epoch_us(cast(ts as timestamp)) // 3600000000 * 3600 as bigint) as hour_epoch_s,
       event_type, count(*) as n, round(sum(value), 4) as total_value
from events group by 1, 2
"""


def q_x_asof_join(spark, sf_dir):
    """As-of join (operator Spark lacks; union+window form): each event
    annotated with the value of the user's latest purchase at-or-before
    it. Oracle: DuckDB's native ASOF JOIN — semantic equality across
    two very different physical strategies."""
    from sslr_spark.operators.asof import asof_join

    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round("value", 4).alias("purchase_value")
    )
    joined = asof_join(
        ev, purchases, by_cols=["user_id"], ts_col="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("ev_ts_us"),
        F.col("purchase_value_asof").alias("last_purchase_value"),
    )


SQL_X_ASOF = """
select a.event_id, a.user_id,
       epoch_us(cast(a.ts as timestamp)) as ev_ts_us,
       b.purchase_value as last_purchase_value
from events a
asof left join (
  select user_id, ts, round(value, 4) as purchase_value
  from events where event_type = 'purchase'
) b on a.user_id = b.user_id and a.ts >= b.ts
"""


def q_x_range_join(spark, sf_dir):
    """Tolerance range join (error events paired with click events
    within ±2 minutes, any user) — the join shape Spark compiles to a
    nested-loop/cartesian plan when written naively; the bucketized
    form (operators/rangejoin.py) makes it ONE equi-shuffle with a 3x
    probe-side amplification. Oracle: DuckDB's plain inequality join —
    semantic equality across two very different physical strategies."""
    from sslr_spark.operators.rangejoin import tolerance_join

    ev = read_events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts_us"
    )
    return tolerance_join(
        errors, clicks, "ts_us", "ts_us", tolerance=120_000_000
    ).select(
        F.col("event_id").alias("err_id"),
        F.col("r_event_id").alias("click_id"),
        (F.col("r_ts_us") - F.col("ts_us")).alias("dt_us"),
    )


SQL_X_RANGE_JOIN = """
with ev as (
  select event_id, epoch_us(cast(ts as timestamp)) as ts_us, event_type
  from events
)
select a.event_id as err_id, b.event_id as click_id,
       b.ts_us - a.ts_us as dt_us
from ev a join ev b
  on a.event_type = 'error' and b.event_type = 'click'
 and abs(b.ts_us - a.ts_us) <= 120000000
"""


def q_x_json_extract(spark, sf_dir):
    """JSON property extraction from the events props column (pipeline
    metadata columns are routinely JSON at ingest)."""
    ev = read_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


SQL_X_JSON = """
select event_id, cast(props->>'$.k' as bigint) as k from events
"""


# --------------------------------------------------------------------
# registry
# --------------------------------------------------------------------

CORE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "s1_full_filtered_scan": q_s1_full_filtered_scan,
    "s2_incremental_scan": q_s2_incremental_scan,
    "s5_catalog_schema": q_s5_catalog_schema,
    "s7_object_exists": q_s7_object_exists,
    "s9_state_upsert": q_s9_state_upsert,
    "a1_watermark_probe": q_a1_watermark_probe,
    "a2_table_length": q_a2_table_length,
    "a3_min_key_probe": q_a3_min_key_probe,
    "a4_bucket_fingerprint": q_a4_bucket_fingerprint,
    "o1_event_sessionize": q_o1_event_sessionize,
    "o2_pagination_window": q_o2_pagination_window,
    "o3_key_at_offset": q_o3_key_at_offset,
    "p6_key_range_scan": q_p6_key_range_scan,
    "j1_semi_join_keyset": q_j1_semi_join_keyset,
    "j2_upsert_merge": q_j2_upsert_merge,
    "j3_range_repair": q_j3_range_repair,
    "j4_hash_diff": q_j4_hash_diff,
    "d1_delete_by_keyset": q_d1_delete_by_keyset,
    "d2_range_delete": q_d2_range_delete,
    "t3_staleness_check": q_t3_staleness_check,
    "t6_event_window_agg": q_t6_event_window_agg,
    "x_asof_join": q_x_asof_join,
    "x_range_join": q_x_range_join,
    "x_json_extract": q_x_json_extract,
}

CORE_ORACLES: dict[str, str] = {
    "s1_full_filtered_scan": SQL_S1,
    "s2_incremental_scan": SQL_S2,
    "s5_catalog_schema": SQL_S5,
    "s7_object_exists": SQL_S7,
    "s9_state_upsert": SQL_S9,
    "a1_watermark_probe": SQL_A1,
    "a2_table_length": SQL_A2,
    "a3_min_key_probe": SQL_A3,
    "a4_bucket_fingerprint": SQL_A4,
    "o1_event_sessionize": SQL_O1,
    "o2_pagination_window": SQL_O2,
    "o3_key_at_offset": SQL_O3,
    "p6_key_range_scan": SQL_P6,
    "j1_semi_join_keyset": SQL_J1,
    "j2_upsert_merge": SQL_J2,
    "j3_range_repair": SQL_J3,
    "j4_hash_diff": SQL_J4,
    "d1_delete_by_keyset": SQL_D1,
    "d2_range_delete": SQL_D2,
    "t3_staleness_check": SQL_T3,
    "t6_event_window_agg": SQL_T6,
    "x_asof_join": SQL_X_ASOF,
    "x_range_join": SQL_X_RANGE_JOIN,
    "x_json_extract": SQL_X_JSON,
}
