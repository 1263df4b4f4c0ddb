"""As-of join: union+window form vs grouped-pandas merge_asof form
must agree exactly; edge cases (no prior right row, equal timestamps)."""

from __future__ import annotations

import datetime

from sslr_spark.operators.asof import asof_join, asof_join_pandas


def _data(spark):
    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [
            (1, t(0), "e1"), (1, t(5), "e2"), (1, t(10), "e3"),
            (2, t(3), "e4"), (3, t(1), "e5"),
        ],
        "user_id long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, t(5), 100.0), (1, t(8), 200.0), (2, t(4), 300.0)],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _data(spark)
    got = {
        (r.user_id, r.name): r.price_asof
        for r in asof_join(left, right, ["user_id"], "ts", ["price"]).collect()
    }
    assert got == {
        (1, "e1"): None,       # no right row at-or-before t0
        (1, "e2"): 100.0,      # equal timestamp is inclusive
        (1, "e3"): 200.0,
        (2, "e4"): None,       # right row is after the left row
        (3, "e5"): None,       # user with no right rows at all
    }


def test_pandas_variant_agrees(spark):
    left, right = _data(spark)
    a = {
        (r.user_id, r.name): r.price_asof
        for r in asof_join(left, right, ["user_id"], "ts", ["price"]).collect()
    }
    b = {
        (r.user_id, r.name): r.price_asof
        for r in asof_join_pandas(left, right, ["user_id"], "ts", ["price"]).collect()
    }
    assert a == b


def test_pandas_variant_on_events(spark):
    from pyspark.sql import functions as F

    from sslr_spark.queries import read_events

    ev = read_events(spark, "/root/testdata/sf0.001/").drop("ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    a = asof_join(ev, purchases, ["user_id"], "ts", ["value"])
    b = asof_join_pandas(ev, purchases, ["user_id"], "ts", ["value"])
    ka = sorted((r.event_id, r.value_asof) for r in a.collect())
    kb = sorted((r.event_id, r.value_asof) for r in b.collect())
    assert ka == kb and len(ka) == 1000
