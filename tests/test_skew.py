"""Skew utilities: salted join and two-stage distinct must equal their
naive counterparts exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sslr_spark.functions.skew import salted_join, two_stage_distinct_count


def test_salted_join_equals_plain_join(spark):
    # skewed: 90% of rows share user_id 7
    rows = [(7 if i % 10 else i, f"p{i}") for i in range(2000)]
    skewed = spark.createDataFrame(rows, "user_id long, payload string")
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(200)], "user_id long, name string"
    )
    plain = {(r.user_id, r.payload, r.name) for r in skewed.join(dim, "user_id").collect()}
    salted = {
        (r.user_id, r.payload, r.name)
        for r in salted_join(skewed, dim, ["user_id"], n_salts=8).collect()
    }
    assert salted == plain and len(plain) > 0


def test_two_stage_distinct_count(spark):
    ev = spark.createDataFrame(
        [(i % 5, f"s{i % 37}") for i in range(5000)], "k long, v string"
    )
    naive = {
        (r.k, r.n) for r in ev.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    staged = {
        (r.k, r.n_distinct)
        for r in two_stage_distinct_count(ev, ["k"], "v").collect()
    }
    assert staged == naive
