"""Bucketized tolerance/range join tests (operators/rangejoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sslr_spark.operators.rangejoin import tolerance_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_tolerance_join_matches_naive(spark):
    """Equality with the naive all-pairs predicate, boundary values
    included (|dt| exactly == tolerance must match)."""
    left = _df(spark, [(i, i * 7) for i in range(60)], "lid long, t long")
    right = _df(spark, [(i, i * 11 + 3) for i in range(60)], "rid long, u long")
    tol = 10
    got = {
        (r["lid"], r["r_rid"])
        for r in tolerance_join(left, right, "t", "u", tol).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter(F.abs(F.col("t") - F.col("u")) <= tol)
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_tolerance_join_equi_keys_partition_matches(spark):
    left = _df(
        spark, [(1, "a", 100), (2, "b", 100)], "lid long, k string, t long"
    )
    right = _df(
        spark, [(10, "a", 105), (11, "b", 300)], "rid long, k string, u long"
    )
    got = {
        (r["lid"], r["r_rid"])
        for r in tolerance_join(
            left, right, "t", "u", 10, equi_keys=["k"]
        ).collect()
    }
    # lid=2 has a time match (rid=10 at dt=5) but in the wrong group
    assert got == {(1, 10)}


def test_tolerance_join_left_outer_keeps_unmatched(spark):
    left = _df(spark, [(1, 0), (2, 1000)], "lid long, t long")
    right = _df(spark, [(10, 5)], "rid long, u long")
    out = tolerance_join(left, right, "t", "u", 10, how="left").collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r)
    assert by_lid[1][0]["r_rid"] == 10
    assert by_lid[2][0]["r_rid"] is None
    assert len(out) == 2


def test_tolerance_join_duplicate_left_rows_survive_left_outer(spark):
    left = _df(spark, [(1, 999), (1, 999)], "lid long, t long")
    right = _df(spark, [(10, 5)], "rid long, u long")
    out = tolerance_join(left, right, "t", "u", 10, how="left").collect()
    assert len(out) == 2  # the row-id keying keeps both duplicates


def test_tolerance_join_rejects_bad_args(spark):
    left = _df(spark, [(1, 0)], "lid long, t long")
    with pytest.raises(ValueError, match="positive"):
        tolerance_join(left, left, "t", "t", 0)
    with pytest.raises(ValueError, match="unsupported how"):
        tolerance_join(left, left, "t", "t", 5, how="full")


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point: the plan must be an equi-join on the bucket,
    never CartesianProduct / BroadcastNestedLoopJoin."""
    from sslr_spark.queries import q_x_range_join

    p = (
        q_x_range_join(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
