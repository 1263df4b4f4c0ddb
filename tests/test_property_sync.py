"""End-to-end property test: ANY random insert/update/delete workload
against the source must leave target == source after one Job pass —
the invariant the whole reference exists to provide (README.md:161-196
algorithm description), across int/string/composite PKs."""

from __future__ import annotations

import pytest

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sslr_spark.config import Config
from sslr_spark.job import Job
from tests.conftest import assert_df_equal


def _mk_job(spark, tmp, pks, bucket_hash="portable"):
    return Job(
        spark,
        Config(
            source=str(tmp / "s"),
            target=str(tmp / "t"),
            source_tables=["t1"],
            primary_keys={"t1": pks},
            min_delete_chunk_size=50,
            bucket_hash=bucket_hash,
        ),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deletes=st.sets(st.integers(0, 299), max_size=40),
    updates=st.sets(st.integers(0, 299), max_size=40),
    inserts=st.integers(min_value=0, max_value=30),
)
@pytest.mark.slow
def test_random_workload_int_pk(spark, tmp_path_factory, deletes, updates, inserts):
    tmp = tmp_path_factory.mktemp("wl")
    job = _mk_job(spark, tmp, ["id"])
    base_rows = [
        (i, datetime.datetime(2024, 1, 1), 10 + i // 20) for i in range(300)
    ]
    base = spark.createDataFrame(base_rows, "id long, ts timestamp, xmin long")
    job.source.overwrite("t1", base)
    job.run()

    # apply the random workload with a new version
    v = 1000
    mutated = [
        (i, datetime.datetime(2025, 6, 1), v) if i in updates else r
        for i, r in enumerate(base_rows)
        if i not in deletes
    ] + [(1000 + j, datetime.datetime(2025, 6, 1), v + 1) for j in range(inserts)]
    src2 = spark.createDataFrame(mutated, "id long, ts timestamp, xmin long")
    job.source.overwrite("t1", src2)

    job2 = _mk_job(spark, tmp, ["id"])
    job2.run()
    assert_df_equal(job2.target.read("t1"), src2, ["id"])


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deletes=st.sets(st.tuples(st.integers(0, 4), st.integers(0, 59)), max_size=30),
)
@pytest.mark.slow
def test_random_workload_composite_string_pk(spark, tmp_path_factory, deletes):
    tmp = tmp_path_factory.mktemp("wl2")
    job = _mk_job(spark, tmp, ["seq", "tenant"])  # name-sorted PK order
    rows = [
        (f"t{a}", b, f"p{a}-{b}", 5) for a in range(5) for b in range(60)
    ]
    base = spark.createDataFrame(
        rows, "tenant string, seq long, payload string, xmin long"
    )
    job.source.overwrite("t1", base)
    job.run()

    kept = [r for r in rows if (int(r[0][1:]), r[1]) not in deletes]
    src2 = spark.createDataFrame(
        kept, "tenant string, seq long, payload string, xmin long"
    )
    job.source.overwrite("t1", src2)
    job2 = _mk_job(spark, tmp, ["seq", "tenant"])
    job2.run()
    assert_df_equal(job2.target.read("t1"), src2, ["tenant", "seq"])


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deletes=st.sets(st.integers(0, 299), max_size=40),
    updates=st.sets(st.integers(0, 299), max_size=40),
)
@pytest.mark.slow
def test_random_workload_fast_bucket_hash(
    spark, tmp_path_factory, deletes, updates
):
    """Same target==source invariant with the production fast bucket
    hash end-to-end: full copy writes a fast layout, merges and delete
    repairs follow the stored mode."""
    tmp = tmp_path_factory.mktemp("wlf")
    job = _mk_job(spark, tmp, ["id"], bucket_hash="fast")
    base_rows = [
        (i, datetime.datetime(2024, 1, 1), 10 + i // 20) for i in range(300)
    ]
    base = spark.createDataFrame(base_rows, "id long, ts timestamp, xmin long")
    job.source.overwrite("t1", base)
    job.run()
    assert (job.target.layout_meta("t1") or {}).get("bucket_hash") == "fast"

    v = 1000
    mutated = [
        (i, datetime.datetime(2025, 6, 1), v) if i in updates else r
        for i, r in enumerate(base_rows)
        if i not in deletes
    ]
    src2 = spark.createDataFrame(mutated, "id long, ts timestamp, xmin long")
    job.source.overwrite("t1", src2)
    job2 = _mk_job(spark, tmp, ["id"], bucket_hash="fast")
    job2.run()
    assert_df_equal(job2.target.read("t1"), src2, ["id"])
