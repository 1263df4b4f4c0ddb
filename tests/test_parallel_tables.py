"""Table-parallel job execution must produce identical results to the
serial pass, including state consistency under concurrent upserts."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from sslr_spark.config import Config
from sslr_spark.job import Job
from tests.conftest import assert_df_equal


def _tables(spark, n_tables=4, rows=300):
    out = {}
    for t in range(n_tables):
        out[f"t{t}"] = spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1), 1 + i // 10, f"tbl{t}")
                for i in range(rows)
            ],
            "id long, ts timestamp, xmin long, tag string",
        )
    return out


def _mk_job(spark, tmp, parallel):
    names = [f"t{t}" for t in range(4)]
    return Job(
        spark,
        Config(
            source=str(tmp / "s"),
            target=str(tmp / "t"),
            source_tables=names,
            primary_keys={n: ["id"] for n in names},
            parallel_tables=parallel,
            min_delete_chunk_size=100,
        ),
    )


@pytest.mark.slow
def test_parallel_equals_serial(spark, tmp_path):
    tables = _tables(spark)
    job = _mk_job(spark, tmp_path, parallel=4)
    for name, df in tables.items():
        job.source.overwrite(name, df)

    r = job.run()
    assert r.updated_rows == 4 * 300
    for name, df in tables.items():
        assert_df_equal(job.target.read(name), df, ["id"])
        assert job.state.get(name).last_seen_version == 30  # none lost

    # mutate two tables, delete from a third; parallel pass converges
    t0 = tables["t0"].filter(F.col("id") % 5 != 0)
    t1 = tables["t1"].withColumn(
        "xmin", F.when(F.col("id") < 10, 99).otherwise(F.col("xmin"))
    )
    job.source.overwrite("t0", t0)
    job.source.overwrite("t1", t1)

    job2 = _mk_job(spark, tmp_path, parallel=4)
    r2 = job2.run()
    assert r2.repaired_buckets > 0
    assert_df_equal(job2.target.read("t0"), t0, ["id"])
    assert_df_equal(job2.target.read("t1"), t1, ["id"])
    assert_df_equal(job2.target.read("t2"), tables["t2"], ["id"])
    # every table's watermark present and correct after concurrent sets
    for name in tables:
        assert job2.state.get(name).last_seen_version == (
            99 if name == "t1" else 30
        )
