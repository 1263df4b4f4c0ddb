"""Delete-detection tests (FIXTURES.md: deletes-sparse, deletes-dense)
plus a hypothesis property test: random divergence => post-sync
equality (the invariant the reference's recursive D&C provides,
reference internal/deletes.go:13-89)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sslr_spark.operators.deletes import sync_deletes
from tests.conftest import assert_df_equal, make_timestamps


def test_sparse_deletes_detected_and_repaired(spark, source_db, target_db):
    full = make_timestamps(spark, 2000)
    # source lost 0.1%-ish rows scattered across the key space
    src = full.filter(F.col("id") % 397 != 0)
    source_db.overwrite("timestamps", src)
    target_db.overwrite("timestamps", full)

    stats = sync_deletes(
        source_db.read("timestamps"), target_db, "timestamps", ["id"],
        rows_per_bucket=100,
    )
    assert stats.mismatched_buckets > 0
    assert_df_equal(target_db.read("timestamps"), src, ["id"])


def test_dense_delete_range(spark, source_db, target_db):
    full = make_timestamps(spark, 2000)
    src = full.filter((F.col("id") < 500) | (F.col("id") >= 800))
    source_db.overwrite("timestamps", src)
    target_db.overwrite("timestamps", full)

    sync_deletes(
        source_db.read("timestamps"), target_db, "timestamps", ["id"],
        rows_per_bucket=250,
    )
    assert_df_equal(target_db.read("timestamps"), src, ["id"])


def test_no_divergence_rewrites_nothing(spark, source_db, target_db):
    full = make_timestamps(spark, 1000)
    source_db.overwrite("timestamps", full)
    target_db.overwrite("timestamps", full)
    stats = sync_deletes(
        source_db.read("timestamps"), target_db, "timestamps", ["id"]
    )
    assert stats.mismatched_buckets == 0


def test_composite_string_pk(spark, source_db, target_db):
    rows = [(f"t{i % 7}", i, f"p{i}", 1) for i in range(1500)]
    df = spark.createDataFrame(
        rows, schema="tenant string, seq long, payload string, xmin long"
    )
    src = df.filter(~((F.col("tenant") == "t3") & (F.col("seq") % 5 == 0)))
    source_db.overwrite("composite", src)
    target_db.overwrite("composite", df)

    sync_deletes(
        source_db.read("composite"), target_db, "composite",
        ["seq", "tenant"],  # sorted PK column order (reference job.go:219)
        rows_per_bucket=100,
    )
    assert_df_equal(target_db.read("composite"), src, ["tenant", "seq"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deleted=st.sets(st.integers(min_value=0, max_value=499), max_size=60),
    extra=st.sets(st.integers(min_value=500, max_value=599), max_size=30),
    bucket_rows=st.sampled_from([50, 100, 500]),
)
def test_property_random_divergence_repaired(
    spark, tmp_path_factory, deleted, extra, bucket_rows
):
    from sslr_spark.sources.parquet import ParquetDatabase

    tmp = tmp_path_factory.mktemp("prop")
    src_db = ParquetDatabase(spark, str(tmp / "s"))
    tgt_db = ParquetDatabase(spark, str(tmp / "t"))

    base = make_timestamps(spark, 600)
    # source: base minus `deleted`; target: base minus `extra`
    # => target has extra rows to delete AND missing rows to restore.
    src = base.filter(~F.col("id").isin(list(deleted)) if deleted else F.lit(True))
    tgt = base.filter(~F.col("id").isin(list(extra)) if extra else F.lit(True))
    src_db.overwrite("t", src)
    tgt_db.overwrite("t", tgt)

    sync_deletes(src_db.read("t"), tgt_db, "t", ["id"], rows_per_bucket=bucket_rows)
    assert_df_equal(tgt_db.read("t"), src, ["id"])
