"""Delete-detection tests (FIXTURES.md: deletes-sparse, deletes-dense)
plus a hypothesis property test: random divergence => post-sync
equality (the invariant the reference's recursive D&C provides,
reference internal/deletes.go:13-89)."""

from __future__ import annotations

import pytest

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
@pytest.mark.slow
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


def test_fast_hash_mode_matches_portable(spark, source_db, target_db):
    """hash_mode='fast' (xxhash64) must find and repair exactly the
    same divergence as the portable md5 mode."""
    from pyspark.sql import functions as F

    from sslr_spark.operators.deletes import sync_deletes

    rows = [(i, i % 7, f"v{i}") for i in range(3000)]
    src_full = spark.createDataFrame(rows, "k long, g long, v string")
    # target has extra rows (deletes to detect) and is missing some
    src = src_full.filter((F.col("k") % 613 != 0) & (F.col("k") % 401 != 0))
    for mode, tname in (("portable", "t_port"), ("fast", "t_fast")):
        source_db.overwrite("s", src)
        target_db.overwrite(tname, src_full)
        stats = sync_deletes(
            source_db.read("s"), target_db, tname, ["k"],
            rows_per_bucket=100, version_col=None, hash_mode=mode,
        )
        assert stats.mismatched_buckets > 0
    port = {r.k for r in target_db.read("t_port").collect()}
    fast = {r.k for r in target_db.read("t_fast").collect()}
    expected = {r.k for r in src.collect()}
    assert port == expected
    assert fast == expected


def test_partitioned_fast_mode_matches_portable(spark, source_db, target_db):
    from pyspark.sql import functions as F

    from sslr_spark.operators.deletes import (
        BUCKET_COL,
        sync_deletes_partitioned,
        with_bucket,
    )

    rows = [(i, f"v{i}") for i in range(2000)]
    full = spark.createDataFrame(rows, "k long, v string")
    src = full.filter(F.col("k") % 251 != 0)
    for mode, tname in (("portable", "p_port"), ("fast", "p_fast")):
        source_db.overwrite("s2", src)
        target_db.overwrite_partitioned(
            tname, with_bucket(full, ["k"], 16), BUCKET_COL, n_buckets=16
        )
        stats = sync_deletes_partitioned(
            source_db.read("s2"), target_db, tname, ["k"], 16,
            hash_mode=mode,
        )
        assert stats.mismatched_buckets > 0
        got = {r.k for r in target_db.read(tname).collect()}
        assert got == {r.k for r in src.collect()}


def test_fast_hash_distinguishes_null_column_positions(spark):
    """xxhash64 skips nulls, so (NULL,'x') vs ('x',NULL) would collide
    without null tagging — the fast fingerprints must differ."""
    from sslr_spark.functions.hashing import bucket_id_fast, key_hash_fast

    df = spark.createDataFrame(
        [(None, "x"), ("x", None)], "a string, b string"
    )
    r = df.select(
        key_hash_fast(["a", "b"]).alias("kh"),
        bucket_id_fast(["a", "b"], 1 << 20).alias("bk"),
    ).collect()
    assert r[0].kh != r[1].kh
