"""Delta Lake target adapter (VERDICT r2 task #7).

Two tiers, mirroring the JDBC adapter's test strategy:

- plan construction (merge conditions, replaceWhere predicates,
  factory selection, layout bookkeeping) runs everywhere — these are
  pure functions / filesystem-only paths with no Delta dependency;
- live round trips (MERGE upsert, keyed delete, replaceWhere) run
  under ``pytest.importorskip('delta')`` — the sandbox has no
  delta-spark jars, a real deployment does.
"""

from __future__ import annotations

import pytest

from sslr_spark.sources.delta import (
    DeltaDatabase,
    merge_condition,
    replace_where_predicate,
)
from sslr_spark.sources.factory import open_database


def test_merge_condition_null_safe_composite():
    assert merge_condition(["id"]) == "t.`id` <=> s.`id`"
    assert (
        merge_condition(["id", "region"], "tgt", "upd")
        == "tgt.`id` <=> upd.`id` AND tgt.`region` <=> upd.`region`"
    )


def test_replace_where_predicate_literals():
    assert (
        replace_where_predicate("__sslr_bucket", [0, 3, 9])
        == "`__sslr_bucket` in (0, 3, 9)"
    )
    # SPARK-dialect escaping, not JDBC: backslash doubles, quote
    # escapes as \' (Spark's parser treats backslash as escape — the
    # Postgres '' doubling would mis-parse here)
    assert (
        replace_where_predicate("lang", ["en", "it's", "a\\b"])
        == "`lang` in ('en', 'it\\'s', 'a\\\\b')"
    )
    with pytest.raises(ValueError):
        replace_where_predicate("b", [b"\x01"])


def test_factory_selects_delta(spark, tmp_path):
    db = open_database(spark, f"delta:{tmp_path}/lake", role="target")
    assert isinstance(db, DeltaDatabase)
    assert db.root == f"{tmp_path}/lake"
    # in-place capable: Job strips the version column, applies MERGEs
    assert hasattr(db, "apply_upsert") and hasattr(db, "delete_keys")


def test_catalog_probes_without_delta(spark, tmp_path):
    """Existence/layout probes are filesystem-only — usable (and
    correct) before any Delta jar loads."""
    db = DeltaDatabase(spark, str(tmp_path / "lake"))
    assert not db.table_exists("t")
    assert db.list_tables() == []
    assert db.layout_meta("t") is None


# -- live tier (requires delta-spark) ----------------------------------

@pytest.fixture()
def delta_db(tmp_path):
    delta = pytest.importorskip("delta")
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("sslr_delta_tests")
        .config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = delta.configure_spark_with_delta_pip(builder).getOrCreate()
    yield DeltaDatabase(spark, str(tmp_path / "lake")), spark


def test_delta_merge_upsert_and_delete_live(delta_db):
    db, spark = delta_db
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"
    )
    db.overwrite("t", df)
    assert db.table_exists("t")

    upd = spark.createDataFrame(
        [(1, "new1"), (100, "new100")], "id long, v string"
    )
    db.apply_upsert("t", upd, ["id"])
    got = {r.id: r.v for r in db.read("t").collect()}
    assert got[1] == "new1" and got[100] == "new100" and len(got) == 101

    db.delete_keys(
        "t", spark.createDataFrame([(i,) for i in range(50)], "id long"),
        ["id"],
    )
    assert db.read("t").count() == 51


def test_delta_replace_partitions_live(delta_db):
    from pyspark.sql import functions as F

    db, spark = delta_db
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("b")
    )
    db.overwrite_partitioned("t", df, "b", n_buckets=4)
    assert db.layout_meta("t") == {"partition_col": "b", "n_buckets": 4}

    repl = spark.createDataFrame([(1000, 2)], "id long, b long")
    db.replace_partitions("t", repl, "b")
    got = db.read("t", with_meta=True)
    assert got.filter("b = 2").count() == 1  # partition replaced
    assert got.filter("b != 2").count() == 75  # others untouched
