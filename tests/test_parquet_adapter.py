"""ParquetDatabase adapter-level tests (catalog probes, append,
drop, observe-based copy progress — SURVEY S3/S4/S7)."""

from __future__ import annotations

from sslr_spark.operators.copy import copy_full_table
from tests.conftest import make_timestamps


def test_catalog_probes_and_drop(spark, source_db):
    assert source_db.list_tables() == []
    assert not source_db.table_exists("t")
    source_db.overwrite("t", make_timestamps(spark, 10))
    source_db.overwrite("u", make_timestamps(spark, 5))
    assert source_db.list_tables() == ["t", "u"]
    assert source_db.table_exists("t")
    source_db.drop("t")
    assert source_db.list_tables() == ["u"]
    assert not source_db.table_exists("t")


def test_append_accumulates(spark, source_db):
    df = make_timestamps(spark, 100)
    source_db.overwrite("t", df)
    source_db.append("t", df.filter("id < 20"))
    assert source_db.read("t").count() == 120


def test_copy_progress_counter_via_observe(spark, source_db, target_db):
    """S4: the copy reports rows through df.observe on the write job —
    no second scan; the count must equal exactly what was written."""
    source_db.overwrite("t", make_timestamps(spark, 777))
    rows = copy_full_table(source_db.read("t"), target_db, "t", where="id >= 77")
    assert rows == 700
    assert target_db.read("t").count() == 700


def test_schema_probe(spark, source_db):
    source_db.overwrite("t", make_timestamps(spark, 3))
    names = [f.name for f in source_db.schema("t").fields]
    assert names == ["id", "ts", "xmin"]
