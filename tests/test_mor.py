"""Merge-on-read upsert log (round 8): append-only CDC batches, a
latest-wins overlay read that never shuffles the base, and an
idempotent crash-safe compaction."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sslr_spark.operators.updates import (
    append_upsert_log,
    compact_upsert_log,
    read_merged,
    should_compact_upsert_log,
    upsert_log_table,
)
from sslr_spark.sources.parquet import ParquetDatabase


def _db(spark, tmp_path):
    return ParquetDatabase(spark, str(tmp_path / "mor"))


def _base(spark):
    return spark.createDataFrame(
        [(i, f"v{i}", 100) for i in range(50)],
        "id long, payload string, xmin long",
    )


def _rows(df):
    return {(r.id, r.payload, r.xmin) for r in df.collect()}


def test_mor_overlay_updates_inserts_and_latest_wins(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    # batch 1: update ids 0-4, insert 100
    b1 = spark.createDataFrame(
        [(i, f"u{i}", 200) for i in range(5)] + [(100, "new", 200)],
        "id long, payload string, xmin long",
    )
    append_upsert_log(db, "t", b1, ["id"])
    # batch 2: re-update id 0 (a newer version) and a stale dup of 1
    b2 = spark.createDataFrame(
        [(0, "uu0", 300), (1, "stale", 150)],
        "id long, payload string, xmin long",
    )
    append_upsert_log(db, "t", b2, ["id"])

    got = _rows(read_merged(db, "t", ["id"]))
    expect = {(i, f"v{i}", 100) for i in range(5, 50)}
    expect |= {(0, "uu0", 300)}           # newest across batches
    expect |= {(i, f"u{i}", 200) for i in range(1, 5)}  # 200 > 150
    expect |= {(100, "new", 200)}         # insert
    assert got == expect


def test_mor_no_log_is_passthrough_and_schema_checked(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    assert _rows(read_merged(db, "t", ["id"])) == _rows(db.read("t"))
    assert not should_compact_upsert_log(db, "t")
    bad = spark.createDataFrame([(1, 500)], "id long, xmin long")
    with pytest.raises(ValueError, match="lacks base columns"):
        append_upsert_log(db, "t", bad, ["id"])


def test_mor_compaction_folds_and_is_crash_idempotent(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    b1 = spark.createDataFrame(
        [(i, f"u{i}", 200) for i in range(10)] + [(100, "new", 200)],
        "id long, payload string, xmin long",
    )
    append_upsert_log(db, "t", b1, ["id"])
    assert should_compact_upsert_log(db, "t", max_log_fraction=0.1)
    before = _rows(read_merged(db, "t", ["id"]))

    out = compact_upsert_log(db, "t", ["id"])
    assert out["folded_rows"] == 11
    assert not db.table_exists(upsert_log_table("t"))
    assert _rows(db.read("t")) == before  # fold changed nothing

    # crash simulation: the swap committed but the log drop was lost —
    # re-appending the SAME batch must be a no-op through the overlay
    # (log supersedes base at equal versions with identical payload)
    append_upsert_log(db, "t", b1, ["id"])
    assert _rows(read_merged(db, "t", ["id"])) == before
    out2 = compact_upsert_log(db, "t", ["id"])
    assert out2["folded_rows"] == 11
    assert _rows(db.read("t")) == before
    # and compacting with no log is a recorded no-op
    assert compact_upsert_log(db, "t", ["id"]) == {"folded_rows": 0}


def test_mor_compaction_into_bucketed_layout(spark, tmp_path):
    from sslr_spark.operators.deletes import BUCKET_COL

    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(3, "u3", 200)], "id long, payload string, xmin long"
        ),
        ["id"],
    )
    compact_upsert_log(db, "t", ["id"], n_buckets=8, bucket_hash="fast")
    assert (db.layout_meta("t") or {}).get("n_buckets") == 8
    merged = db.read("t", with_meta=True)
    assert BUCKET_COL in merged.columns
    assert merged.filter("id = 3").first().payload == "u3"


def test_mor_read_broadcasts_log_and_never_shuffles_base(
    spark, tmp_path
):
    """The scale contract: the base side of the overlay is scan +
    broadcast anti-join — no Exchange, no Sort, no window on the
    base; only the (small) log side aggregates."""
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(1, "u1", 200)], "id long, payload string, xmin long"
        ),
        ["id"],
    )
    p = (
        read_merged(db, "t", ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p
    assert "Window" not in p