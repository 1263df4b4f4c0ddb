"""Crash-safety tests for the data-then-state commit protocol
(state.py ordering rule; reference T2 commits state inside the target
transaction — our equivalent guarantee is at-least-once re-apply +
idempotent merge = exactly-once effect)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sslr_spark.operators.updates import sync_updates
from sslr_spark.state import StateStore
from tests.conftest import assert_df_equal, make_timestamps


@pytest.mark.slow
def test_replay_after_crash_between_data_and_state_commit(
    spark, source_db, target_db
):
    """Simulate: data batch applied, crash before the watermark
    advanced. The rerun re-processes the same slice; result must be
    identical (no duplicates, no loss)."""
    src = make_timestamps(spark, 600)
    source_db.overwrite("t", src)
    store = StateStore(target_db)
    sync_updates(source_db.read("t"), target_db, store, "t", ["id"])

    # mutate + sync
    import datetime

    upd = spark.createDataFrame(
        [(i, datetime.datetime(2030, 1, 1), 300) for i in range(20)],
        "id long, ts timestamp, xmin long",
    )
    src2 = src.filter(F.col("id") >= 20).unionByName(upd)
    source_db.overwrite("t", src2)
    sync_updates(source_db.read("t"), target_db, store, "t", ["id"])
    assert_df_equal(target_db.read("t"), src2, ["id"])

    # "crash": roll the watermark back as if state commit never landed
    store.set_version("t", 60)
    rows = sync_updates(source_db.read("t"), target_db, store, "t", ["id"])
    # the whole slice >= 61 was re-applied...
    assert rows == 20
    # ...but the merge is idempotent: state identical, no duplicates
    assert_df_equal(target_db.read("t"), src2, ["id"])
    assert target_db.read("t").count() == 600


def test_interrupted_overwrite_preserves_previous_table(spark, target_db):
    """The staged-rename overwrite must never leave a half-written
    published table: a failing write keeps the old data intact."""
    good = make_timestamps(spark, 100)
    target_db.overwrite("t", good)

    bad = spark.range(10).withColumn(
        "boom", F.udf(lambda x: 1 // 0)("id")  # fails at write time
    )
    try:
        target_db.overwrite("t", bad)
        raised = False
    except Exception:
        raised = True
    assert raised
    # previous committed table fully readable
    assert_df_equal(target_db.read("t"), good, ["id"])
