"""Round-9 fixes, one test block per VERDICT/ADVICE item:

- read_merged byte-gates its forced broadcast (VERDICT r8 item 1 —
  the one scale-killer found: a compaction invariant bounds log ROWS,
  not bytes, so a wide-PK log at 100 TB would overwhelm the driver).
- should_compact_upsert_log gains an absolute bytes cap (item 5).
- MOR tombstone/upsert ties at EQUAL versions break for the upsert
  (ADVICE: watermark+1 tombstones collide with the next xmin).
- The full-copy drop-log window is crash-safe via the copy-pending
  marker (ADVICE: a crash between the log drop and the overwrite swap
  must force full copy on the next pass, not lose the log rows).
- The MOR delete phase repairs silent target loss with LOG APPENDS,
  never bucket rewrites (item 6).
- Job results surface MOR log health (item 7).
- weighted_sample rejects NULL keys loudly (ADVICE).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sslr_spark.operators.updates import (
    append_delete_log,
    append_upsert_log,
    compact_upsert_log,
    get_update_range,
    read_merged,
    should_compact_upsert_log,
    sync_updates,
    upsert_log_table,
)
from sslr_spark.sources.parquet import ParquetDatabase
from sslr_spark.state import StateStore, TableState


def _db(spark, tmp_path, name="mor9"):
    return ParquetDatabase(spark, str(tmp_path / name))


def _base(spark, n=50):
    return spark.createDataFrame(
        [(i, f"v{i}", 100) for i in range(n)],
        "id long, payload string, xmin long",
    )


def _rows(df):
    return {(r.id, r.payload, r.xmin) for r in df.collect()}


# ------------------------------------------------------------------
# broadcast byte gate
# ------------------------------------------------------------------

def test_read_merged_broadcasts_under_gate(spark, tmp_path):
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


def test_read_merged_no_forced_broadcast_over_gate(spark, tmp_path):
    """Above the byte gate the hint is NOT forced: with Spark's own
    auto-broadcast disabled, the anti-join must plan WITHOUT a
    BroadcastHashJoin — the forced hint would have overridden the
    size check, which is exactly the 100 TB failure mode."""
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(1, "u1", 200)], "id long, payload string, xmin long"
        ),
        ["id"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = read_merged(db, "t", ["id"], broadcast_key_bytes=0)
        p = merged._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in p
        assert "LeftAnti" in p
        # the plain anti-join stays CORRECT, just differently planned
        assert {r.id for r in merged.filter("id <= 1").collect()} == {0, 1}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_read_merged_gate_uses_sampled_key_width(spark, tmp_path):
    """The gate estimates bytes as footer row count x sampled key
    width: a ~1 KB string PK must NOT broadcast under a 512-byte
    threshold (row count alone would wave it through)."""
    db = _db(spark, tmp_path)
    wide = spark.createDataFrame(
        [("k" * 1000 + str(i), 100) for i in range(3)],
        "id string, xmin long",
    )
    db.overwrite("t", wide)
    append_upsert_log(
        db, "t",
        spark.createDataFrame([("k" * 1000 + "0", 200)], "id string, xmin long"),
        ["id"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = (
            read_merged(db, "t", ["id"], broadcast_key_bytes=512)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ------------------------------------------------------------------
# absolute-bytes compaction trigger
# ------------------------------------------------------------------

def test_should_compact_on_bytes_while_rows_stay_under_fraction(
    spark, tmp_path
):
    import hashlib

    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark, n=10_000))
    wide = spark.createDataFrame(
        [
            (
                i,
                "".join(  # incompressible ~2 KB payload
                    hashlib.md5(f"{i}:{j}".encode()).hexdigest()
                    for j in range(64)
                ),
                200,
            )
            for i in range(50)
        ],
        "id long, payload string, xmin long",
    )
    append_upsert_log(db, "t", wide, ["id"])
    # 50 / 10_000 = 0.005 << 0.1 — the row fraction does NOT trigger
    assert should_compact_upsert_log(db, "t", 0.1) is False
    # ... but ~100 KB of 2 KB payloads crosses a 10 KB byte cap
    assert db.table_bytes(upsert_log_table("t")) > 10_000
    assert (
        should_compact_upsert_log(db, "t", 0.1, max_log_bytes=10_000)
        is True
    )
    # a generous cap defers to the row fraction
    assert (
        should_compact_upsert_log(db, "t", 0.1, max_log_bytes=1 << 30)
        is False
    )


# ------------------------------------------------------------------
# tombstone/upsert equal-version tie
# ------------------------------------------------------------------

def test_mor_equal_version_reinsert_beats_tombstone(spark, tmp_path):
    """ADVICE r8: the delete phase synthesizes tombstones at
    watermark+1, and with Postgres xmin the NEXT transaction is often
    exactly watermark+1 — a re-insert at that same version must win
    the tie, even when its payload is all NULL (the case where the
    old payload-struct tie-break let the tombstone win)."""
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    append_delete_log(
        db, "t", spark.createDataFrame([(1,), (2,)], "id long"),
        ["id"], version=201,
    )
    assert {r.id for r in read_merged(db, "t", ["id"]).collect()} & {1, 2} == set()
    # re-inserts at the SAME version 201: one real payload, one NULL
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(1, "re", 201), (2, None, 201)],
            "id long, payload string, xmin long",
        ),
        ["id"],
    )
    got = _rows(read_merged(db, "t", ["id"]))
    assert (1, "re", 201) in got
    assert (2, None, 201) in got


# ------------------------------------------------------------------
# interrupted full copy: the copy-pending marker
# ------------------------------------------------------------------

def _sync(src_df, db, state, merge_on_read=True, force_full=False):
    return sync_updates(
        src_df, db, state, "t", ["id"],
        merge_on_read=merge_on_read, force_full=force_full,
    )


def test_interrupted_mor_full_copy_forces_full_on_next_pass(
    spark, tmp_path
):
    """Crash window: marker set -> log dropped -> overwrite DIES.
    The log rows are gone and the watermark never advanced past
    them, so an incremental next pass would skip them forever; the
    marker must force full copy instead, and a successful copy (the
    directory swap) must clear it."""
    db = _db(spark, tmp_path)
    state = StateStore(db)
    src1 = _base(spark, n=200)
    _sync(src1, db, state)  # initial full copy (state 0 -> full)
    assert state.get("t").last_seen_version == 100

    upd = spark.createDataFrame(
        [(5, "u5", 150)], "id long, payload string, xmin long"
    )
    src2 = src1.filter("id != 5").unionByName(upd)
    _sync(src2, db, state)  # lands as a log append
    assert db.table_exists(upsert_log_table("t"))
    assert state.get("t").last_seen_version == 150

    # force a full copy whose overwrite crashes AFTER the log drop
    real_overwrite = db.overwrite

    def boom(table, df):
        raise RuntimeError("simulated crash mid full copy")

    db.overwrite = boom
    with pytest.raises(RuntimeError):
        _sync(src2, db, state, force_full=True)
    db.overwrite = real_overwrite

    assert not db.table_exists(upsert_log_table("t"))  # log is gone
    assert db.copy_pending("t") is True
    # the watermark still points at the applied log batch; WITHOUT
    # the marker this pass would be incremental-and-empty and the
    # target would serve the stale base row for id 5 forever
    rng = get_update_range(src2, db, "t", state.get("t"))
    assert rng.full_table is True

    rows = _sync(src2, db, state)  # recovery pass: full copy
    assert rows == 200
    assert db.copy_pending("t") is False  # swap cleared the marker
    assert _rows(db.read("t")) == _rows(src2)


def test_copy_pending_noop_without_table(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.set_copy_pending("missing")  # no-op, no crash
    assert db.copy_pending("missing") is False


# ------------------------------------------------------------------
# MOR delete phase: silent-loss repair via log appends only
# ------------------------------------------------------------------

def _file_snapshot(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_mor_delete_phase_repairs_via_log_appends(spark, tmp_path):
    """T4 parity in MOR mode: a target missing a source row (silent
    loss) and carrying a bogus extra row is reconciled entirely with
    LOG APPENDS — tombstone for the extra, verbatim upsert append for
    the missing — and the base files are untouched (no CoW rewrite)."""
    from sslr_spark.config import Config
    from sslr_spark.job import Job, JobResult
    from sslr_spark.throttle import Throttle

    src_db = ParquetDatabase(spark, str(tmp_path / "src"))
    rows = [(i, f"v{i}", 100) for i in range(200)]
    src_db.overwrite(
        "t",
        spark.createDataFrame(rows, "id long, payload string, xmin long"),
    )
    cfg = Config(
        source=str(tmp_path / "src"),
        target=str(tmp_path / "tgt"),
        source_tables=["t"],
        primary_keys={"t": ["id"]},
        target_buckets=0,
        merge_on_read=True,
        merge_on_read_max_log=10.0,  # no compaction in-test
    )

    def run_pass():
        job = Job(spark, cfg)
        job.validate_tables()
        r = JobResult()
        job.update_table("t", r, Throttle(100))
        return job, r

    job, r1 = run_pass()
    assert r1.full_copies == ["t"]

    # silently corrupt the TARGET: drop id 10, add bogus id 999
    corrupted = (
        job.target.read("t").filter("id != 10")
        .unionByName(
            spark.createDataFrame(
                [(999, "bogus", 100)], "id long, payload string, xmin long"
            )
        )
    )
    job.target.overwrite("t", corrupted)

    before = _file_snapshot(job.target.path("t"))
    job2, r2 = run_pass()
    after = _file_snapshot(job2.target.path("t"))
    assert before == after, "MOR repair must not rewrite the base"
    assert r2.repaired_rows == 1  # id 10 re-appended from the source
    assert r2.deleted_rows == 1   # id 999 tombstoned
    assert _rows(read_merged(job2.target, "t", ["id"])) == set(rows)


def test_mor_log_health_in_job_result(spark, tmp_path):
    """VERDICT r8 item 7: per-table overlay debt in the job result —
    log rows/bytes, pending tombstones, last compaction record."""
    from sslr_spark.config import Config
    from sslr_spark.job import Job, JobResult
    from sslr_spark.throttle import Throttle

    src_db = ParquetDatabase(spark, str(tmp_path / "src"))
    rows = [(i, f"v{i}", 100) for i in range(100)]
    src_db.overwrite(
        "t",
        spark.createDataFrame(rows, "id long, payload string, xmin long"),
    )
    cfg = Config(
        source=str(tmp_path / "src"),
        target=str(tmp_path / "tgt"),
        source_tables=["t"],
        primary_keys={"t": ["id"]},
        target_buckets=0,
        merge_on_read=True,
        merge_on_read_max_log=10.0,
    )

    def run_pass():
        job = Job(spark, cfg)
        job.validate_tables()
        r = JobResult()
        job.update_table("t", r, Throttle(100))
        return job, r

    _, r1 = run_pass()
    h1 = r1.mor_log["t"]
    assert h1["log_rows"] == 0 and h1["pending_tombstones"] == 0
    assert h1["last_compaction"] is None

    # mutate source: 2 updates, 1 delete
    rows2 = [
        (i, ("U" if i < 2 else "v") + str(i), 200 if i < 2 else 100)
        for i in range(100) if i != 50
    ]
    src_db.overwrite(
        "t",
        spark.createDataFrame(rows2, "id long, payload string, xmin long"),
    )
    _, r2 = run_pass()
    h2 = r2.mor_log["t"]
    assert h2["log_rows"] == 3  # 2 upserts + 1 tombstone
    assert h2["log_bytes"] > 0
    assert h2["pending_tombstones"] == 1
    assert h2["last_compaction"] is None

    # tight cap -> the pass compacts; health reflects the fold
    cfg.merge_on_read_max_log = 0.001
    job3, r3 = run_pass()
    h3 = r3.mor_log["t"]
    # health is sampled in _maintenance (before the post-state
    # compaction hook) OR after — either way a LATER pass must show
    # the clean state and the compaction record
    _, r4 = run_pass()
    h4 = r4.mor_log["t"]
    assert h4["log_rows"] == 0 and h4["pending_tombstones"] == 0
    assert h4["last_compaction"] is not None
    assert h4["last_compaction"]["folded_rows"] == 3
    assert not job3.target.table_exists(upsert_log_table("t"))


def test_compaction_writes_sidecar_record(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.overwrite("t", _base(spark))
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(1, "u1", 200)], "id long, payload string, xmin long"
        ),
        ["id"],
    )
    out = compact_upsert_log(db, "t", ["id"])
    assert out["folded_rows"] == 1
    meta = db.read_table_meta("t", "compaction")
    assert meta["folded_rows"] == 1 and meta["at_epoch_s"] > 0


# ------------------------------------------------------------------
# bucket-pruned compaction
# ------------------------------------------------------------------

def _bucketed_db(spark, tmp_path, n=400, buckets=8):
    from sslr_spark.operators.deletes import BUCKET_COL, with_bucket

    db = _db(spark, tmp_path, "mor_bucketed")
    base = _base(spark, n=n)
    db.overwrite_partitioned(
        "t",
        with_bucket(base, ["id"], buckets, "portable"),
        BUCKET_COL,
        n_buckets=buckets,
        bucket_hash="portable",
    )
    return db, base


def test_compaction_rewrites_only_affected_buckets(spark, tmp_path):
    """A log touching keys in a few buckets folds via dynamic
    partition overwrite: untouched partitions keep their exact files,
    a fully-tombstoned bucket's directory is dropped, the log is
    truncated, and the compacted base equals the pre-compaction
    overlay read."""
    from sslr_spark.operators.deletes import BUCKET_COL, with_bucket

    db, base = _bucketed_db(spark, tmp_path)
    buckets = {
        r.id: r[BUCKET_COL]
        for r in with_bucket(base, ["id"], 8, "portable").collect()
    }
    # pick one bucket to update and another to annihilate
    upd_bucket = buckets[0]
    kill_bucket = next(b for b in set(buckets.values()) if b != upd_bucket)
    upd_ids = [i for i, b in buckets.items() if b == upd_bucket][:3]
    kill_ids = [i for i, b in buckets.items() if b == kill_bucket]

    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(i, f"u{i}", 200) for i in upd_ids],
            "id long, payload string, xmin long",
        ),
        ["id"],
    )
    append_delete_log(
        db, "t", spark.createDataFrame([(i,) for i in kill_ids], "id long"),
        ["id"], version=200,
    )
    expect = _rows(read_merged(db, "t", ["id"]))

    import os

    untouched = {
        b for b in set(buckets.values()) if b not in (upd_bucket, kill_bucket)
    }
    snap_before = {
        b: _file_snapshot(
            os.path.join(db.path("t"), f"{BUCKET_COL}={b}")
        )
        for b in untouched
    }
    out = compact_upsert_log(db, "t", ["id"])
    assert out["folded_rows"] == 3 + len(kill_ids)
    assert not db.table_exists(upsert_log_table("t"))
    for b in untouched:
        assert snap_before[b] == _file_snapshot(
            os.path.join(db.path("t"), f"{BUCKET_COL}={b}")
        ), f"untouched bucket {b} was rewritten"
    assert not os.path.exists(
        os.path.join(db.path("t"), f"{BUCKET_COL}={kill_bucket}")
    ), "fully-tombstoned bucket dir must be dropped"
    assert _rows(db.read("t")) == expect
    # layout marker survives the pruned rewrite (merges depend on it)
    assert db.layout_meta("t")["n_buckets"] == 8


def test_compaction_pruned_path_is_crash_idempotent(spark, tmp_path):
    """Crash AFTER the partition rewrite but BEFORE the log drop:
    the stale log re-applies as no-ops (each bucket's rewrite is a
    pure function of base bucket + log) — the retry converges to the
    same rows and then truncates the log."""
    db, base = _bucketed_db(spark, tmp_path)
    append_upsert_log(
        db, "t",
        spark.createDataFrame(
            [(1, "u1", 200), (2, "u2", 200)],
            "id long, payload string, xmin long",
        ),
        ["id"],
    )
    expect = _rows(read_merged(db, "t", ["id"]))

    real_drop = db.drop

    def crash_drop(t):
        raise RuntimeError("crash before log drop")

    db.drop = crash_drop
    with pytest.raises(RuntimeError):
        compact_upsert_log(db, "t", ["id"])
    db.drop = real_drop
    # log still present, base partially/fully rewritten — both the
    # overlay read and a replayed compaction converge
    assert db.table_exists(upsert_log_table("t"))
    assert _rows(read_merged(db, "t", ["id"])) == expect
    out = compact_upsert_log(db, "t", ["id"])
    assert out["folded_rows"] == 2
    assert not db.table_exists(upsert_log_table("t"))
    assert _rows(db.read("t")) == expect


# ------------------------------------------------------------------
# streaming merge-on-read sync
# ------------------------------------------------------------------

def test_stream_mor_sync_append_overlay_and_compact(spark, tmp_path):
    """Streaming CDC at MOR's native cadence: the first micro-batch
    bootstraps the base, later batches land as log APPENDS (the base
    files are untouched), flagged rows become per-row-version
    tombstones, the overlay read resolves it all, and a tight
    fraction folds the log inline."""
    from pyspark.sql import types as T

    from sslr_spark.streaming.pipeline import stream_mor_sync

    src = str(tmp_path / "src")
    db = _db(spark, tmp_path, "stream_mor")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.StringType()),
            T.StructField("xmin", T.LongType()),
            T.StructField("is_deleted", T.BooleanType()),
        ]
    )
    ddl = "id long, payload string, xmin long, is_deleted boolean"

    def drain(max_log_fraction=10.0):
        q = stream_mor_sync(
            spark, src, schema, db, "t", ["id"],
            str(tmp_path / "ckpt"),
            tombstone_flag="is_deleted",
            max_files_per_trigger=1,
            max_log_fraction=max_log_fraction,
        )
        q.awaitTermination()

    # batch 1: bootstrap (one row pre-deleted upstream — never lands)
    spark.createDataFrame(
        [(i, f"v{i}", 100, False) for i in range(50)]
        + [(999, "dead", 100, True)],
        ddl,
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    assert not db.table_exists(upsert_log_table("t"))
    assert db.table_rows("t") == 50

    base_snapshot = _file_snapshot(db.path("t"))

    # batch 2: update 0/1, insert 100, delete 5 — all version 200
    spark.createDataFrame(
        [
            (0, "U0", 200, False),
            (1, "U1", 200, False),
            (100, "new", 200, False),
            (5, None, 200, True),
        ],
        ddl,
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    snap_after = {
        p: t for p, t in _file_snapshot(db.path("t")).items()
        if "_sslr_stream_mor" not in p
    }
    base_only = {
        p: t for p, t in base_snapshot.items()
        if "_sslr_stream_mor" not in p
    }
    assert base_only == snap_after, "stream batch must not rewrite the base"
    assert db.table_exists(upsert_log_table("t"))
    assert db.table_rows(upsert_log_table("t")) == 4

    got = _rows(read_merged(db, "t", ["id"]))
    expect = {(i, f"v{i}", 100) for i in range(50) if i not in (0, 1, 5)}
    expect |= {(0, "U0", 200), (1, "U1", 200), (100, "new", 200)}
    assert got == expect

    # batch 3 with a tight fraction: the stream compacts inline
    spark.createDataFrame(
        [(2, "U2", 300, False)], ddl
    ).coalesce(1).write.mode("append").parquet(src)
    drain(max_log_fraction=0.001)
    assert not db.table_exists(upsert_log_table("t"))
    expect = {r for r in expect if r[0] != 2} | {(2, "U2", 300)}
    assert _rows(db.read("t")) == expect
    # epoch sidecar recorded (replay guard)
    assert db.read_table_meta("t", "stream_mor")["epoch"] >= 0


# ------------------------------------------------------------------
# weighted_sample: NULL keys are a loud caller bug
# ------------------------------------------------------------------

def test_weighted_sample_null_key_raises(spark):
    from py4j.protocol import Py4JJavaError

    from sslr_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", 3)], "doc_id string, w int"
    )
    with pytest.raises(Exception) as exc:
        weighted_sample(df, "doc_id", "w", k=2).collect()
    assert "NULL" in str(exc.value)


def test_weighted_sample_still_deterministic_after_null_guard(spark):
    from sslr_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(f"d{i}", 1 + i % 4) for i in range(100)], "doc_id string, w int"
    )
    a = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    b = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert a == b and len(a) == 10


# ------------------------------------------------------------------
# as-of (time travel) read
# ------------------------------------------------------------------

def test_read_merged_as_of_version(spark, tmp_path):
    """Snapshot read ignores log rows — upserts AND tombstones —
    above the pinned version; None reads latest; the horizon is the
    compaction boundary (post-compaction, old versions are gone)."""
    db = _db(spark, tmp_path, "asof")
    base = _base(spark, 30)
    db.overwrite("t", base)
    append_upsert_log(
        db, "t",
        base.filter("id % 5 = 0").withColumn("payload", F.lit("v200"))
        .withColumn("xmin", F.lit(200).cast("long")),
        ["id"],
    )
    append_delete_log(
        db, "t", base.filter("id % 10 = 0").select("id"), ["id"],
        version=300,
    )
    # as of 100: the pristine base
    at100 = _rows(read_merged(db, "t", ["id"], as_of_version=100))
    assert at100 == _rows(base)
    # as of 250: upserts visible, tombstones not yet
    at250 = {r.id: r.payload for r in
             read_merged(db, "t", ["id"], as_of_version=250).collect()}
    assert len(at250) == 30
    assert at250[5] == "v200" and at250[7] == "v7"
    # latest: every 10th gone
    latest = {r.id for r in read_merged(db, "t", ["id"]).collect()}
    assert latest == {i for i in range(30) if i % 10 != 0}
    # a batch whose version type differs from the base is rejected at
    # write time (a mixed-type log dir fails nondeterministically at
    # read — the bug this very test flushed out before the guard)
    import pytest as _pt
    with _pt.raises(ValueError, match="column types"):
        append_upsert_log(
            db, "t",
            base.limit(1).withColumn("xmin", F.lit(999)),  # int, not long
            ["id"],
        )
    # past compaction, the pre-compaction snapshot is unreachable:
    # the log is dropped and the base holds only the latest state
    compact_upsert_log(db, "t", ["id"])
    post = _rows(read_merged(db, "t", ["id"], as_of_version=100))
    assert {r[0] for r in post} == latest
