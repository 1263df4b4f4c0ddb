"""Structured Streaming mode tests: file-source incremental sync via
foreachBatch merge, windowed/session aggregation with watermarks."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from sslr_spark.sources.parquet import ParquetDatabase
from sslr_spark.streaming.pipeline import (
    sessionized_stream,
    stream_incremental_sync,
    windowed_event_aggregate,
)
from tests.conftest import assert_df_equal, make_timestamps


def test_stream_sync_merges_arriving_batches(spark, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    target = ParquetDatabase(spark, str(tmp_path / "target"))
    ckpt = str(tmp_path / "ckpt")

    base = make_timestamps(spark, 300)
    base.write.mode("append").parquet(src_dir)
    schema = base.schema

    q = stream_incremental_sync(
        spark, src_dir, schema, target, "timestamps", ["id"], ckpt
    )
    q.awaitTermination(120)
    assert_df_equal(target.read("timestamps"), base, ["id"])

    # second wave: updates for ids 0-9 (higher version) + inserts
    import datetime

    wave2 = spark.createDataFrame(
        [(i, datetime.datetime(2031, 1, 1), 999) for i in range(10)]
        + [(i, datetime.datetime(2031, 1, 1), 1000) for i in range(300, 320)],
        schema="id long, ts timestamp, xmin long",
    )
    wave2.write.mode("append").parquet(src_dir)
    q2 = stream_incremental_sync(
        spark, src_dir, schema, target, "timestamps", ["id"], ckpt
    )
    q2.awaitTermination(120)

    out = target.read("timestamps")
    assert out.count() == 320
    # updated rows carry the new version; checkpoint prevented
    # re-processing of wave 1 (wave-1 rows keep their old versions)
    assert out.filter(F.col("xmin") == 999).count() == 10
    assert out.filter((F.col("id") >= 10) & (F.col("id") < 300) & (F.col("xmin") == 999)).count() == 0


def test_windowed_aggregate_streaming_matches_batch(spark, tmp_path):
    from sslr_spark.queries import read_events

    events = read_events(spark, "/root/testdata/sf0.001")
    batch = windowed_event_aggregate(events).collect()

    # same code path over a stream (file source), memory sink
    src_dir = str(tmp_path / "ev")
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        windowed_event_aggregate(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("winagg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from winagg").collect()
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result exactly
    batch_map = {(r.window_start, r.event_type): (r.n, r.total_value) for r in batch}
    assert len(streamed) > 0
    for r in streamed:
        assert batch_map[(r.window_start, r.event_type)] == (r.n, r.total_value)


def test_session_window_stream(spark, tmp_path):
    from sslr_spark.queries import read_events

    events = read_events(spark, "/root/testdata/sf0.001")
    sess = sessionized_stream(events).collect()
    assert len(sess) > 0
    # sessions are per-user, non-overlapping, end after start
    assert all(r.session_end > r.session_start for r in sess)
    assert sum(r.n_events for r in sess) == events.count()


def test_chunk_and_scrub_work_on_streams(spark, tmp_path):
    """chunk_text and pii_scrub are stateless narrow transforms — the
    exact same call must run unmodified over a streaming DataFrame
    and produce the batch result."""
    from sslr_spark.functions.chunking import chunk_text, pii_scrub

    docs = spark.createDataFrame(
        [(i, ("tok%d " % i) * 40 + "mail a@b.co") for i in range(20)],
        "doc_id long, text string",
    )
    batch = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in chunk_text(docs, chunk_chars=64, overlap=16).collect()
    }
    src_dir = str(tmp_path / "docs")
    docs.write.parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    out = chunk_text(pii_scrub(stream, out_col="text2"), chunk_chars=64,
                     overlap=16)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("chunks").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in spark.sql("select * from chunks").collect()
    }
    assert streamed == batch


def test_stream_dedup_suppresses_cross_batch_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark across micro-batch boundaries:
    a full replay staged as a second source file (one-file triggers,
    so the duplicates arrive in a LATER batch) must be suppressed —
    whether a replayed key is caught by live state (within the
    watermark horizon) or dropped as late data below the advanced
    watermark, exactly one copy of every event survives."""
    import datetime

    from sslr_spark.streaming.pipeline import stream_dedup

    src = str(tmp_path / "src")
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(minutes=i), f"t{i % 3}")
            for i in range(50)
        ],
        "event_id long, ts timestamp, event_type string",
    )
    ev.coalesce(1).write.parquet(src)                 # first arrival
    ev.coalesce(1).write.mode("append").parquet(src)  # full replay
    out = str(tmp_path / "out")
    stream_dedup(
        spark,
        src,
        spark.read.parquet(src).schema,
        out,
        str(tmp_path / "ckpt"),
        key_cols=["event_id"],
        select_cols=["event_id", "event_type"],
        max_files_per_trigger=1,  # replay lands in its own batch
    )
    got = spark.read.parquet(out)
    assert got.count() == 50  # not 100: every replayed copy suppressed
    assert got.select("event_id").distinct().count() == 50
    assert_df_equal(
        got.select("event_id", "event_type"),
        ev.select("event_id", "event_type"),
        ["event_id"],
    )


def test_streaming_ingest_dedup_against_static_corpus(spark, tmp_path):
    """foreachBatch composition: each arriving micro-batch is deduped
    against the accepted corpus with the Bloom-prefiltered exact path
    (bits built once, reused across batches) before landing."""
    from sslr_spark.functions.dedup import incremental_exact_dedup
    from sslr_spark.functions.membership import bloom_build

    corpus = spark.createDataFrame(
        [(i, f"known {i}") for i in range(100)], "doc_id long, text string"
    )
    bits = bloom_build(
        corpus.select(F.md5("text").alias("__h")), "__h", 4096, 3,
        seed="corpus",
    ).persist()
    bits.count()

    src_dir = str(tmp_path / "ingest_src")
    os.makedirs(src_dir)
    batch1 = spark.createDataFrame(
        [(200, "known 7"), (201, "fresh a"), (202, "fresh b")],
        "doc_id long, text string",
    )
    batch1.write.mode("append").parquet(src_dir)
    target = ParquetDatabase(spark, str(tmp_path / "ingest_target"))

    def apply_batch(bdf, epoch_id):
        fresh = incremental_exact_dedup(
            bdf, corpus, m=4096, k=3, seed="corpus", bits=bits
        ).filter(~F.col("in_corpus")).drop("in_corpus")
        if target.table_exists("accepted"):
            target.append("accepted", fresh)
        else:
            target.overwrite("accepted", fresh)

    stream = (
        spark.readStream.schema(batch1.schema).parquet(src_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ingest_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    got = {r["doc_id"] for r in target.read("accepted").collect()}
    assert got == {201, 202}  # the known-text doc never lands
    bits.unpersist()


@pytest.mark.slow
def test_streaming_neardup_ingest_with_self_maintaining_index(
    spark, tmp_path
):
    """Continuous near-dup ingest: batch 2's edited re-crawl of a
    batch-1 doc is caught by the PERSISTED index (no corpus rescan);
    replaying everything through a fresh checkpoint rewrites the same
    per-epoch partitions instead of duplicating (exactly-once)."""
    from sslr_spark.streaming.pipeline import streaming_neardup_ingest

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    schema_str = "doc_id long, text string"
    batch1 = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),        # in-batch near-dup of 1
            (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
        ],
        schema_str,
    )
    src_dir = str(tmp_path / "nd_src")
    os.makedirs(src_dir)
    target = ParquetDatabase(spark, str(tmp_path / "nd_target"))
    ckpt = str(tmp_path / "nd_ckpt")

    def run():
        q = streaming_neardup_ingest(
            spark, src_dir, batch1.schema, target, ckpt,
            jaccard_threshold=0.5,
        )
        q.awaitTermination(180)

    batch1.write.mode("append").parquet(src_dir)
    run()
    got = {r["doc_id"] for r in target.read("accepted").collect()}
    assert got == {1, 3}  # 2 collapsed within its own batch

    batch2 = spark.createDataFrame(
        [
            (10, base.replace("w15", "w15x")),  # edited re-crawl of 1
            (11, "y1 y2 y3 y4 y5 y6 y7 y8"),    # genuinely new
        ],
        schema_str,
    )
    batch2.write.mode("append").parquet(src_dir)
    run()
    got = {r["doc_id"] for r in target.read("accepted").collect()}
    assert got == {1, 3, 11}  # 10 caught by the stored index

    # the index grew incrementally: rows exist for every accepted doc
    idx_docs = {
        r["doc_id"]
        for r in target.read("__neardup_index_buckets").collect()
    }
    assert idx_docs == {1, 3, 11}

    # fresh-checkpoint REBUILD over the same target (dangerous in
    # general — changed batch boundaries can change near-dup winners):
    # without force=True the epoch-0-on-populated-target misroute is
    # now a HARD ERROR (a warning is too easy to miss in driver logs)
    import shutil

    import pytest

    shutil.rmtree(ckpt)
    with pytest.raises(Exception, match="already-.?populated"):
        q = streaming_neardup_ingest(
            spark, src_dir, batch1.schema, target, ckpt,
            jaccard_threshold=0.5,
        )
        q.awaitTermination()

    # force=True acknowledges the rebuild semantics (still warns):
    # every file replays as epoch 0 and the epoch-excluding index load
    # + per-epoch partition overwrite leave the accepted set unchanged
    # (here the data is boundary-stable) — the same machinery that
    # makes a checkpointed same-epoch crash replay exactly-once
    shutil.rmtree(ckpt)
    with pytest.warns(RuntimeWarning, match="already-.?populated"):
        q = streaming_neardup_ingest(
            spark, src_dir, batch1.schema, target, ckpt,
            jaccard_threshold=0.5, force=True,
        )
        q.awaitTermination(180)
    rows = target.read("accepted").collect()
    assert {r["doc_id"] for r in rows} == {1, 3, 11}
    assert len(rows) == 3


def test_streaming_neardup_survives_first_epoch_crash_artifacts(
    spark, tmp_path
):
    """A crash during the very first epoch's bucket-index write leaves
    the table dir with only an uncommitted _temporary subtree; the
    replay must treat the index as absent (no committed data) instead
    of failing schema inference forever."""
    from sslr_spark.streaming.pipeline import streaming_neardup_ingest

    target = ParquetDatabase(spark, str(tmp_path / "wedge_target"))
    # simulate the crash artifact: directory exists, zero committed files
    crashed = target.path("__neardup_index_buckets")
    os.makedirs(os.path.join(crashed, "_temporary", "0"))

    batch = spark.createDataFrame(
        [(1, "a1 a2 a3 a4 a5"), (2, "b1 b2 b3 b4 b5")],
        "doc_id long, text string",
    )
    src_dir = str(tmp_path / "wedge_src")
    os.makedirs(src_dir)
    batch.write.mode("append").parquet(src_dir)

    q = streaming_neardup_ingest(
        spark, src_dir, batch.schema, target,
        str(tmp_path / "wedge_ckpt"), jaccard_threshold=0.5,
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in target.read("accepted").collect()}
    assert got == {1, 2}


@pytest.mark.slow
def test_compact_neardup_index_folds_old_epochs(spark, tmp_path):
    """Index maintenance: old per-epoch partitions fold into the -1
    base; dedup behavior is unchanged afterwards and a second
    compaction is a no-op."""
    from sslr_spark.streaming.pipeline import (
        compact_neardup_index,
        streaming_neardup_ingest,
    )

    schema_str = "doc_id long, text string"
    src_dir = str(tmp_path / "cmp_src")
    os.makedirs(src_dir)
    target = ParquetDatabase(spark, str(tmp_path / "cmp_target"))
    ckpt = str(tmp_path / "cmp_ckpt")

    def run():
        q = streaming_neardup_ingest(
            spark, src_dir, spark.createDataFrame([], schema_str).schema,
            target, ckpt, jaccard_threshold=0.5,
        )
        q.awaitTermination(180)

    texts = {
        1: "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10",
        2: "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10",
        3: "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
    }
    for i in (1, 2, 3):  # three separate epochs
        spark.createDataFrame([(i, texts[i])], schema_str).write.mode(
            "append"
        ).parquet(src_dir)
        run()

    folded = compact_neardup_index(target, keep_last=2)
    assert folded == 1  # epoch 0 folded, epochs 1-2 kept
    assert compact_neardup_index(target, keep_last=2) == 0  # idempotent

    acc = target.read("accepted")
    assert {r["doc_id"] for r in acc.collect()} == {1, 2, 3}
    assert acc.count() == 3
    epochs = {r[0] for r in acc.select("__epoch").distinct().collect()}
    # the base is a sealed segment under a fresh negative id (never an
    # in-place rewrite of a live partition — crash-safety invariant)
    assert len([e for e in epochs if e < 0]) == 1
    assert {e for e in epochs if e >= 0} == {1, 2}

    # a near-dup of the FOLDED doc 1 must still be rejected
    spark.createDataFrame(
        [(20, texts[1] + " tail"), (21, "z1 z2 z3 z4 z5 z6 z7 z8")],
        schema_str,
    ).write.mode("append").parquet(src_dir)
    run()
    assert {r["doc_id"] for r in target.read("accepted").collect()} == {
        1, 2, 3, 21,
    }


@pytest.mark.slow
def test_streaming_neardup_auto_compaction(spark, tmp_path):
    """compact_every folds old epochs during the stream itself; dedup
    behavior is unchanged afterwards."""
    from sslr_spark.streaming.pipeline import streaming_neardup_ingest

    schema_str = "doc_id long, text string"
    src_dir = str(tmp_path / "ac_src")
    os.makedirs(src_dir)
    target = ParquetDatabase(spark, str(tmp_path / "ac_target"))
    ckpt = str(tmp_path / "ac_ckpt")

    def run():
        q = streaming_neardup_ingest(
            spark, src_dir, spark.createDataFrame([], schema_str).schema,
            target, ckpt, jaccard_threshold=0.5, compact_every=2,
        )
        q.awaitTermination(180)

    for i in range(1, 5):  # epochs 0..3; compaction fires at 2
        spark.createDataFrame(
            [(i, f"t{i}a t{i}b t{i}c t{i}d t{i}e t{i}f")], schema_str
        ).write.mode("append").parquet(src_dir)
        run()

    acc = target.read("accepted")
    assert {r["doc_id"] for r in acc.collect()} == {1, 2, 3, 4}
    epochs = {r[0] for r in acc.select("__epoch").distinct().collect()}
    # old epochs sealed into a (negative-id) segment mid-stream, and
    # the manifest tracks it
    assert any(e < 0 for e in epochs)
    from sslr_spark.streaming.pipeline import load_segment_manifest

    m = load_segment_manifest(target)
    assert m is not None and m["segments"]
    # dedup still works against folded index rows
    spark.createDataFrame(
        [(10, "t1a t1b t1c t1d t1e t1f tail")], schema_str
    ).write.mode("append").parquet(src_dir)
    run()
    assert 10 not in {r["doc_id"] for r in target.read("accepted").collect()}


# -- incremental (size-tiered) compaction ------------------------------

def _mk_epoch(spark, target, e, n_rows=10):
    """One committed synthetic epoch across the three near-dup tables
    — the canonical synthesizer lives in tools/stress_compaction.py
    (shared so the stress probe and these tests can never drift on
    the table layout); this wrapper only shrinks the doc_id stride
    for compact test ids."""
    from tools.stress_compaction import _mk_epoch as mk

    mk(spark, target, e, n_rows, id_stride=1000)


@pytest.mark.slow
def test_incremental_compaction_cost_bounded(spark, tmp_path):
    """VERDICT r3 task #5's acceptance bar: per-call rewritten rows
    are bounded by the folded batches plus the merged (smallest)
    segments — never the whole corpus — and total maintenance I/O
    over the run is O(n log n), not the old full-rewrite O(n^2)."""
    from sslr_spark.streaming.pipeline import (
        compact_neardup_index_incremental,
        load_segment_manifest,
    )

    target = ParquetDatabase(spark, str(tmp_path / "tc_target"))
    n_epochs, rows = 16, 10
    per_call = []
    for e in range(n_epochs):
        _mk_epoch(spark, target, e, rows)
        stats = compact_neardup_index_incremental(
            target, keep_last=2, max_segments=4
        )
        per_call.append(stats)
        # cost invariant: this call rewrote exactly the folded batch
        # plus the merged segments — nothing else
        m = load_segment_manifest(target)
        assert stats["segments"] <= 4
        if stats["folded_epochs"] or stats["merged_segments"]:
            assert stats["rewritten_rows"] <= (
                stats["folded_epochs"] * rows
                + max(m["segments"].values()) * 2
            )
    corpus = n_epochs * rows
    total_rewritten = sum(s["rewritten_rows"] for s in per_call)
    # full-rewrite-per-call would cost ~sum_i(i*rows) ≈ corpus^2/(2*rows)
    full_rewrite_cost = sum(max(0, (e - 1) * rows)
                            for e in range(1, n_epochs + 1))
    assert total_rewritten < full_rewrite_cost / 2
    # every original row is live exactly once
    from sslr_spark.streaming.pipeline import read_accepted

    acc = read_accepted(target)
    assert acc.count() == corpus
    assert acc.select("doc_id").distinct().count() == corpus
    # idempotent: nothing new -> no-op
    again = compact_neardup_index_incremental(
        target, keep_last=2, max_segments=4
    )
    assert again["folded_epochs"] == 0 and again["rewritten_rows"] == 0


@pytest.mark.slow
def test_incremental_compaction_crash_convergence(spark, tmp_path, monkeypatch):
    """Crash windows: (a) after segment write, BEFORE manifest commit
    — the orphan partition stays invisible and the next call overwrites
    it; (b) after manifest commit, BEFORE the GC drops — live readers
    never see the dead copies and the next call GCs them."""
    import sslr_spark.streaming.pipeline as P

    target = ParquetDatabase(spark, str(tmp_path / "cc_target"))
    for e in range(4):
        _mk_epoch(spark, target, e, 5)
    # first call bootstraps the manifest and folds epochs 0-1
    stats = P.compact_neardup_index_incremental(target, keep_last=2)
    assert stats["folded_epochs"] == 2
    folded_upto_before = P.load_segment_manifest(target)["folded_upto"]

    # (a) crash AFTER the segment write, BEFORE the manifest commit
    for e in range(4, 7):
        _mk_epoch(spark, target, e, 5)
    real_write = P._write_segment_manifest

    def boom(*a, **kw):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(P, "_write_segment_manifest", boom)
    try:
        P.compact_neardup_index_incremental(target, keep_last=2)
    except RuntimeError:
        pass
    monkeypatch.setattr(P, "_write_segment_manifest", real_write)
    # orphan segment written but untracked: manifest and live view
    # unchanged (35 = one 10-row segment + epochs 2..6)
    m = P.load_segment_manifest(target)
    assert m["folded_upto"] == folded_upto_before and len(m["segments"]) == 1
    acc = P.read_accepted(target)
    assert acc.count() == 35 and acc.select("doc_id").distinct().count() == 35

    # re-run converges: folds the same epochs over the orphan
    stats = P.compact_neardup_index_incremental(target, keep_last=2)
    assert stats["folded_epochs"] == 3  # epochs 2,3,4
    acc = P.read_accepted(target)
    assert acc.count() == 35 and acc.select("doc_id").distinct().count() == 35

    # (b) crash between manifest commit and GC
    for e in range(7, 10):
        _mk_epoch(spark, target, e, 5)
    real_drop = ParquetDatabase.drop_partitions
    monkeypatch.setattr(
        ParquetDatabase, "drop_partitions", lambda *a, **kw: None
    )
    P.compact_neardup_index_incremental(target, keep_last=2)
    monkeypatch.setattr(ParquetDatabase, "drop_partitions", real_drop)
    # dead epochs still on disk -> plain read double-counts ...
    assert target.read("accepted").count() > 50
    # ... but the live view does not
    acc = P.read_accepted(target)
    assert acc.count() == 50 and acc.select("doc_id").distinct().count() == 50
    # next call GCs the leftovers
    P.compact_neardup_index_incremental(target, keep_last=2)
    assert target.read("accepted").count() == 50


def test_incremental_compaction_dedupes_legacy_crash_dupes(
    spark, tmp_path
):
    """ADVICE r4: a crash of the pre-manifest (round-3) FULL compactor
    could leave a legacy -1 base plus its not-yet-dropped source
    epochs; the manifest bootstrap adopts BOTH copies as live. The
    incremental path's _seal must build segments distinct (like the
    full compactor) so those duplicates converge instead of surviving
    every fold forever."""
    import sslr_spark.streaming.pipeline as P

    target = ParquetDatabase(spark, str(tmp_path / "legacy_dupes"))
    for e in range(4):
        _mk_epoch(spark, target, e, 5)
    # simulate the round-3 crash artifact: a -1 base holding copies of
    # epochs 0-1 (what the pre-manifest full compactor wrote before it
    # died mid-GC), with the source epochs still on disk, no manifest
    for t in ("accepted", "__neardup_index_shingles",
              "__neardup_index_buckets"):
        legacy = (
            target.read(t)
            .filter(F.col("__epoch").isin([0, 1]))
            .withColumn("__epoch", F.lit(-1))
        )
        target.replace_partitions(t, legacy, "__epoch")
    # both copies are live at bootstrap: 4 epochs x 5 + 10 legacy dupes
    assert P.read_accepted(target).count() == 30

    # max_segments=1 forces the fold segment to merge with the adopted
    # legacy base on the first call — the distinct collapses the dupes
    stats = P.compact_neardup_index_incremental(
        target, keep_last=2, max_segments=1
    )
    assert stats["folded_epochs"] == 2 and stats["merged_segments"] == 2
    acc = P.read_accepted(target)
    assert acc.count() == 20  # epochs 0..3, no double-counted rows
    assert acc.select("doc_id").distinct().count() == 20
    # the index tables converged too
    bk = target.read("__neardup_index_buckets").filter(
        P.live_epoch_filter(P.load_segment_manifest(target))
    )
    assert bk.count() == 20


@pytest.mark.slow
def test_compaction_state_machine_property(spark, tmp_path_factory):
    """Hypothesis state machine over the compactor: any interleaving
    of epoch arrivals, incremental compactions, FULL compactions, and
    the two crash modes (die before the manifest commit / die before
    GC) must keep the live view exactly equal to everything ever
    ingested — no loss, no duplicates — at every step."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from unittest import mock

    import sslr_spark.streaming.pipeline as P

    OPS = ["epoch", "epoch", "compact", "full",
           "crash_manifest", "crash_gc",
           "full_crash_manifest", "full_crash_gc"]

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=st.lists(st.sampled_from(OPS), min_size=3, max_size=9))
    def run(ops):
        tmp = tmp_path_factory.mktemp("csm")
        target = ParquetDatabase(spark, str(tmp / "t"))
        next_epoch = 0
        expected: set[int] = set()

        def check():
            if next_epoch == 0:
                return
            acc = P.read_accepted(target)
            got = sorted(r[0] for r in acc.select("doc_id").collect())
            assert got == sorted(expected), (
                f"live view diverged after {ops[:step + 1]}"
            )

        for step, op in enumerate(ops):
            if op == "epoch":
                _mk_epoch(spark, target, next_epoch, 3)
                expected |= {next_epoch * 1000 + i for i in range(3)}
                next_epoch += 1
            elif op == "compact":
                P.compact_neardup_index_incremental(target, keep_last=2,
                                                    max_segments=3)
            elif op == "full":
                P.compact_neardup_index(target, keep_last=2)
            elif op in ("crash_manifest", "full_crash_manifest"):
                fn = (P.compact_neardup_index_incremental
                      if op == "crash_manifest"
                      else P.compact_neardup_index)
                real = P._write_segment_manifest

                # let the no-op BOOTSTRAP commit through (it changes
                # nothing visible) and crash only the real commit —
                # crashing the bootstrap just means nothing ran
                def once_then_boom(tgt, it, man, _real=real, _st={"n": 0}):
                    if _st["n"] == 0 and man.get("segments") in ({}, None):
                        _st["n"] += 1
                        return _real(tgt, it, man)
                    raise RuntimeError("crash before manifest commit")

                with mock.patch.object(
                    P, "_write_segment_manifest", once_then_boom
                ):
                    try:
                        fn(target, keep_last=2)
                    except RuntimeError:
                        pass
            elif op in ("crash_gc", "full_crash_gc"):
                fn = (P.compact_neardup_index_incremental
                      if op == "crash_gc"
                      else P.compact_neardup_index)
                with mock.patch.object(
                    ParquetDatabase, "drop_partitions",
                    lambda *a, **kw: None,
                ):
                    fn(target, keep_last=2)
            check()

    run()


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """The stream-stream interval join must produce exactly the batch
    join's pairs (single micro-batch => no lateness), inclusive on
    both window boundaries."""
    import datetime as dt

    from sslr_spark.streaming.pipeline import stream_interval_join

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: error at +0s (boundary), +600s (boundary), +601s (out)
        (1, t0, 1, "click"),
        (2, t0, 1, "error"),
        (3, t0 + dt.timedelta(seconds=600), 1, "error"),
        (4, t0 + dt.timedelta(seconds=601), 1, "error"),
        # user 2: error BEFORE the click -> never joins
        (5, t0 + dt.timedelta(seconds=100), 2, "click"),
        (6, t0, 2, "error"),
        # user 3: error in-window but different user than the click
        (7, t0 + dt.timedelta(seconds=50), 3, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")
    stream_interval_join(
        spark, src, spark.read.parquet(src).schema, out,
        str(tmp_path / "ckpt"),
        left_filter="event_type = 'click'",
        right_filter="event_type = 'error'",
        join_keys=["user_id"],
        window_seconds=600,
    )
    got = {(r.left_id, r.right_id) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 2), (1, 3)}


@pytest.mark.slow
def test_stream_sessionize_state_survives_checkpoint_restart(
    spark, tmp_path
):
    """Kill-and-resume through the checkpoint: run 1 drains a batch
    whose trailing sessions stay OPEN in the state store; run 2 (a
    fresh query over the same checkpoint) extends one user's history
    — the open session must close against state recovered from the
    checkpoint, and watermark-advancing sentinels must flush the
    rest. Final output equals the batch gaps-and-islands answer."""
    from sslr_spark.streaming.pipeline import stream_sessionize

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(src)
    t0 = 1_700_000_000_000_000  # epoch micros
    minute = 60_000_000

    def write_file(rows):
        spark.createDataFrame(rows, "user_id long, ts_us long").select(
            "user_id", F.timestamp_micros("ts_us").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    schema = None

    def run():
        stream_sessionize(
            spark, src, schema, out, ckpt,
            gap_minutes=10, watermark="2 minutes",
            max_files_per_trigger=1,
        )

    # run 1: two users, trailing sessions left OPEN in state
    write_file([(1, t0), (1, t0 + 2 * minute), (2, t0 + minute)])
    schema = spark.read.parquet(src).schema
    run()  # "crash": the query ends with open sessions checkpointed

    # run 2: user 1 returns after a closed gap; sentinels flush
    write_file([(1, t0 + 60 * minute)])
    write_file([(-1, t0 + 300 * minute)])
    write_file([(-2, t0 + 400 * minute)])
    run()

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).filter("user_id >= 0").collect()
    }
    assert got == {
        (1, t0, t0 + 2 * minute, 2),          # closed by run-2 gap,
                                              # built from RECOVERED state
        (1, t0 + 60 * minute, t0 + 60 * minute, 1),  # flushed by timeout
        (2, t0 + minute, t0 + minute, 1),            # flushed by timeout
    }


@pytest.mark.slow
def test_stream_sessionize_drops_below_watermark_events(spark, tmp_path):
    """T9 semantics pinned: an event arriving BELOW the advanced
    watermark is dropped before the stateful operator — it must not
    resurrect or extend an already-closed session (the documented
    Structured Streaming late-data contract; it is also what makes
    the state-timeout closure provably safe)."""
    from sslr_spark.streaming.pipeline import stream_sessionize

    src = str(tmp_path / "late_src")
    out = str(tmp_path / "late_out")
    os.makedirs(src)
    t0 = 1_700_000_000_000_000
    minute = 60_000_000

    def write_file(rows):
        spark.createDataFrame(rows, "user_id long, ts_us long").select(
            "user_id", F.timestamp_micros("ts_us").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    write_file([(1, t0)])
    write_file([(1, t0 + 100 * minute)])   # advances wm to t0+98min
    write_file([(1, t0 + 1 * minute)])     # LATE: below the watermark
    write_file([(-1, t0 + 500 * minute)])  # sentinels flush timeouts
    write_file([(-2, t0 + 600 * minute)])
    stream_sessionize(
        spark, src, spark.read.parquet(src).schema, out,
        str(tmp_path / "late_ckpt"),
        gap_minutes=10, watermark="2 minutes", max_files_per_trigger=1,
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).filter("user_id >= 0").collect()
    }
    # the late t0+1min event influenced NOTHING: session 1 stays a
    # singleton (n_events=1), and no extra session appears for it
    assert got == {
        (1, t0, t0, 1),
        (1, t0 + 100 * minute, t0 + 100 * minute, 1),
    }
