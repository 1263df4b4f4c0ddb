"""Continuous sync as Structured Streaming (reference T6, upgraded).

The reference's continuous mode is a poll loop: run job, sleep 5 s,
repeat (reference main.go:38-82). The Spark-native formulation is a
streaming query: ``readStream`` over the source, ``foreachBatch``
applying the same idempotent merge the batch engine uses, checkpointed
offsets supplying exactly-once-per-batch semantics — the T2
"never half-commit a version" rule falls out of micro-batch atomicity
plus the idempotent merge.

Late data: the reference has none (T9 — xmin monotonicity assumed,
wraparound unhandled, README.md:202). The streaming rebuild fixes
this properly: event-time watermarks bound state for windowed
aggregations, and versions are unbounded 64-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sslr_spark.operators.updates import dedup_latest_version, merge_upsert
from sslr_spark.sources.parquet import ParquetDatabase


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark requires TIMESTAMP; testdata parquet may carry
    TIMESTAMP_NTZ. Cast NTZ wall-clock to session-tz TIMESTAMP — window
    boundaries stay wall-clock aligned, so batch/stream parity holds as
    long as both paths go through the same cast."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def stream_incremental_sync(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    target: ParquetDatabase,
    table: str,
    pk_cols: list[str],
    checkpoint_dir: str,
    version_col: str = "xmin",
    trigger_seconds: float | None = None,
    max_files_per_trigger: int | None = None,
    n_buckets: int | None = 64,
    bucket_hash: str = "portable",
):
    """Start a streaming sync: each micro-batch of newly arrived source
    files is merged (last-version-wins upsert) into the target table.

    - ``checkpoint_dir`` holds the stream's offsets — the streaming
      analog of the reference's state table watermark (T1).
    - ``max_files_per_trigger`` is the rate cap (throttle analog, T5).
    - trigger: processingTime mirrors the reference's poll interval;
      None => availableNow semantics are up to the caller's stop.
    - ``n_buckets`` (default on): maintain the target
      bucket-partitioned and merge each micro-batch via pruned
      dynamic-partition overwrite — per-trigger cost ∝ touched
      buckets, not table size. ``None`` falls back to whole-table
      read-merge-overwrite (small targets only).

    Returns the StreamingQuery.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        updates = dedup_latest_version(batch_df, pk_cols, version_col)
        from sslr_spark.operators.deletes import (
            BUCKET_COL,
            effective_buckets,
            with_bucket,
        )
        from sslr_spark.operators.updates import merge_upsert_partitioned

        # Honor the STORED layout (same guard as the batch path): a
        # pre-existing unpartitioned target merges unpartitioned; a
        # target bucketed with a different count keeps its own count.
        eff = effective_buckets(target, table, n_buckets)
        if eff:
            if target.table_exists(table):
                merge_upsert_partitioned(
                    target, table, updates, pk_cols, eff
                )
            else:
                # fresh table: create it in the CONFIGURED hash mode,
                # same as the batch full-copy path (existing tables
                # merge under their stored mode via
                # merge_upsert_partitioned)
                target.overwrite_partitioned(
                    table,
                    with_bucket(updates, pk_cols, eff, bucket_hash),
                    BUCKET_COL,
                    n_buckets=eff,
                    bucket_hash=bucket_hash,
                    sort_cols=pk_cols,
                )
            return
        if hasattr(target, "apply_upsert"):
            # in-place target (JDBC / Delta without buckets): apply the
            # micro-batch as DELETE+INSERT / MERGE — never a per-trigger
            # whole-table rewrite. Version ids never land in in-place
            # targets (same as the batch path's strip_version).
            applied = (
                updates.drop(version_col)
                if version_col in updates.columns
                else updates
            )
            if not target.table_exists(table) and hasattr(
                target, "create_table"
            ):
                target.create_table(table, applied.schema)
            target.apply_upsert(table, applied, pk_cols)
            return
        if target.table_exists(table):
            merged = merge_upsert(target.read(table), updates, pk_cols)
        else:
            merged = updates
        target.overwrite(table, merged)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window aggregation with a lateness
    watermark — works on both a streaming and a batch DataFrame
    (identical code path; T9 upgrade over the reference)."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("first_version", T.LongType(), True),
    ]
)
FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def streaming_first_seen(
    keyed_stream: DataFrame,
    key_col: str = "key",
    version_col: str = "xmin",
):
    """Custom stateful operator via applyInPandasWithState: streaming
    exact-dedup — emit each key only the FIRST time it is ever seen
    across micro-batches; per-key GroupState persists in the
    checkpoint. This is the streaming form of exact dedup (a new
    document/key passes once; re-deliveries and re-crawls are dropped),
    state bounded by distinct keys and shardable by the groupBy hash.
    """
    import pandas as pd

    def fn(key, pdf_iter, state):
        if state.exists:
            return iter(())
        first_version = None
        for pdf in pdf_iter:
            v = pdf[version_col].min()
            first_version = v if first_version is None else min(first_version, v)
        state.update((True,))
        return iter(
            [pd.DataFrame({"key": [key[0]], "first_version": [first_version]})]
        )

    return keyed_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session-window aggregation (dynamic-gap session_window) — the
    streaming-native version of the batch sessionize query."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_neardup_ingest(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    target: ParquetDatabase,
    checkpoint_dir: str,
    accepted_table: str = "accepted",
    index_table: str = "__neardup_index",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
    hash_mode: str = "portable",
    trigger_seconds: float | None = None,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Continuous near-dup-deduped ingest: every arriving micro-batch
    is collapsed within itself, probed against the ACCEPTED corpus's
    persisted MinHash index, and only genuinely new documents land —
    the streaming composition of :func:`incremental_minhash_dedup` +
    :func:`minhash_index`.

    Per micro-batch (epoch):

    1. in-batch collapse: LSH-verified pairs, min-id keeper (the
       ``doc_b`` side of each verified pair drops — conservative on
       transitive chains, same policy as the batch pair queries);
    2. corpus probe: survivors run against the stored index tables —
       batch-side hashing plus candidate joins only, the accepted
       corpus itself is NEVER rescanned (its shingles/band-buckets
       were persisted when its docs were accepted);
    3. landing: survivors append to ``accepted_table`` and their index
       rows (shingles + band buckets) append to the index tables —
       index maintenance is a plain append because the artifacts are
       row-per-(doc, shingle|band).

    Exactly-once for CHECKPOINTED replays (the crash-recovery path,
    where a replayed epoch carries the same id and file set): all
    three writes go through per-epoch dynamic partition overwrite
    (``replace_partitions`` on an ``__epoch`` column), and the index
    load EXCLUDES the current epoch's partition — so a replayed batch
    recomputes against exactly the pre-crash corpus state and
    overwrites its own partitions with identical rows instead of
    appending duplicates or (worse) self-matching into data loss.

    A FRESH checkpoint over an already-populated target is a rebuild,
    not a replay: epoch numbering restarts at 0 while the target still
    holds higher-epoch partitions, and changed batch boundaries can
    legitimately change which member of a near-dup pair wins, so
    results may differ from the original run and stale high-epoch
    partitions are never reconciled. Rebuild into a FRESH target
    instead (the epoch-0-on-used-target case logs a warning).

    LSH parameters (``shingle_n / n_hashes / n_bands / hash_mode``)
    are baked into the stored index — keep them constant for the life
    of the target, or rebuild the index with :func:`minhash_index`.

    ``compact_every``: run :func:`compact_neardup_index` automatically
    after every Nth epoch (its ``keep_last`` default protects the
    replayable recent epochs) — long-running ingests then never
    accumulate unbounded per-trigger partitions. Each compaction
    rewrites the monolithic base partition, so total maintenance I/O
    over the stream's life is O(corpus²/compact_every): pick a cadence
    where the base rewrite stays small relative to N micro-batches,
    and prefer scheduling compaction OFFLINE (between stream restarts,
    or from a separate maintenance job against the same target) for
    very long-lived ingests; tiered folding (sealed segments instead
    of one base) is the next step if that ever dominates.

    Returns the StreamingQuery. Accepted reads carry the ``__epoch``
    partition column (drop it downstream if unwanted).
    """
    from sslr_spark.functions.dedup import (
        cache_scope,
        incremental_minhash_dedup,
        minhash_index,
        minhash_lsh_pairs,
    )

    sh_table = f"{index_table}_shingles"
    bk_table = f"{index_table}_buckets"

    def _has_committed_data(table: str) -> bool:
        """True only when the table dir holds at least one COMMITTED
        data file. A crash during the very first epoch's write can
        leave the directory with only an uncommitted ``_temporary``
        subtree — ``table_exists`` then passes but ``read`` fails
        schema inference on every replay, wedging the stream. The
        bucket table is written LAST each epoch, so committed data
        there implies the shingle table has data too; partial writes
        from a crashed later epoch are invisible to reads (Spark
        ignores ``_``-prefixed paths), so older epochs stay usable."""
        root = target.path(table)
        if not os.path.isdir(root):
            return False
        for dirpath, dirnames, filenames in os.walk(root):
            # skip uncommitted/hidden subtrees (_temporary, .staging)
            # but KEEP partition dirs — they contain '=' and are read
            # by Spark even with the __-prefixed partition column name
            dirnames[:] = [
                d
                for d in dirnames
                if "=" in d or not d.startswith(("_", "."))
            ]
            if any(not f.startswith(("_", ".")) for f in filenames):
                return True
        return False

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_path)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        batch = batch_df.persist()
        fresh = None
        index_ready = _has_committed_data(bk_table)
        if int(epoch_id) == 0 and index_ready:
            import warnings

            warnings.warn(
                "streaming_neardup_ingest: epoch 0 over an already-"
                "populated target — this is a rebuild with a fresh "
                "checkpoint, not a crash replay; stale higher-epoch "
                "partitions are not reconciled. Rebuild into a fresh "
                "target instead.",
                RuntimeWarning,
                stacklevel=2,
            )
        # cache_scope: incremental_minhash_dedup's entry-release would
        # otherwise unpersist the in-batch pair generator's shingle
        # cache before any write action materializes survivors —
        # recomputing the whole LSH pipeline once per output table
        try:
            with cache_scope():
                ep = F.lit(int(epoch_id))
                pairs = minhash_lsh_pairs(
                    batch, text_col, shingle_n, n_hashes, n_bands,
                    jaccard_threshold, hash_mode,
                )
                losers = pairs.select(
                    F.col("doc_b").alias("doc_id")
                ).distinct()
                survivors = batch.join(losers, "doc_id", "left_anti")
                if index_ready:
                    c_sh = (
                        target.read(sh_table)
                        .filter(F.col("__epoch") != int(epoch_id))
                        .drop("__epoch")
                    )
                    c_bk = (
                        target.read(bk_table)
                        .filter(F.col("__epoch") != int(epoch_id))
                        .drop("__epoch")
                    )
                    flags = incremental_minhash_dedup(
                        survivors,
                        text_col=text_col,
                        shingle_n=shingle_n,
                        n_hashes=n_hashes,
                        n_bands=n_bands,
                        jaccard_threshold=jaccard_threshold,
                        hash_mode=hash_mode,
                        corpus_index=(c_sh, c_bk),
                    )
                    fresh = survivors.join(
                        flags.filter(~F.col("near_dup")).select("doc_id"),
                        "doc_id",
                        "left_semi",
                    ).persist()
                else:
                    fresh = survivors.persist()
                new_sh, new_bk, _ = minhash_index(
                    fresh, text_col, shingle_n, n_hashes, n_bands, hash_mode
                )
                target.replace_partitions(
                    accepted_table, fresh.withColumn("__epoch", ep), "__epoch"
                )
                target.replace_partitions(
                    sh_table, new_sh.withColumn("__epoch", ep), "__epoch"
                )
                target.replace_partitions(
                    bk_table, new_bk.withColumn("__epoch", ep), "__epoch"
                )
            if (
                compact_every
                and int(epoch_id) > 0
                and int(epoch_id) % compact_every == 0
            ):
                # runs after this epoch's table writes but BEFORE the
                # streaming checkpoint commits the epoch — replay stays
                # safe because compaction is idempotent and keep_last
                # leaves the replayable epochs separately addressable
                compact_neardup_index(
                    target, index_table, accepted_table
                )
        finally:
            if fresh is not None:
                fresh.unpersist()
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_neardup_index(
    target: ParquetDatabase,
    index_table: str = "__neardup_index",
    accepted_table: str = "accepted",
    keep_last: int = 2,
) -> int:
    """Fold old per-epoch partitions of :func:`streaming_neardup_ingest`'s
    tables into one base partition (``__epoch = -1``) — the maintenance
    job that keeps a long-running ingest from accumulating one tiny
    partition per trigger (a year of 1-minute triggers is ~500k
    directories; every index load lists them all).

    ``keep_last`` recent epochs stay untouched: Structured Streaming
    only ever replays the most recent uncommitted epoch, and a replayed
    epoch relies on its own partition staying separately addressable
    (the exactly-once design excludes it from the index load —
    folding it into the base would make replays self-match into data
    loss). The base partition id -1 can never collide with a real
    epoch.

    Crash-safe and idempotent: the new base is built as
    union-distinct of the current base plus the folded epochs, so a
    crash between the base write and the old-partition drops leaves
    duplicated rows that the NEXT compaction's distinct removes —
    re-run to converge. (Near-dup probes in that window stay
    correct on the near_dup flag; jaccard scores of affected corpus
    docs can transiently inflate.)

    Returns the number of epochs folded.
    """
    sh_table = f"{index_table}_shingles"
    bk_table = f"{index_table}_buckets"
    tables = [t for t in (accepted_table, sh_table, bk_table)
              if target.table_exists(t)]
    if not tables:
        return 0
    # the cutoff must be consistent across tables AND come from the
    # bucket table specifically (written last each epoch, so its max
    # epoch is the newest FULLY committed one).  If the bucket table
    # is absent (e.g. only `accepted` materialized on this target)
    # there is no committed-epoch reference — skip compaction rather
    # than cut from a table whose max epoch may be half-written.
    if bk_table not in tables:
        return 0
    ref = bk_table
    epochs = sorted(
        r[0]
        for r in target.read(ref).select("__epoch").distinct().collect()
        if r[0] is not None and r[0] >= 0
    )
    fold = epochs[:-keep_last] if keep_last > 0 else epochs
    if not fold:
        return 0
    fold_set = set(fold)
    for t in tables:
        df = target.read(t)
        base = (
            df.filter(
                (F.col("__epoch") == -1) | F.col("__epoch").isin(fold)
            )
            .withColumn("__epoch", F.lit(-1))
            .distinct()
        )
        target.replace_partitions(t, base, "__epoch")
        target.drop_partitions(t, "__epoch", sorted(fold_set))
    return len(fold)
