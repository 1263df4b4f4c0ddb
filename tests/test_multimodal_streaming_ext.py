"""Tests: multimodal feature/frame plumbing and the stateful
streaming first-seen (exact-dedup) operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_feature_extraction_shape_and_determinism(spark):
    from sslr_spark.functions.multimodal import (
        extract_features,
        with_binary_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = extract_features(with_binary_payload(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r.feature) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows[:20] for v in r.feature)
    again = {r.doc_id: r.feature for r in feats.collect()}
    assert all(again[r.doc_id] == r.feature for r in rows)

    # extracted features plug straight into the similarity operators
    from sslr_spark.functions.similarity import cosine_expr

    a, b = feats.alias("a"), feats.alias("b")
    sims = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(cosine_expr("a.feature", "b.feature").alias("cos"))
        .limit(50)
        .collect()
    )
    assert all(-1.0001 <= r.cos <= 1.0001 for r in sims)


def test_frame_sampling(spark):
    from sslr_spark.functions.multimodal import (
        decode_metadata,
        sample_frames,
        with_binary_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    binary = with_binary_payload(docs)
    meta = {r.doc_id: r.n_frames for r in decode_metadata(binary).collect()}
    frames = sample_frames(binary, every_n=2).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        expect = list(range(0, meta[doc_id], 2))
        assert sorted(idxs) == expect
    # frame fingerprints unique per (doc, frame)
    assert len({(r.doc_id, r.frame_fp) for r in frames}) == len(frames)


def test_streaming_first_seen_dedup(spark, tmp_path):
    from sslr_spark.streaming.pipeline import streaming_first_seen

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    wave1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "key string, xmin long"
    )
    wave1.write.mode("append").parquet(src_dir)

    def run_wave(qname):
        # memory sink can't resume a checkpoint; collect via foreachBatch
        emitted: list = []
        stream = spark.readStream.schema("key string, xmin long").parquet(src_dir)
        q = (
            streaming_first_seen(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _eid: emitted.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.key: r.first_version for r in emitted}

    out1 = run_wave("fs1")
    assert out1 == {"a": 1, "b": 3}

    # wave 2: duplicate of 'a' plus brand-new 'c' — only 'c' may pass
    spark.createDataFrame([("a", 9), ("c", 10)], "key string, xmin long").write.mode(
        "append"
    ).parquet(src_dir)
    out2 = run_wave("fs2")
    assert out2 == {"c": 10}
