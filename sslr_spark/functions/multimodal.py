"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode itself is a
clearly-marked deterministic STUB — but everything Spark-side is real
and tested: the binary column representation, the output schema, the
mapInPandas batch shape, and the partitioning story (decode is
embarrassingly parallel; batches stream through Arrow without
driver involvement).

Swap `_decode_stub` for a real decoder (PIL/ffmpeg) and nothing else
changes — that is the point of the plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_fp", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload as an opaque binary column
    (here derived from text since the synthetic data has no media) plus
    typed metadata the pipeline carries alongside."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decode — deterministic fake dimensions derived from the
    content hash. A real deployment decodes with PIL/ffmpeg here;
    the container ships no codecs (NotImplementedError territory per
    the build contract), so we return a reproducible fake so the
    Spark-side plumbing stays testable end-to-end."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 30
    return width, height, n_frames


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas streams record batches through
    Python; per batch we emit metadata rows. No collect, no per-row
    UDF serde — the batch shape is what a real image decode needs."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_fp": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return binary_df.mapInPandas(decode_batches, DECODE_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(binary_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction plumbing: binary payload -> fixed-dim float
    vector via Arrow-batched mapInPandas. STUB featurizer (md5-derived
    deterministic values in [-1, 1]); a real deployment runs an image/
    audio encoder here with identical plumbing. Output feeds directly
    into the similarity/dedup operators (same array<float> shape as the
    embeddings table)."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                # stretch 16 md5 bytes deterministically to `dim` floats
                vals = [
                    (h[i % 16] ^ (i * 37 & 0xFF)) / 127.5 - 1.0 for i in range(dim)
                ]
                feats.append(np.asarray(vals, dtype="float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return binary_df.mapInPandas(feat, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def sample_frames(binary_df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: one output
    row per sampled frame (every ``every_n``-th of the payload's
    n_frames). The decode is the same STUB as decode_metadata; the
    Spark-side shape — batch in, multiple rows out per input row — is
    exactly what real frame extraction needs."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, fps = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                _, _, n_frames = _decode_stub(payload)
                for i in range(0, n_frames, every_n):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    # stub frame fingerprint: payload + ':' + ascii
                    # index (not packed binary) so the exact formula
                    # is SQL-reproducible and the driver hash-checks
                    # this Python stage end-to-end; a real deployment
                    # replaces this whole function body with ffmpeg
                    fps.append(
                        hashlib.md5(
                            payload + b":" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_fp": fps}
            )

    return binary_df.mapInPandas(frames, FRAME_SCHEMA)


def binary_meta(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-SQL binary metadata (no Python): byte length, content hash,
    leading-bytes 'magic number' hex — the cheap pre-decode triage
    columns a media pipeline filters on before spending decode cost."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_fp"),
        F.lower(F.hex(F.substring(F.col(text_col), 1, 4).cast("binary"))).alias(
            "magic_hex"
        ),
    )
