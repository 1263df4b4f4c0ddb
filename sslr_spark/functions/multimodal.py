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
