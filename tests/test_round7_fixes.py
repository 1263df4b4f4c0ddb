"""Regression tests for the round-6 advice findings: resize_media
pass-through for unsupported BMP variants, top-down (negative-height)
BMP row-order preservation, keep_fraction validation, curation
key_column threading, and job-group save/restore in the copy
progress reporter.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from sslr_spark.functions.multimodal import (
    make_bmp,
    parse_bmp,
    resize_bmp,
    resize_media,
)


def _bmp_24(width: int, height: int, *, top_down: bool = False) -> bytes:
    """A 24-bit BMP whose pixel rows carry a recognizable per-row
    value (blue channel = visual row index), bottom-up or top-down."""
    stride = ((width * 3 + 3) // 4) * 4
    rows = []
    for visual_row in range(height):  # visual_row 0 = top of image
        px = bytes([visual_row % 256, 0, 0] * width)
        rows.append(px + bytes(stride - width * 3))
    # bottom-up files store the bottom visual row first
    ordered = rows if top_down else rows[::-1]
    data = b"".join(ordered)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    h_field = -height if top_down else height
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return header + dib + data


def _bmp_core_header(width: int, height: int) -> bytes:
    """Ancient BITMAPCOREHEADER (12-byte DIB) 24-bit BMP."""
    stride = ((width * 3 + 3) // 4) * 4
    data = bytes(stride * height)
    header = b"BM" + struct.pack("<IHHI", 26 + len(data), 0, 0, 26)
    dib = struct.pack("<IHHHH", 12, width, height, 1, 24)
    return header + dib + data


def _bmp_with_bpp(width: int, height: int, bpp: int) -> bytes:
    """BITMAPINFOHEADER BMP with a non-24 bpp (pixel data zeroed,
    sized for the declared bpp)."""
    stride = ((width * bpp // 8 + 3) // 4) * 4
    data = bytes(stride * height)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(data),
        2835, 2835, 0, 0,
    )
    return header + dib + data


def test_resize_bmp_top_down_preserves_image():
    """A top-down BMP and its bottom-up twin encode the SAME image;
    resizing either must produce byte-identical (bottom-up) output —
    the old code silently flipped top-down sources."""
    up = _bmp_24(6, 8, top_down=False)
    down = _bmp_24(6, 8, top_down=True)
    assert parse_bmp(up) == parse_bmp(down) == (6, 8)
    assert resize_bmp(up, 3, 4) == resize_bmp(down, 3, 4)


def test_resize_bmp_rejects_unsupported_variants():
    with pytest.raises(ValueError, match="24-bit"):
        resize_bmp(_bmp_with_bpp(4, 4, 32), 2, 2)
    with pytest.raises(ValueError, match="24-bit"):
        resize_bmp(_bmp_with_bpp(4, 4, 8), 2, 2)
    with pytest.raises(ValueError, match="DIB header"):
        resize_bmp(_bmp_core_header(4, 4), 2, 2)
    with pytest.raises(ValueError, match="truncated"):
        resize_bmp(_bmp_24(8, 8)[:80], 4, 4)  # parses, pixels cut off
    with pytest.raises(ValueError):
        resize_bmp(b"BM" + bytes(20), 2, 2)  # truncated header


def test_resize_media_passes_unsupported_bmps_through(spark):
    """resize_media's contract: non-matching payloads pass through
    untouched — including BMP VARIANTS the resampler rejects (32-bpp,
    core-header, truncated), which previously crashed the job."""
    payloads = [
        (1, _bmp_with_bpp(4, 4, 32)),
        (2, _bmp_core_header(4, 4)),
        (3, _bmp_24(8, 8)[:80]),
        (4, b"RIFFxxxxWAVEnot-an-image"),
        (5, make_bmp(8, 6)),  # supported: must actually resize
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_media(df, 1, 2).collect()
    }
    for doc_id, original in payloads[:4]:
        assert out[doc_id] == original, f"doc {doc_id} was modified"
    assert parse_bmp(out[5]) == (4, 3)


def test_quality_gate_validates_keep_fraction(spark):
    from sslr_spark.functions.quality_model import quality_quantile_gate

    df = spark.createDataFrame(
        [(1, "hello world", "en")], "doc_id long, text string, lang string"
    )
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="keep_fraction"):
            quality_quantile_gate(
                df, bad, weights=[0.1, 0.1, 0.1, 0.1], bias=0.0
            )


def test_curation_config_validates_keep_fraction(tmp_path):
    from sslr_spark.config import ConfigError
    from sslr_spark.curation import load_curation_config

    base = {
        "source": "/s",
        "output": "/o",
        "qualityWeights": [0.1, 0.1, 0.1, 0.1],
    }
    import json

    for bad in (0.0, -1.0, 1.5):
        with pytest.raises(ConfigError, match="keepFraction"):
            load_curation_config(json.dumps({**base, "keepFraction": bad}))


def test_curation_threads_key_column(spark):
    """keyColumn other than doc_id now works end-to-end (it previously
    failed with AnalysisException at the first stage)."""
    from sslr_spark.curation import curate_documents

    rows = [
        (
            i,
            " ".join(
                f"the word{i}x{j} is in a fine text and it was here"
                for j in range(12)
            ),
            "en",
            "web",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "item_key long, text string, lang string, source string"
    )
    res = curate_documents(
        df,
        quality_weights=[0.01, 0.01, 0.5, 0.05],
        quality_bias=-0.5,
        keep_fraction=0.5,
        n_shards=4,
        key_col="item_key",
    )
    got = res.df.collect()
    assert got and "item_key" in res.df.columns
    assert "doc_id" not in res.df.columns

    # a conflicting pre-existing doc_id column is rejected loudly
    with pytest.raises(ValueError, match="conflicts"):
        curate_documents(
            df.withColumn("doc_id", F.col("item_key")),
            quality_weights=[0.01, 0.01, 0.5, 0.05],
            quality_bias=-0.5,
            key_col="item_key",
        )


def test_copy_reporter_restores_job_group(spark):
    from sslr_spark.operators.copy import CopyProgressReporter

    sc = spark.sparkContext
    sc.setJobGroup("caller_group", "caller work")
    try:
        with CopyProgressReporter(spark, expected_rows=100, table="t"):
            assert sc.getLocalProperty("spark.jobGroup.id") != "caller_group"
        assert sc.getLocalProperty("spark.jobGroup.id") == "caller_group"
    finally:
        sc.setJobGroup("", "")
