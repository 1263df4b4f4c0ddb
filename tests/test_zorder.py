"""Morton/Z-order clustering expression tests (functions/zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sslr_spark.functions.zorder import morton_code


def _interleave2(x: int, y: int, bits: int) -> int:
    code = 0
    for b in range(bits):
        code |= ((x >> b) & 1) << (2 * b)
        code |= ((y >> b) & 1) << (2 * b + 1)
    return code


def test_morton_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    out = df.withColumn("z", morton_code(df, ["x", "y"], bits=2)).collect()
    for r in out:
        assert r["z"] == _interleave2(r["x"], r["y"], 2), (r["x"], r["y"])


def test_morton_locality_bounds_both_dimensions(spark):
    """Sorting by the Z-code must keep consecutive chunks local in
    EVERY participating dimension — the property single-column sorts
    lack (x-sorted chunks span the full y range)."""
    n = 64
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    ).cache()
    z = df.withColumn("z", morton_code(df, ["x", "y"], bits=6))
    chunked = z.withColumn(
        "chunk",
        F.ntile(16).over(__import__("pyspark").sql.Window.orderBy("z")),
    )
    spans = chunked.groupBy("chunk").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
    )
    for r in spans.collect():
        # 16 z-chunks of a 64x64 grid tile into 16x16..32x32 regions;
        # a one-column sort would give sy == 63 for every chunk
        assert r["sx"] <= 32 and r["sy"] <= 32, r
    df.unpersist()


def test_morton_nulls_and_degenerate_ranges(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (7, 5)], "x int, y int"
    )
    out = df.withColumn("z", morton_code(df, ["x", "y"], bits=4)).collect()
    zs = {r["x"]: r["z"] for r in out}
    # null x sorts with rank 0; constant y contributes 0 everywhere
    assert zs[None] == 0
    assert zs[None] <= zs[3] <= zs[7]


def test_morton_rejects_oversized_keys(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(ValueError, match="exceeds long range"):
        morton_code(df, ["a", "b", "c"], bits=21)


def test_zorder_column_works_as_writer_sort(spark, target_db):
    """The Z-code Column feeds straight into the partitioned writers'
    sort_cols (compaction Z-clusters during maintenance)."""
    from sslr_spark.operators.deletes import BUCKET_COL, with_bucket

    df = with_bucket(
        spark.createDataFrame(
            [(i, i % 50, i // 50) for i in range(2500)],
            "id long, x int, y int",
        ),
        ["id"],
        4,
    )
    target_db.overwrite_partitioned(
        "t", df, BUCKET_COL, n_buckets=4,
        sort_cols=[morton_code(df, ["x", "y"], bits=8)],
    )
    got = target_db.read("t")
    assert got.count() == 2500
    assert set(got.columns) == {"id", "x", "y"}


def test_morton_nan_rows_do_not_poison_the_range(spark):
    """One NaN in a float column must neither become the max (which
    would collapse every rank to the top constant) nor rank top
    itself — NaNs go to rank 0 with the nulls."""
    df = spark.createDataFrame(
        [(float("nan"), 0), (0.0, 0), (50.0, 0), (100.0, 0)],
        "x double, y int",
    )
    out = {r["x"]: r["z"] for r in df.withColumn(
        "z", morton_code(df, ["x"], bits=8)
    ).collect() if r["x"] == r["x"]}
    nan_z = [r["z"] for r in df.withColumn(
        "z", morton_code(df, ["x"], bits=8)
    ).collect() if r["x"] != r["x"]][0]
    # real values keep a discriminating range...
    assert out[0.0] == 0 and out[100.0] == 255 and 0 < out[50.0] < 255
    # ...and the NaN row sits at rank 0, not at the top
    assert nan_z == 0
