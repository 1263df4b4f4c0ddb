from __future__ import annotations

import pytest

from sslr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sslr_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def source_db(spark, tmp_path):
    from sslr_spark.sources.parquet import ParquetDatabase

    return ParquetDatabase(spark, str(tmp_path / "source"))


@pytest.fixture()
def target_db(spark, tmp_path):
    from sslr_spark.sources.parquet import ParquetDatabase

    return ParquetDatabase(spark, str(tmp_path / "target"))


def make_timestamps(spark, n=1000, xmin_of=lambda i: 1 + i // 10):
    """FIXTURES.md 'timestamps' table: int PK + ts payload + xmin."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i), xmin_of(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema="id long, ts timestamp, xmin long")


def assert_df_equal(a, b, keys):
    """Order-insensitive DataFrame equality on all columns."""
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    ra = sorted(a.select(*cols).collect(), key=lambda r: tuple(str(r[k]) for k in keys))
    rb = sorted(b.select(*cols).collect(), key=lambda r: tuple(str(r[k]) for k in keys))
    assert ra == rb
