"""CLI entry-point and JDBC option-assembly tests (no database
required — the JDBC adapter's option construction is pure)."""

from __future__ import annotations

import json


def test_cli_run_once(spark, tmp_path, capsys):
    import datetime

    from sslr_spark.__main__ import main
    from sslr_spark.sources.parquet import ParquetDatabase

    src = ParquetDatabase(spark, str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1), 1) for i in range(50)],
        "id long, ts timestamp, xmin long",
    )
    src.overwrite("timestamps", df)
    cfg = tmp_path / "sslr.json"
    cfg.write_text(
        json.dumps(
            {
                "source": str(tmp_path / "s"),
                "target": str(tmp_path / "t"),
                "sourceTables": ["timestamps"],
                "primaryKeys": {"timestamps": ["id"]},
            }
        )
    )
    assert main(["-cfg", str(cfg)]) == 0
    assert "50 rows updated" in capsys.readouterr().out


def test_cli_sigterm_drains_and_exits_2(spark, tmp_path):
    """SIGTERM mid-continuous-run (reference main.go:66-73): the loop
    finishes the in-flight pass — the watermark lands committed, the
    target matches the source — and exits with code 2. The OS
    delivers a real SIGTERM to the process; the handler routes it to
    job.stop() like the reference's context cancel."""
    import datetime
    import os
    import signal
    import threading

    from sslr_spark.__main__ import main
    from sslr_spark.sources.parquet import ParquetDatabase
    from sslr_spark.state import StateStore

    src = ParquetDatabase(spark, str(tmp_path / "s"))
    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1), 7) for i in range(80)],
        "id long, ts timestamp, xmin long",
    )
    src.overwrite("timestamps", df)
    cfg = tmp_path / "sslr.json"
    cfg.write_text(
        json.dumps(
            {
                "source": str(tmp_path / "s"),
                "target": str(tmp_path / "t"),
                "sourceTables": ["timestamps"],
                "primaryKeys": {"timestamps": ["id"]},
                "waitBetweenJobs": 120,  # SIGTERM must cut this short
            }
        )
    )
    timer = threading.Timer(
        3.0, lambda: os.kill(os.getpid(), signal.SIGTERM)
    )
    timer.start()
    try:
        rc = main(["-cfg", str(cfg), "-c"])
    finally:
        timer.cancel()
    assert rc == 2
    target = ParquetDatabase(spark, str(tmp_path / "t"))
    assert target.table_rows("timestamps") == 80  # pass completed
    assert StateStore(target).get("timestamps").last_seen_version == 7
    # the previous SIGTERM disposition was restored on the way out
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_cli_config_error_exit_code(tmp_path, capsys):
    from sslr_spark.__main__ import main

    bad = tmp_path / "bad.json"
    bad.write_text('{"source": "/s", "target": "/t", "bogus": 1}')
    assert main(["-cfg", str(bad)]) == 3
    assert main(["-cfg", str(tmp_path / "missing.json")]) == 3


def test_jdbc_option_assembly(spark):
    from sslr_spark.sources.jdbc import JdbcDatabase

    db = JdbcDatabase(
        spark,
        url="jdbc:postgresql://host/db",
        properties={"user": "u"},
        fetchsize=5000,
        num_partitions=16,
        expose_xmin=True,
    )
    opts = db.read_options(
        "public.orders", partition_column="o_orderkey", lower_bound=0, upper_bound=99
    )
    # xmin surfaced exactly the way the reference casts it
    assert opts["dbtable"] == (
        "(select xmin::text::bigint as xmin, t.* from public.orders t) q"
    )
    assert opts["fetchsize"] == "5000"
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "16"
    w = db.write_options("public.orders")
    assert w["reWriteBatchedInserts"] == "true"
    assert w["batchsize"] == "10000"

    plain = JdbcDatabase(spark, url="jdbc:x").read_options("t1")
    assert plain["dbtable"] == "t1" and "partitionColumn" not in plain
