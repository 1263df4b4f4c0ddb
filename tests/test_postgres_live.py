"""Live-PostgreSQL integration tests (VERDICT r2 task #3).

The reference verifies its adapter against a dockerized Postgres
(reference docker-compose.yml:1-15, docker-init.sql:1-11). Here an
embedded server (initdb + pg_ctl on a unix socket under the pytest
basetemp) plays that role, and :class:`PsqlDatabase` — the production
:class:`JdbcDatabase` with only its transport swapped for the psql CLI
— runs every SQL-generation and orchestration line against it:

- pg_catalog schema/index extraction (the verbatim-shaped catalog SQL
  in sources/ddl.py:88-160, never before executed on a real server),
- DDL mirroring including ``create index concurrently``, which cannot
  run inside a transaction block — proving the one-statement-per-
  round-trip autocommit semantics the java.sql path relies on,
- the REAL ``xmin`` system column driving incremental CDC end-to-end
  (postgres -> parquet), and the in-place DELETE+COPY apply
  (parquet -> postgres).

initdb refuses to run as uid 0, so server processes run inside an
unprivileged user namespace (``unshare --map-user``) where root maps
to an ordinary uid; everything is skipped when the binaries or user
namespaces are unavailable.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal, make_timestamps

pytestmark = pytest.mark.skipif(
    shutil.which("initdb") is None
    or shutil.which("pg_ctl") is None
    or shutil.which("psql") is None,
    reason="PostgreSQL server binaries not installed",
)


def _unshare(*cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["unshare", "--map-user=1000", "--map-group=1000", *cmd],
        capture_output=True, text=True,
    )


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    """An embedded live server; yields (socket_dir, port, user).

    The server lives OUTSIDE pytest's basetemp: pytest clears
    ``--basetemp`` at session startup, so any concurrent or subsequent
    pytest session would delete a basetemp-housed server's socket and
    data directory out from under the running daemon (observed: the
    suite's own 5th test losing its server to a parallel run). Instead
    each session gets ``.pgtest/<pid>/`` with a pid-derived port;
    stale instances from killed runs are reaped on entry (their pid is
    gone) and the whole directory is removed on teardown."""
    import os
    import signal

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".pgtest")
    os.makedirs(root, exist_ok=True)
    # reap leftovers of dead sessions (a killed run never tears down)
    for stale in os.listdir(root):
        p = os.path.join(root, stale)
        try:
            pid = int(stale)
        except ValueError:
            continue
        try:
            os.kill(pid, 0)  # still alive -> leave its server alone
        except ProcessLookupError:
            pidfile = os.path.join(p, "data", "postmaster.pid")
            if os.path.exists(pidfile):
                with open(pidfile) as fh:
                    try:
                        os.kill(int(fh.readline().strip()), signal.SIGQUIT)
                    except (ValueError, ProcessLookupError):
                        pass
            shutil.rmtree(p, ignore_errors=True)

    port = 50000 + os.getpid() % 10000
    import pathlib

    d = pathlib.Path(root) / str(os.getpid())
    d.mkdir(exist_ok=True)
    data = d / "data"
    r = _unshare(
        "initdb", "-D", str(data), "-A", "trust", "-U", "sslr",
        "--no-sync", "-E", "UTF8",
    )
    if r.returncode != 0:
        pytest.skip(f"initdb unavailable here: {r.stderr.strip()[:200]}")
    r = _unshare(
        "pg_ctl", "-D", str(data), "-w", "-t", "60",
        "-l", str(d / "pg.log"),
        "-o", f"-c listen_addresses='' -k {d} -p {port} -F",
        "start",
    )
    if r.returncode != 0:
        pytest.skip(f"postgres failed to start: {r.stderr.strip()[:200]}")
    try:
        yield str(d), port, "sslr"
    finally:
        _unshare("pg_ctl", "-D", str(data), "-m", "immediate", "stop")
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def pg_db(pg, spark, request):
    """A fresh database per test on the shared server."""
    sockdir, port, user = pg
    from sslr_spark.sources.pgcli import PsqlDatabase

    name = f"db_{request.node.name[:40].lower()}"
    subprocess.run(
        ["psql", "-h", sockdir, "-p", str(port), "-U", user,
         "-d", "postgres", "-c", f"drop database if exists {name}"],
        capture_output=True, text=True,
    )
    r = subprocess.run(
        ["psql", "-h", sockdir, "-p", str(port), "-U", user,
         "-d", "postgres", "-c", f"create database {name}"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    def mk(**kw):
        return PsqlDatabase(spark, sockdir, name, port=port, user=user, **kw)

    return mk


# -- transport round trip ----------------------------------------------

def test_copy_roundtrip_hostile_values(pg_db, spark):
    """COPY text-format escaping survives the values that break naive
    renderers: quotes, backslashes, tabs, newlines, unicode, bytes,
    inf/nan, nulls."""
    import datetime

    db = pg_db()
    rows = [
        (1, "plain", b"\x00\xff", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5), True),
        (2, "it's \"quoted\"", b"", float("inf"), None, False),
        (3, "back\\slash\ttab\nnewline", None, float("nan"), None, None),
        (4, "naïve–déjà☃", b"\x01", -0.0, datetime.datetime(1999, 12, 31), True),
        (5, None, None, None, None, None),
        (6, "\\N", None, 2.0, None, False),  # literal backslash-N is DATA
    ]
    df = spark.createDataFrame(
        rows, "id int, s string, b binary, f double, ts timestamp, ok boolean"
    )
    db.overwrite("t1", df)
    got = db.read("t1")
    # NaN equality: compare via isnan flags, then null out
    fix = lambda d: d.withColumn(  # noqa: E731
        "f", F.when(F.isnan("f"), None).otherwise(F.col("f"))
    )
    assert_df_equal(fix(got), fix(df), ["id"])
    assert db.table_exists("t1") and not db.table_exists("nope")


def test_chunked_delete_literals_live(pg_db, spark):
    """sql_literal-rendered composite-key DELETEs execute on a real
    server with hostile key values (reference deleteRows,
    internal/deletes.go:207-235)."""
    db = pg_db(delete_key_chunk=2)  # force multiple chunks
    rows = [(i, k) for i, k in enumerate(
        ["a", "it's", "back\\slash", "semi;colon", "naïve", "keep1", "keep2"]
    )]
    df = spark.createDataFrame(rows, "id int, k string")
    db.overwrite("t2", df)
    doomed = spark.createDataFrame(rows[:5], "id int, k string")
    db.delete_keys("t2", doomed, ["id", "k"])
    left = {r.k for r in db.read("t2").collect()}
    assert left == {"keep1", "keep2"}


# -- catalog extraction + DDL mirroring (S6/S8/A5/A6/J5 live) ----------

def test_pg_catalog_extraction_and_mirror(pg_db):
    """The pg_catalog queries (sources/ddl.py:88-160, reference
    internal/schemas.go:95-173) run verbatim on a live server; the
    extracted DDL recreates the table, and apply_indices replays a
    CREATE INDEX CONCURRENTLY — which refuses to run inside a
    transaction block, so this also proves the transport's autocommit
    statement semantics (VERDICT r2: 'unproven against a live
    server')."""
    db = pg_db()
    db._execute(
        "create table public.src (id bigint not null, ver bigint, "
        "name text, primary key (id, name))"
    )
    db._execute("create index src_ver_idx on public.src (ver, id)")

    ddl = db.extract_table_schema("public.src")
    assert ddl and "create table" in ddl.lower()
    for frag in ("id bigint not null", "ver bigint", "name text"):
        assert frag in ddl.lower()

    idx = db.extract_table_indices("public.src")
    by_name = {i.index_name: i for i in idx}
    assert any(i.primary for i in idx)
    # A6: key order must follow indkey POSITION, not attnum order
    assert by_name["src_ver_idx"].columns == ["ver", "id"]

    # mirror into a separate schema: index names are unique per
    # schema, and `if not exists` would silently skip a same-schema
    # name clash (production targets are separate databases)
    mirrored = ddl.replace("public.src", "mirror.dst")
    db.create_table("mirror.dst", mirrored)
    db.apply_indices(
        "mirror.dst", [i for i in idx if not i.primary]
    )  # create index concurrently — would fail inside a txn block
    dst_idx = db.extract_table_indices("mirror.dst")
    assert {tuple(i.columns) for i in dst_idx} >= {("ver", "id")}


# -- end-to-end Job runs -----------------------------------------------

def _cfg(source, target, **kw):
    from sslr_spark.config import Config

    return Config(
        source=source, target=target, source_tables=["timestamps"],
        primary_keys={"timestamps": ["id"]}, **kw,
    )


@pytest.mark.slow
def test_job_postgres_to_parquet_real_xmin_cdc(pg_db, spark, tmp_path):
    """Full copy then REAL-xmin incremental: the UPDATE's new
    transaction id — not a synthetic version column — is what the
    second run's watermark scan picks up (reference
    internal/updates.go:44,94)."""
    from sslr_spark.job import Job

    src = pg_db(expose_xmin=True)
    src._execute("create table timestamps (id bigint primary key, ts timestamp)")
    src._execute(
        "insert into timestamps select g, timestamp '2024-01-01' + "
        "g * interval '1 minute' from generate_series(0, 99) g"
    )
    cfg = _cfg("postgres://live/sslr", str(tmp_path), target_buckets=4)
    job = Job(spark, cfg, source_db=src, target_db=None)
    r1 = job.run()
    assert r1.updated_rows == 100
    assert_df_equal(
        job.target.read("timestamps").drop("xmin"),
        src.read("timestamps").drop("xmin"),
        ["id"],
    )
    w1 = job.state.get("timestamps").last_seen_version

    # mutate: 3 updates + 2 inserts + 1 delete, all in new transactions
    src._execute("update timestamps set ts = timestamp '2030-01-01' where id < 3")
    src._execute(
        "insert into timestamps values (100, timestamp '2030-01-02'),"
        " (101, timestamp '2030-01-03')"
    )
    src._execute("delete from timestamps where id = 50")

    job2 = Job(spark, cfg, source_db=pg_db(expose_xmin=True), target_db=None)
    r2 = job2.run()
    assert 0 < r2.updated_rows <= 5  # the changed slice, not a recopy
    assert not r2.full_copies and r2.repaired_buckets >= 1
    assert job2.state.get("timestamps").last_seen_version > w1
    assert_df_equal(
        job2.target.read("timestamps").drop("xmin"),
        src.read("timestamps").drop("xmin"),
        ["id"],
    )


@pytest.mark.slow
def test_job_parquet_to_postgres_in_place_apply(pg_db, spark, tmp_path):
    """Target side live: mirrored DDL + pk index bootstrap the table,
    the full copy COPYes rows in, and the incremental run applies
    in-place (chunked DELETE + COPY append) and repairs deletes —
    the reference's J2/D1 transactions (internal/updates.go:171-222,
    internal/deletes.go:166-235)."""
    from sslr_spark.job import Job
    from sslr_spark.sources.parquet import ParquetDatabase

    src = ParquetDatabase(spark, str(tmp_path / "src"))
    data = make_timestamps(spark, 300)
    src.overwrite("timestamps", data)
    tgt = pg_db()
    cfg = _cfg(str(tmp_path / "src"), "postgres://live/tgt")
    job = Job(spark, cfg, source_db=src, target_db=tgt)
    r1 = job.run()
    assert r1.updated_rows == 300
    # xmin is stripped on in-place targets (internal/updates.go:117-124)
    assert set(tgt.read("timestamps").columns) == {"id", "ts"}
    assert_df_equal(tgt.read("timestamps"), data.drop("xmin"), ["id"])

    # update 5, insert 3, delete 4 in the parquet source
    import datetime

    nts = datetime.datetime(2031, 5, 5)
    upd = spark.createDataFrame(
        [(i, nts, 900) for i in range(5)]
        + [(i, nts, 901) for i in range(300, 303)],
        "id long, ts timestamp, xmin long",
    )
    data2 = (
        data.filter(~F.col("id").isin([0, 1, 2, 3, 4, 60, 61, 62, 63]))
        .unionByName(upd)
    )
    src.overwrite("timestamps", data2)
    job2 = Job(spark, cfg, source_db=src, target_db=tgt)
    r2 = job2.run()
    assert r2.updated_rows == 8 and not r2.full_copies
    assert_df_equal(tgt.read("timestamps"), data2.drop("xmin"), ["id"])


@pytest.mark.slow
def test_job_postgres_to_postgres_live(pg_db, spark):
    """The reference's actual deployment shape — Postgres source AND
    Postgres target on one server (separate databases via separate
    schemas is the docker harness's layout; here two databases): real
    xmin CDC on the source, mirrored DDL + in-place DELETE+COPY apply
    on the target (reference internal/job.go:81-92)."""
    from sslr_spark.job import Job

    src = pg_db(expose_xmin=True)
    src._execute(
        "create table timestamps (id bigint primary key, ts timestamp)"
    )
    src._execute(
        "insert into timestamps select g, timestamp '2024-01-01' + "
        "g * interval '1 hour' from generate_series(0, 49) g"
    )
    # target = second database on the same server
    tgt = pg_db(expose_xmin=False)
    tgt_name = tgt.dbname + "_tgt"
    import subprocess

    subprocess.run(
        ["psql", "-h", tgt.host, "-p", str(tgt.port), "-U", tgt.user,
         "-d", "postgres", "-c", f"create database {tgt_name}"],
        capture_output=True, text=True,
    )
    from sslr_spark.sources.pgcli import PsqlDatabase

    tgt = PsqlDatabase(
        spark, tgt.host, tgt_name, port=tgt.port, user=tgt.user
    )
    cfg = _cfg("postgres://live/src", "postgres://live/tgt")
    job = Job(spark, cfg, source_db=src, target_db=tgt)
    r1 = job.run()
    assert r1.updated_rows == 50
    # DDL mirroring carried the key index across (as an index, same
    # as the reference's applyIndices — primary-KEY-ness itself
    # travels only when the extracted create-table DDL carries it)
    idx = tgt.extract_table_indices("timestamps")
    assert any(i.columns == ["id"] for i in idx), idx

    src._execute("update timestamps set ts = timestamp '2031-01-01' where id in (7, 9)")
    src._execute("delete from timestamps where id = 11")
    job2 = Job(spark, cfg, source_db=pg_db(expose_xmin=True), target_db=tgt)
    r2 = job2.run()
    assert 0 < r2.updated_rows <= 2 and not r2.full_copies
    assert_df_equal(
        tgt.read("timestamps"), src.read("timestamps").drop("xmin"), ["id"]
    )


def test_job_live_schema_drift_resync(pg_db, spark, tmp_path):
    """Live drift: a column added on the Postgres source must abort by
    default (SchemaMismatch) and, with resyncOnSchemaChange, drop +
    recreate the target and force a full resync (reference
    internal/schemas.go:227-239, job.go validation)."""
    import pytest as _pytest

    from sslr_spark.catalog import SchemaMismatch
    from sslr_spark.job import Job

    src = pg_db(expose_xmin=True)
    src._execute("create table timestamps (id bigint primary key, ts timestamp)")
    src._execute(
        "insert into timestamps select g, timestamp '2024-01-01' from "
        "generate_series(0, 19) g"
    )
    cfg = _cfg("postgres://live/src", str(tmp_path), target_buckets=0)
    Job(spark, cfg, source_db=src, target_db=None).run()

    src._execute("alter table timestamps add column note text default 'x'")
    with _pytest.raises(SchemaMismatch):
        Job(spark, cfg, source_db=pg_db(expose_xmin=True), target_db=None).run()

    cfg2 = _cfg(
        "postgres://live/src", str(tmp_path), target_buckets=0,
        resync_on_schema_change=True,
    )
    job3 = Job(spark, cfg2, source_db=pg_db(expose_xmin=True), target_db=None)
    r = job3.run()
    assert r.full_copies == ["timestamps"]
    got = job3.target.read("timestamps")
    assert "note" in got.columns and got.count() == 20


def test_copy_roundtrip_empty_string_rows(pg_db, spark):
    """A single-text-column row holding '' comes back as an EMPTY
    LINE in COPY output — the reader must keep it (a naive
    skip-empty-lines loop silently drops such rows)."""
    db = pg_db()
    df = spark.createDataFrame([("",), ("x",), (None,)], "s string")
    db.overwrite("t_empty", df)
    got = sorted(
        (r.s for r in db.read("t_empty").collect()),
        key=lambda v: (v is None, v),
    )
    assert got == ["", "x", None]


def test_streaming_sync_into_live_postgres(pg_db, spark, tmp_path):
    """Structured Streaming micro-batches applied IN-PLACE to a live
    Postgres target via foreachBatch + DELETE/COPY — the streaming
    analog of the reference's poll loop, with the stream checkpoint
    playing the watermark's role (T1/T6)."""
    import time

    from pyspark.sql import types as T

    from sslr_spark.streaming.pipeline import stream_incremental_sync

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("xmin", T.LongType()),
        ]
    )
    spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(50)], schema
    ).write.parquet(str(src_dir / "batch1"))

    tgt = pg_db()
    q = stream_incremental_sync(
        spark, str(src_dir / "*"), schema, tgt, "stream_t", ["id"],
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=None,
    )
    q.awaitTermination(120)  # availableNow: drains and stops
    assert {r.id for r in tgt.read("stream_t").collect()} == set(range(50))
    assert "xmin" not in tgt.read("stream_t").columns

    # second batch: 5 updates + 5 inserts, re-run availableNow
    spark.createDataFrame(
        [(i, "upd", 2) for i in range(5)]
        + [(i, f"v{i}", 2) for i in range(50, 55)],
        schema,
    ).write.parquet(str(src_dir / "batch2"))
    q2 = stream_incremental_sync(
        spark, str(src_dir / "*"), schema, tgt, "stream_t", ["id"],
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=None,
    )
    q2.awaitTermination(120)
    got = {r.id: r.v for r in tgt.read("stream_t").collect()}
    assert len(got) == 55 and got[0] == "upd" and got[54] == "v54"
