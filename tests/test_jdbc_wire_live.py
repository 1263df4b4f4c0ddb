"""Real java.sql wire-path test (VERDICT r3 task #4).

tests/test_postgres_live.py proves the SQL-generation and
orchestration layers against a live server via the psql transport;
this module closes the remaining gap — Spark's ACTUAL
``spark.read.format("jdbc")`` partitioned read, ``batchsize`` batched
write, and the driver-side ``java.sql`` statement path
(``JdbcDatabase._execute``) — by round-tripping through the real
PostgreSQL JDBC driver.

Everything is skipped unless BOTH are available:

- a PostgreSQL JDBC driver jar — set ``SSLR_PG_JDBC_JAR`` or drop one
  in a conventional location (``$SPARK_HOME/jars``,
  ``/usr/share/java``, ``~/.m2``). The sandbox image ships no jar and
  has no network (``pip download`` fails), so in CI here the test
  SKIPS — the constraint is documented in README "Sandbox limits".
- the embedded-postgres binaries (initdb/pg_ctl), as in
  tests/test_postgres_live.py.

The Spark work runs in a SUBPROCESS with its own SparkSession:
``spark.jars`` / ``spark.driver.extraClassPath`` must be on the JVM
command line at startup, and the suite's shared session-scoped
SparkSession was built without the driver jar (a second builder call
in-process would silently return that jarless session).

Unlike the socket-only server in test_postgres_live.py, this server
listens on 127.0.0.1: the PostgreSQL JDBC driver speaks TCP only.
"""

from __future__ import annotations

import glob
import os
import pathlib
import shutil
import subprocess
import sys

import pytest


def find_pg_jdbc_jar() -> str | None:
    """Locate a postgresql JDBC driver jar; env wins, then the
    conventional drop locations."""
    env = os.environ.get("SSLR_PG_JDBC_JAR")
    if env:
        return env if os.path.exists(env) else None
    patterns = [
        os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"),
                     "jars", "postgresql-*.jar"),
        "/usr/share/java/postgresql*.jar",
        "/usr/local/share/java/postgresql*.jar",
        os.path.expanduser("~/.m2/repository/org/postgresql/postgresql"
                           "/*/postgresql-*.jar"),
    ]
    try:
        import pyspark

        patterns.insert(0, os.path.join(
            os.path.dirname(pyspark.__file__), "jars", "postgresql-*.jar"
        ))
    except ImportError:
        pass
    for p in patterns:
        hit = sorted(glob.glob(p))
        if hit:
            return hit[-1]
    return None


JAR = find_pg_jdbc_jar()

pytestmark = pytest.mark.skipif(
    JAR is None
    or shutil.which("initdb") is None
    or shutil.which("pg_ctl") is None,
    reason="PostgreSQL JDBC jar and/or server binaries absent "
           "(set SSLR_PG_JDBC_JAR to enable the wire test)",
)


def _unshare(*cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["unshare", "--map-user=1000", "--map-group=1000", *cmd],
        capture_output=True, text=True,
    )


@pytest.fixture(scope="module")
def pg_tcp():
    """Embedded server listening on 127.0.0.1 (JDBC is TCP-only);
    same unprivileged-namespace + out-of-basetemp housekeeping as
    tests/test_postgres_live.py's socket-only fixture."""
    root = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".pgtest"
    )
    os.makedirs(root, exist_ok=True)
    port = 40000 + os.getpid() % 10000
    d = pathlib.Path(root) / f"tcp_{os.getpid()}"
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
        "-o", f"-c listen_addresses=127.0.0.1 -k {d} -p {port} -F",
        "start",
    )
    if r.returncode != 0:
        pytest.skip(f"postgres failed to start: {r.stderr.strip()[:200]}")
    try:
        r = subprocess.run(
            ["psql", "-h", "127.0.0.1", "-p", str(port), "-U", "sslr",
             "-d", "postgres", "-c", "create database wiredb"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        yield port
    finally:
        _unshare("pg_ctl", "-D", str(data), "-m", "immediate", "stop")
        shutil.rmtree(d, ignore_errors=True)


# The subprocess body: a fresh SparkSession WITH the driver jar, then
# the full wire round trip through the production JdbcDatabase (no
# transport substitution anywhere).
_WIRE_SCRIPT = r"""
import sys
jar, port = sys.argv[1], sys.argv[2]
sys.path.insert(0, sys.argv[3])
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("jdbc-wire")
    .config("spark.jars", jar)
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from sslr_spark.sources.jdbc import JdbcDatabase

url = f"jdbc:postgresql://127.0.0.1:{port}/wiredb?user=sslr"
db = JdbcDatabase(
    spark, url,
    properties={"driver": "org.postgresql.Driver"},
    num_partitions=4, batchsize=100,
)

src = spark.range(0, 1000).selectExpr(
    "id as k", "cast(id % 7 as int) as v", "repeat('x', 20) as pad"
)
# batched write path (batchsize + reWriteBatchedInserts)
db.overwrite("t_wire", src)

# range-partitioned parallel read: 4 real java.sql readers
back = db.read("t_wire", "k", 0, 1000)
assert back.rdd.getNumPartitions() == 4, back.rdd.getNumPartitions()
assert back.count() == 1000
got = back.agg({"v": "sum"}).first()[0]
want = sum(i % 7 for i in range(1000))
assert got == want, (got, want)

# probed-bounds variant (min/max pushdown subquery through the wire)
auto = db.read_auto_partitioned("t_wire", "k")
assert auto.rdd.getNumPartitions() == 4, auto.rdd.getNumPartitions()
assert auto.count() == 1000

# driver-side java.sql statement path: chunked DELETE
keys = spark.range(0, 100).selectExpr("id as k")
db.delete_keys("t_wire", keys, ["k"])
assert db.read("t_wire").count() == 900

# upsert apply (DELETE+INSERT transaction shape) through the wire
ups = spark.range(50, 150).selectExpr(
    "id as k", "cast(999 as int) as v", "'u' as pad"
)
db.apply_upsert("t_wire", ups, ["k"])
t = db.read("t_wire")
# 900 survivors + 50 new inserts (k 50..99); k 100..149 updated in place
assert t.count() == 950, t.count()
n999 = t.filter("v = 999").count()
assert n999 == 100, n999
print("WIRE-OK")
"""


def test_jdbc_wire_roundtrip(pg_tcp):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _WIRE_SCRIPT, JAR, str(pg_tcp), repo],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "WIRE-OK" in r.stdout
