"""psql-CLI transport for the JDBC adapter — a driver-side fallback
that talks to a live PostgreSQL through the ``psql`` binary instead of
a JDBC driver jar.

Why it exists:

- **Live verification.** The adapter's SQL surface (pg_catalog schema
  and index extraction, chunked key DELETEs, mirrored DDL,
  ``create index concurrently``, the ``xmin`` CDC projection —
  reference internal/schemas.go, internal/deletes.go:207-235,
  internal/updates.go:44,94) was previously only exercised against an
  in-memory fake. ``PsqlDatabase`` subclasses the production
  :class:`~sslr_spark.sources.jdbc.JdbcDatabase` and overrides ONLY
  the four transport methods, so an embedded Postgres test runs every
  SQL-generation and orchestration line for real
  (tests/test_postgres_live.py — the reference ships a docker-compose
  harness for the same purpose, docker-compose.yml:1-15).
- **Ops fallback.** Environments with the ``psql`` client but no
  JDBC driver jar on the Spark driver can still run a sync.

Scale posture — THIS IS NOT THE 100 TB PATH. Bulk rows funnel through
the driver via ``COPY ... TO/FROM STDOUT`` (single stream, no executor
parallelism). The production path is the parent class over Spark's
JDBC source (partitioned range reads, executor-side batched writes);
use this transport for tests, ops tooling, and small control tables
only. Statement execution semantics match the parent exactly: one
statement per ``psql -c`` runs in autocommit, same as a
``java.sql.Statement`` on a default connection — which is what lets
``create index concurrently`` (invalid inside a transaction block)
succeed on both transports.

Wire formats are PostgreSQL's documented COPY text format (tab
fields, ``\\N`` nulls, backslash escapes) and ``\\gdesc`` for result
typing — public protocol surface only.
"""

from __future__ import annotations

import datetime
import subprocess
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sslr_spark.sources import ddl as D
from sslr_spark.sources.jdbc import JdbcDatabase

# COPY text-format escapes (COPY TO emits exactly these)
_UNESCAPES = {
    "\\": "\\", "b": "\b", "f": "\f", "n": "\n",
    "r": "\r", "t": "\t", "v": "\v",
}


def copy_text_unescape(field: str) -> str:
    out = []
    i, n = 0, len(field)
    while i < n:
        c = field[i]
        if c == "\\" and i + 1 < n:
            out.append(_UNESCAPES.get(field[i + 1], field[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def copy_text_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace("\b", "\\b").replace("\f", "\\f").replace("\n", "\\n")
        .replace("\r", "\\r").replace("\t", "\\t").replace("\v", "\\v")
    )


def pg_type_to_spark(pg_type: str) -> T.DataType:
    """\\gdesc type name -> Spark type. ``timestamp without time
    zone`` maps to TimestampType (session-TZ semantics; the container
    and driver harness both run UTC) for parity with the parquet
    adapter's column types."""
    t = pg_type.strip().lower()
    if t.startswith("numeric") or t.startswith("decimal"):
        if "(" in t:
            p, s = t[t.index("(") + 1 : t.rindex(")")].split(",")
            return T.DecimalType(int(p), int(s))
        return T.DecimalType(38, 18)
    if t.startswith(("character varying", "character", "text", "name")):
        return T.StringType()
    base = {
        "smallint": T.ShortType(),
        "integer": T.IntegerType(),
        "bigint": T.LongType(),
        "real": T.FloatType(),
        "double precision": T.DoubleType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "bytea": T.BinaryType(),
        "timestamp without time zone": T.TimestampType(),
        "timestamp with time zone": T.TimestampType(),
    }
    return base.get(t, T.StringType())


def _parse_value(s: str | None, dt: T.DataType):
    if s is None:
        return None
    if isinstance(dt, T.StringType):
        return s
    if isinstance(dt, (T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(s)  # handles 'Infinity'/'NaN' spellings
    if isinstance(dt, T.BooleanType):
        return s == "t"
    if isinstance(dt, T.DecimalType):
        return Decimal(s)
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(s)
    if isinstance(dt, T.TimestampType):
        # '2030-01-01 12:00:00[.ffffff][+HH]'
        return datetime.datetime.fromisoformat(s)
    if isinstance(dt, T.BinaryType):
        return bytes.fromhex(s[2:]) if s.startswith("\\x") else s.encode()
    return s


def _render_value(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        # literal backslash must itself be escaped in text format
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, float):
        import math

        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return copy_text_escape(str(v))


class PsqlDatabase(JdbcDatabase):
    """The production JDBC adapter with its transport swapped for the
    ``psql`` CLI. Everything above the transport — option assembly,
    xmin projection, bounds probing, DDL/index mirroring, chunked
    deletes, upsert orchestration — is inherited unchanged."""

    def __init__(
        self,
        spark: SparkSession,
        host: str,
        dbname: str,
        port: int = 5432,
        user: str = "postgres",
        psql_path: str = "psql",
        **kw,
    ):
        # the pseudo-URL feeds the parent's dialect switches only
        super().__init__(
            spark, f"jdbc:postgresql://{host}:{port}/{dbname}", **kw
        )
        self.host = host  # a leading-/ path selects a unix socket dir
        self.port = port
        self.dbname = dbname
        self.user = user
        self.psql_path = psql_path

    # -- plumbing ------------------------------------------------------
    def _psql(self, *args: str, input_text: str | None = None) -> str:
        cmd = [
            self.psql_path, "-X", "-q", "-v", "ON_ERROR_STOP=1",
            "-h", self.host, "-p", str(self.port),
            "-U", self.user, "-d", self.dbname, *args,
        ]
        res = subprocess.run(
            cmd, input=input_text, capture_output=True, text=True
        )
        if res.returncode != 0:
            raise RuntimeError(
                f"psql failed ({res.returncode}): {res.stderr.strip()}"
            )
        return res.stdout

    def _describe(self, query: str) -> list[tuple[str, str]]:
        """Result column names/types without executing: \\gdesc."""
        script = (
            "\\pset tuples_only on\n\\pset format unaligned\n"
            f"{query}\n\\gdesc\n"
        )
        out = self._psql("-f", "-", input_text=script)
        cols = []
        for line in out.splitlines():
            if "|" in line:
                name, _, typ = line.partition("|")
                cols.append((name, typ))
        return cols

    # -- transport overrides ------------------------------------------
    def _load(self, options: dict[str, str]) -> DataFrame:
        # partitionColumn options are accepted but moot: this
        # transport is one driver-side COPY stream (see module doc)
        dbtable = options["dbtable"]
        query = f"select * from {dbtable}"
        fields = [
            T.StructField(name, pg_type_to_spark(typ))
            for name, typ in self._describe(query)
        ]
        schema = T.StructType(fields)
        raw = self._psql("-c", f"copy ({query}) to stdout")
        rows = []
        # Drop ONLY the trailing newline's empty element — an interior
        # empty line is a real row (a single text column holding ''),
        # so `if not line: continue` would silently lose rows. Not
        # splitlines(): COPY passes U+0085/U+2028 through unescaped
        # and splitlines would cut a row at them.
        lines = raw.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        for line in lines:
            parts = line.split("\t")
            rows.append(
                tuple(
                    _parse_value(
                        None if p == "\\N" else copy_text_unescape(p),
                        f.dataType,
                    )
                    for p, f in zip(parts, fields)
                )
            )
        return self.spark.createDataFrame(rows, schema)

    def _save(
        self, df: DataFrame, options: dict[str, str], mode: str,
        truncate: bool = False,
    ) -> None:
        table = options["dbtable"]
        exists = self.table_exists(table)
        if mode == "overwrite":
            if exists and truncate:
                self._execute(f"truncate table {table}")
            elif exists:
                self._execute(D.drop_table_ddl(table))
                exists = False
        if not exists:
            self.create_table(table, df.schema)
        cols = ", ".join(df.columns)
        # collect(), not toLocalIterator(): the sync layer attaches an
        # Observation (S4 progress counter) to copied frames, and
        # Observation.get blocks until ONE action completes the whole
        # plan — toLocalIterator's partition-wise jobs never deliver
        # that event (observed as a live-test hang). Driver-side
        # materialization is this transport's documented bound anyway.
        lines = [
            "\t".join(_render_value(r[c]) for c in df.columns)
            for r in df.collect()
        ]
        if lines:
            self._psql(
                "-c", f"copy {table} ({cols}) from stdin",
                input_text="\n".join(lines) + "\n",
            )

    def _execute(self, sql: str) -> None:
        # one statement per -c = one autocommitted simple-query round
        # trip — the same semantics as the parent's java.sql Statement
        # on a default (autocommit) connection; this is what permits
        # CREATE INDEX CONCURRENTLY, which refuses to run inside a
        # transaction block
        self._psql("-c", sql)

    # _scalar is inherited: it routes through _load's subquery form.
