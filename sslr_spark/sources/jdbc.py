"""JDBC database adapter — the production replication path, mirroring
the reference's PostgreSQL source/target (reference internal/job.go:81-92
opens one pgx connection per side; here every Spark partition opens its
own connection, which is the intra-table parallelism the reference
lacks, README.md:97-101).

Key mappings:
- ``xmin`` system column: exposed through a subquery projection
  ``(select xmin::text::bigint as xmin, t.* from <table> t) q``
  (the reference casts the same way, internal/updates.go:44,94).
- chunked reads: partitionColumn/lowerBound/upperBound/numPartitions
  replace OFFSET/LIMIT pagination (SURVEY §4 — never OFFSET-paginate).
- COPY-protocol bulk load: ``batchsize`` + reWriteBatchedInserts on
  the write path.
- throttle: ``fetchsize`` bounds per-round-trip row counts (T5's
  passive half; the active utilization cap wraps reads driver-side).

Untested in this container (no database available); the interface
matches ParquetDatabase so the Job layer is adapter-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcDatabase:
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        properties: dict[str, str] | None = None,
        fetchsize: int = 10_000,
        batchsize: int = 10_000,
        num_partitions: int = 8,
        expose_xmin: bool = False,
    ):
        self.spark = spark
        self.url = url
        self.properties = dict(properties or {})
        self.fetchsize = fetchsize
        self.batchsize = batchsize
        self.num_partitions = num_partitions
        self.expose_xmin = expose_xmin

    # -- option assembly (unit-testable without a server) --------------
    def read_options(
        self,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> dict[str, str]:
        dbtable = (
            f"(select xmin::text::bigint as xmin, t.* from {table} t) q"
            if self.expose_xmin
            else table
        )
        opts = {
            "url": self.url,
            "dbtable": dbtable,
            "fetchsize": str(self.fetchsize),
            **self.properties,
        }
        if partition_column is not None:
            opts.update(
                {
                    "partitionColumn": partition_column,
                    "lowerBound": str(lower_bound),
                    "upperBound": str(upper_bound),
                    "numPartitions": str(self.num_partitions),
                }
            )
        return opts

    def write_options(self, table: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": table,
            "batchsize": str(self.batchsize),
            "reWriteBatchedInserts": "true",
            **self.properties,
        }

    # -- adapter interface (same shape as ParquetDatabase) -------------
    def read(
        self,
        table: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
    ) -> DataFrame:
        return (
            self.spark.read.format("jdbc")
            .options(**self.read_options(table, partition_column, lower_bound, upper_bound))
            .load()
        )

    def overwrite(self, table: str, df: DataFrame) -> None:
        (
            df.write.format("jdbc")
            .options(**self.write_options(table))
            .option("truncate", "true")
            .mode("overwrite")
            .save()
        )

    def append(self, table: str, df: DataFrame) -> None:
        df.write.format("jdbc").options(**self.write_options(table)).mode(
            "append"
        ).save()

    def table_exists(self, table: str) -> bool:
        probe = (
            self.spark.read.format("jdbc")
            .options(url=self.url, **self.properties)
            .option(
                "dbtable",
                f"(select to_regclass('{table}') is not null as e) q",
            )
        )
        try:
            return bool(probe.load().first()["e"])
        except Exception:
            return False

    def schema(self, table: str):
        return self.read(table).schema
