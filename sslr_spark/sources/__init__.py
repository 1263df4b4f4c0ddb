"""Source/target database adapters.

The engine talks to "databases" through a minimal adapter interface:
read a table as a DataFrame, overwrite a table atomically, probe
existence, list columns. Two implementations: parquet directories
(test harness + lake deployments) and JDBC (production replication
path, mirroring the reference's PostgreSQL source/target).
"""

from sslr_spark.sources.parquet import ParquetDatabase

__all__ = ["ParquetDatabase"]
