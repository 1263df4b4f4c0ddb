"""Source/target database adapters.

The engine talks to "databases" through a minimal adapter interface:
read a table as a DataFrame, overwrite a table atomically, probe
existence, list columns. Two implementations: parquet directories
(test harness + lake deployments) and JDBC (production replication
path, mirroring the reference's PostgreSQL source/target).
"""

from sslr_spark.sources.parquet import ParquetDatabase

__all__ = ["ParquetDatabase", "JdbcDatabase", "open_database"]


def __getattr__(name):
    # lazy: keep `import sslr_spark.sources` cheap and cycle-free
    if name == "JdbcDatabase":
        from sslr_spark.sources.jdbc import JdbcDatabase

        return JdbcDatabase
    if name == "open_database":
        from sslr_spark.sources.factory import open_database

        return open_database
    raise AttributeError(name)
