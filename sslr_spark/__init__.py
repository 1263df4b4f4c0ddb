"""sslr_spark — a PySpark-native incremental replication / dataflow engine.

A from-scratch rebuild of the capabilities of erkkah/sslr ("Simple Stupid
Logical Replication", reference at /root/reference) on Apache Spark:
throttled, filtered, chunked incremental table sync (watermark scans,
merge upserts, hash-diff delete detection) expressed as DataFrame
programs, plus large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the reference does not have.

Architecture (Spark-first, not a port):
- All relational work is declarative DataFrame/SQL so Catalyst handles
  pushdown, pruning, join selection, and AQE.
- The reference's divide-and-conquer delete scan (O(log n) round trips,
  reference internal/deletes.go:49-89) is replaced by a one-pass
  bucketed commutative hash diff — the scale-correct formulation.
- OFFSET/LIMIT pagination (reference internal/updates.go:99-103) is
  replaced by partitioned reads; chunking = Spark partitioning.
"""

from sslr_spark.config import Config, FilteredTable, load_config
from sslr_spark.session import get_spark
from sslr_spark.sources.parquet import ParquetDatabase
from sslr_spark.state import StateStore, TableState

__all__ = [
    "Config",
    "FilteredTable",
    "load_config",
    "get_spark",
    "ParquetDatabase",
    "StateStore",
    "TableState",
]

__version__ = "0.1.0"
