"""SparkSession bootstrap tuned for the engine.

Defaults target local[N] testing but every knob is the one you would
set on a real cluster: AQE on (runtime re-plan + skew-join handling),
shuffle partitions sized to cores (local) / data volume (cluster),
Arrow enabled for the Pandas-UDF extension operators, UTC session
timezone so results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sslr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores (or
    left to AQE coalescing with a high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # Scan-split floor (guide §6): Spark floors every file split at
    # spark.sql.files.openCostInBytes (default 4 MB), which defeats the
    # spark.sql.files.minPartitionNum parallelism floor for small
    # single-file tables — a sub-4MB parquet table scans as ONE task
    # and every narrow CPU stage fused to it (tokenize, decode, regex)
    # runs on one core until the first shuffle. 512 KB keeps scan
    # parallelism at the core count for small inputs; at scale
    # maxPartitionBytes (128 MB default) dominates split sizing and a
    # lower open cost only packs MORE tiny files per task (fewer,
    # fatter tasks — the right direction there too). Override via
    # $SSLR_FILES_OPEN_COST for deployments where file-open latency
    # genuinely costs more (high-latency object stores).
    open_cost = os.environ.get("SSLR_FILES_OPEN_COST", str(512 * 1024))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.openCostInBytes", open_cost)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SSLR_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
