"""Full filtered table copy (reference S1 -> S3).

The reference streams ``select * from t [where f]`` row-by-row into a
truncate+COPY transaction (reference internal/copy.go:11-59). Spark
version: a declarative filtered read written atomically — Catalyst
pushes the filter to the scan (parquet row-group pruning / JDBC WHERE)
and executors write in parallel; the staged-rename overwrite supplies
the truncate+COPY transactionality.

Progress reporting (reference internal/copy.go:61-105 logs every
10k/100k/500k rows) has two halves here: the exact final count rides
``df.observe`` — a zero-cost accumulator collected on the same job,
no second scan — and IN-FLIGHT ticks come from
:class:`CopyProgressReporter`, a driver-side monitor thread polling
the public StatusTracker for the copy job's task completion and
logging estimated cumulative rows at the reference's exact tier
cadence. Nothing touches the executor hot path: the data plan stays
pure JVM columnar; the monitor reads scheduler metadata only.
"""

from __future__ import annotations

import logging
import threading
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sslr_spark.sources.parquet import ParquetDatabase

_LOG = logging.getLogger("sslr_spark")


def _report_interval(rows: int) -> int:
    """The reference's tier schedule (internal/copy.go:78-88): every
    10k rows up to 100k, every 100k up to 1M, every 500k beyond."""
    if rows > 1_000_000:
        return 500_000
    if rows > 100_000:
        return 100_000
    return 10_000


class CopyProgressReporter:
    """In-flight progress for a long copy, without touching the data
    path: a context manager that tags the enclosed job(s) with a job
    group, then polls ``sc.statusTracker()`` from a daemon thread and
    logs "Read ~N rows (t/T tasks)" every time the estimated
    cumulative row count crosses a reference tier boundary
    (internal/copy.go:78-88 — 10k/100k/500k cadence). Rows are
    estimated as ``expected_rows * completed_tasks / total_tasks``
    over the stages SUBMITTED SO FAR — early in a multi-stage job the
    estimate is submitted-stage-relative and can run ahead of true
    progress until later stages register; ticks are monotone and the
    exact count still comes from the observe metric at the end;
    the sync path knows expected_rows for free from its A1 watermark
    probe. On a multi-hour 100 TB copy this is the only signal an
    operator has that the job is advancing — the reference's users
    rely on it (README.md:59-71 sample output).
    """

    def __init__(
        self,
        spark: SparkSession,
        expected_rows: int | None,
        table: str = "",
        poll_seconds: float = 2.0,
        log=None,
    ):
        self.sc = spark.sparkContext
        self.expected = expected_rows
        self.table = table
        self.poll_seconds = poll_seconds
        self.log = log or _LOG.info
        self.group = f"sslr_copy_{uuid.uuid4().hex[:12]}"
        self.ticks = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _progress(self) -> tuple[int, int]:
        tracker = self.sc.statusTracker()
        done = total = 0
        for jid in tracker.getJobIdsForGroup(self.group):
            job = tracker.getJobInfo(jid)
            if job is None:
                continue
            for sid in job.stageIds:
                st = tracker.getStageInfo(sid)
                if st is not None:
                    done += st.numCompletedTasks
                    total += st.numTasks
        return done, total

    def _run(self) -> None:
        reported = 0  # highest tier boundary already logged
        while not self._stop.wait(self.poll_seconds):
            done, total = self._progress()
            if not total or self.expected is None:
                continue
            est = self.expected * done // total
            # emit every boundary crossed since the last poll — the
            # reference ticks per row; we tick per poll but never
            # skip a boundary
            while reported + _report_interval(reported + 1) <= est:
                reported += _report_interval(reported + 1)
                self.ticks += 1
                self.log(
                    "Read ~%d rows (%d/%d tasks)%s",
                    reported,
                    done,
                    total,
                    f" [{self.table}]" if self.table else "",
                )

    def __enter__(self) -> "CopyProgressReporter":
        if self.expected is not None:
            # save the caller's job group so __exit__ can restore it
            # instead of clobbering it with a blank one
            self._prior_group = self.sc.getLocalProperty("spark.jobGroup.id")
            self._prior_desc = self.sc.getLocalProperty(
                "spark.job.description"
            )
            self.sc.setJobGroup(self.group, f"sslr copy {self.table}")
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=10)
            # restore the caller's job group (or clear ours if none)
            if self._prior_group:
                self.sc.setJobGroup(
                    self._prior_group, self._prior_desc or ""
                )
            else:
                self.sc.setJobGroup("", "")


def filtered_source(
    df: DataFrame, where: str | None, drop_version: str | None = None
) -> DataFrame:
    """Apply the user filter and optionally drop the engine's version
    column from the payload (the reference strips xmin from copied
    columns, internal/updates.go:117-124).

    The filter is evaluated through ``spark.sql`` (not ``F.expr``)
    because the reference allows arbitrary SQL in ``where`` including
    subqueries over 'uses' tables (reference sslr.json:15-24, P9) —
    callers register those as temp views first. Catalyst produces the
    same pushed-down plan either way."""
    if where:
        import uuid

        spark = df.sparkSession
        name = f"__sslr_src_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(name)
        try:
            df = spark.sql(f"select * from {name} where {where}")
            # force analysis while the view exists, then drop it — the
            # resolved plan no longer needs the view
            df.schema
        finally:
            spark.catalog.dropTempView(name)
    if drop_version and drop_version in df.columns:
        df = df.drop(drop_version)
    return df


def copy_full_table(
    source_df: DataFrame,
    target: ParquetDatabase,
    table: str,
    where: str | None = None,
    drop_version: str | None = None,
    expected_rows: int | None = None,
) -> int:
    """Overwrite ``table`` in the target with the filtered source.

    Returns the number of rows copied, counted via ``observe`` on the
    write job itself (no extra scan). ``drop_version`` strips the
    engine's version column from the payload (JDBC targets — the
    reference strips xmin, internal/updates.go:117-124).
    ``expected_rows`` (when the caller already knows it — the sync
    path's A1 probe does) turns on in-flight tier-cadence progress
    logging via :class:`CopyProgressReporter`.
    """
    # the observation name is UNIQUE per invocation: Spark keeps the
    # listener of a registered-but-never-executed observation forever,
    # and a later same-name observation's get() then blocks
    # indefinitely — which would hang a continuous-mode pass retrying
    # a copy whose write died before executing (adapter validation
    # errors, staged-rename failures). Reproduced in
    # tests/test_round9_fixes.py (interrupted MOR full copy).
    import uuid

    obs = Observation(f"copy_{table}_{uuid.uuid4().hex[:8]}")
    df = filtered_source(source_df, where, drop_version=drop_version).observe(
        obs, F.count(F.lit(1)).alias("rows")
    )
    with CopyProgressReporter(df.sparkSession, expected_rows, table):
        target.overwrite(table, df)
    return int(obs.get["rows"])
