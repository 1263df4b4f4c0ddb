"""Checkpoint state: per-table (last_seen_version, where_clause).

The reference keeps sync state in an explicit table in the *target*
database (reference internal/state.go:9-75: table ``__sslr_state`` with
columns table_name / last_seen_xmin / where_clause, upserted with ON
CONFLICT). We keep that design — an inspectable, engine-agnostic state
table in the target database — written through the adapter's atomic
overwrite so state commits are all-or-nothing.

Ordering rule (crash safety): data is committed first, state second.
If the engine dies between the two, the next run re-processes the same
version slice; the merge apply is idempotent, so this is safe — the
same at-least-once + idempotent-apply contract the reference gets from
committing state inside the target transaction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from sslr_spark.sources.parquet import ParquetDatabase

STATE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("last_seen_version", T.LongType(), False),
        T.StructField("where_clause", T.StringType(), True),
    ]
)


@dataclass
class TableState:
    table_name: str
    last_seen_version: int = 0
    where_clause: str = ""


class StateStore:
    def __init__(self, target: ParquetDatabase, state_table: str = "__sslr_state"):
        import threading

        self.target = target
        self.state_table = state_table
        # set/clear are read-modify-write over the whole state table;
        # the lock makes them safe under table-parallel jobs (job.py).
        self._lock = threading.Lock()

    def _read_all(self) -> dict[str, TableState]:
        if not self.target.table_exists(self.state_table):
            return {}
        rows = self.target.read(self.state_table).collect()  # tiny: 1 row/table
        return {
            r.table_name: TableState(
                r.table_name, r.last_seen_version, r.where_clause or ""
            )
            for r in rows
        }

    def get(self, table: str) -> TableState:
        """Point lookup; absent -> zero state (version 0 = full sync,
        reference internal/updates.go:33-34).

        Takes the store lock: set() swaps the state table via staged
        renames, and an unlocked read can land in the window where the
        final path does not exist (parallel_tables > 1). The lock only
        covers threads of THIS driver — like the reference, the state
        table assumes a single writer process per target."""
        with self._lock:
            return self._read_all().get(table, TableState(table))

    def set(self, state: TableState) -> None:
        """Upsert one table's state (reference internal/state.go:64-70).

        In-place-capable targets (JDBC) upsert JUST this table's row —
        a whole-table overwrite through Spark's JDBC writer is
        truncate+insert in separate transactions, so a crash there
        would zero EVERY table's watermark (full resync of the world).
        The per-row path bounds the damage to one table, and the data-
        before-state commit order makes its re-apply idempotent.
        Parquet targets keep the whole-table overwrite: the staged
        rename is atomic."""
        with self._lock:
            row_df = self.target.spark.createDataFrame(
                [(state.table_name, int(state.last_seen_version), state.where_clause)],
                schema=STATE_SCHEMA,
            )
            if hasattr(self.target, "apply_upsert") and self.target.table_exists(
                self.state_table
            ):
                self.target.apply_upsert(
                    self.state_table, row_df, ["table_name"]
                )
                return
            all_states = self._read_all()
            all_states[state.table_name] = state
            df = self.target.spark.createDataFrame(
                [
                    (s.table_name, int(s.last_seen_version), s.where_clause)
                    for s in all_states.values()
                ],
                schema=STATE_SCHEMA,
            )
            self.target.overwrite(self.state_table, df)

    def set_version(self, table: str, version: int) -> None:
        st = self.get(table)
        st.last_seen_version = version
        self.set(st)

    def clear(self, table: str) -> None:
        with self._lock:
            self._clear_locked(table)

    def _clear_locked(self, table: str) -> None:
        all_states = self._read_all()
        if table in all_states:
            del all_states[table]
            df = self.target.spark.createDataFrame(
                [
                    (s.table_name, int(s.last_seen_version), s.where_clause)
                    for s in all_states.values()
                ],
                schema=STATE_SCHEMA,
            )
            self.target.overwrite(self.state_table, df)
