"""JDBC-target DDL and index mirroring (S6 / S8 / A5 / A6).

The reference mirrors a Postgres table by (a) assembling a ``create
table`` statement from pg_catalog with a string_agg of column
definitions (reference internal/schemas.go:91-139 — operator A5),
(b) extracting the source's indexes with an array_agg of key columns
(internal/schemas.go:147-193 — S6/A6), and (c) replaying both on the
target, using ``create [unique] index concurrently if not exists``
(internal/schemas.go:213-256 — S8).

Spark-side split of responsibilities:
- *Extraction* runs as catalog SQL pushed to the source database
  through the JDBC adapter (the queries below are verbatim-shaped
  reproductions of the reference's pg_catalog queries, flattened so
  every output column is JDBC-scannable).
- *Generation* also works straight from a Spark ``StructType`` — the
  engine already holds the source schema for drift detection, so a
  parquet->JDBC sync can create its target without a Postgres source.

Everything here is pure string assembly: unit-testable with no
database, executed through ``JdbcDatabase._execute``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


def split_table_path(path: str) -> tuple[str, str]:
    """'ns.table' -> (ns, table); bare names default to 'public'
    (reference internal/schemas.go:203-211)."""
    if "." in path:
        ns, table = path.split(".", 1)
        return ns, table
    return "public", path


# -- Spark type -> Postgres type ---------------------------------------

_SIMPLE_PG_TYPES = {
    "long": "bigint",
    "integer": "integer",
    "short": "smallint",
    "byte": "smallint",
    "string": "text",
    "double": "double precision",
    "float": "real",
    "boolean": "boolean",
    "binary": "bytea",
    "date": "date",
    "timestamp": "timestamp without time zone",
    "timestamp_ntz": "timestamp without time zone",
}


def spark_type_to_pg(dt: T.DataType) -> str:
    """Map a Spark type to the Postgres type name pg_catalog's
    format_type would print for the equivalent column."""
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"{spark_type_to_pg(dt.elementType)}[]"
    name = dt.typeName()
    if name in _SIMPLE_PG_TYPES:
        return _SIMPLE_PG_TYPES[name]
    raise ValueError(f"no Postgres mapping for Spark type {name!r}")


def create_table_ddl(table: str, schema: T.StructType) -> str:
    """Assemble the reference-shaped ``create table`` statement from a
    Spark schema (same output format as the pg_catalog string_agg in
    reference internal/schemas.go:96-139: comma-joined
    ``name type null|not null`` defs, trailing semicolon)."""
    ns, rel = split_table_path(table)
    cols = ",".join(
        f"{f.name} {spark_type_to_pg(f.dataType)} "
        f"{'null' if f.nullable else 'not null'}"
        for f in schema.fields
        if not f.name.startswith("__sslr")
    )
    return f"create table {ns}.{rel}({cols});"


# -- catalog extraction queries (pushed to the source via JDBC) --------

def schema_extract_sql(table: str) -> str:
    """The reference's A5 schema-assembly query
    (internal/schemas.go:95-139), with string_agg in place of
    array_to_string(array_agg(...)) — identical result, and the single
    output column scans cleanly over JDBC."""
    ns, rel = split_table_path(table)
    return f"""
select
    'create table ' || relname || '(' ||
    string_agg(column_name || ' ' || type || ' ' || not_null, ',') || ');'
    as schema_sql
from
(
    select
            n.nspname || '.' || c.relname as relname, a.attname as column_name,
            pg_catalog.format_type(a.atttypid, a.atttypmod) as type,
            case when a.attnotnull then 'not null' else 'null' end as not_null
    from
        pg_class c,
        pg_attribute a,
        pg_type t,
        pg_catalog.pg_namespace n
    where
        c.relname = '{rel}'
        and n.nspname = '{ns}'
        and a.attnum > 0
        and a.attrelid = c.oid
        and a.atttypid = t.oid
        and n.oid = c.relnamespace
    order by a.attnum
) as "schema"
group by relname
""".strip()


def index_extract_sql(table: str) -> str:
    """The reference's S6/A6 index-extraction query
    (internal/schemas.go:148-173); key columns are array_agg'd then
    flattened to a comma-joined string for JDBC scanning.

    Deviation (improvement): the reference's plain ``array_agg``
    leaves composite-index column order unspecified, so an index on
    (b, a) could be replayed as (a, b) — changing prefix usability on
    the target. We order by the column's position in ``indkey``, the
    index's actual key order."""
    ns, rel = split_table_path(table)
    return f"""
select
    i.relname as index_name,
    ix.indisprimary as is_primary,
    array_to_string(
        array_agg(a.attname
                  order by array_position(ix.indkey::int2[], a.attnum)),
        ','
    ) as columns
from
    pg_class t,
    pg_class i,
    pg_index ix,
    pg_attribute a,
    pg_catalog.pg_namespace n
where
    t.oid = ix.indrelid
    and i.oid = ix.indexrelid
    and a.attrelid = t.oid
    and a.attnum = any(ix.indkey)
    and t.relkind = 'r'
    and n.oid = t.relnamespace
    and n.nspname = '{ns}'
    and t.relname = '{rel}'
group by 1, 2
order by 1, 2
""".strip()


# -- index mirroring ----------------------------------------------------

@dataclass
class TableIndex:
    """Mirror of the reference's tableIndex (internal/schemas.go:141-145)."""

    index_name: str
    primary: bool = False
    columns: list[str] = field(default_factory=list)


def index_ddl(table: str, index: TableIndex) -> str:
    """One replayed index (reference internal/schemas.go:241-256):
    ``concurrently`` keeps the target table readable during the build,
    ``if not exists`` makes replay idempotent, primary keys degrade to
    unique indexes (a synced target has no real PK constraint)."""
    directive = "unique " if index.primary else ""
    cols = ",".join(index.columns)
    return (
        f"create {directive}index concurrently if not exists "
        f"{index.index_name} on {table} ({cols})"
    )


def pk_index(table: str, pk_cols: list[str]) -> TableIndex:
    """Synthesized unique index over the configured primary key — used
    when the source is not Postgres (no catalog to extract) so a
    JDBC target still gets its merge-key index."""
    _, rel = split_table_path(table)
    return TableIndex(
        index_name=f"{rel}_sslr_pkey", primary=True, columns=list(pk_cols)
    )


def create_schema_ddl(table: str) -> str:
    """Namespace bootstrap (reference internal/schemas.go:213-221)."""
    ns, _ = split_table_path(table)
    return f"create schema if not exists {ns}"


def drop_table_ddl(table: str) -> str:
    return f"drop table {table}"


# -- engine-agnostic catalog projections (S5 / S7) ---------------------
#
# The reference's catalog scans are pg_catalog queries
# (internal/schemas.go:91-139 extractTableSchema, :195-200
# objectExists). Against live PostgreSQL the verbatim queries above
# replay them; for NON-Postgres adapters the same semantics project
# engine-agnostically — coarse type CLASSES instead of engine type
# spellings, so any catalog (Spark StructType, DuckDB
# information_schema, pg_catalog) emits identical rows and the driver
# can hash-check the operator end-to-end.

_TYPE_CLASSES = {
    "long": "int64",
    "bigint": "int64",
    "integer": "int32",
    "int": "int32",
    "short": "int16",
    "smallint": "int16",
    "byte": "int8",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "real": "float32",
    "string": "string",
    "varchar": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def type_class(dt: T.DataType) -> str:
    """Coarse, engine-agnostic class of a Spark type: int64/int32/
    float64/string/timestamp/decimal/array/nested/... — the
    granularity at which heterogeneous catalogs can agree."""
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.MapType, T.StructType)):
        return "nested"
    return _TYPE_CLASSES.get(dt.simpleString(), "other")


def schema_projection(spark, schema: T.StructType, table_name: str):
    """S5 as verifiable rows: (table_name, ordinal, column_name,
    type_class, nullable) from an adapter-provided schema — the
    engine-agnostic twin of extractTableSchema
    (internal/schemas.go:91-139). Ordinals are 1-based to match
    information_schema/pg_attribute conventions."""
    rows = [
        (table_name, i + 1, f.name, type_class(f.dataType), bool(f.nullable))
        for i, f in enumerate(schema.fields)
    ]
    return spark.createDataFrame(
        rows,
        "table_name string, ordinal int, column_name string, "
        "type_class string, nullable boolean",
    )


def existence_probe(spark, db, names: list[str]):
    """S7 as verifiable rows: (table_name, table_exists) for a probe
    list, via the adapter's catalog check (objectExists,
    internal/schemas.go:195-200)."""
    rows = [(n, bool(db.table_exists(n))) for n in names]
    return spark.createDataFrame(
        rows, "table_name string, table_exists boolean"
    )
