"""Portable hashing / fingerprint columns.

The reference fingerprints a key range as
``md5(array_agg(key-tuple))`` over an *ordered* subquery
(reference internal/deletes.go:237-269). An order-sensitive aggregate
is shuffle-hostile at scale, so the engine's bucket diff uses a
**commutative** fingerprint instead: per bucket, ``bit_xor`` of a
60-bit hash of the key tuple plus a row count. XOR is
order-insensitive and overflow-free, so it parallelizes perfectly;
equal multisets of keys => equal (count, fingerprint) pairs, and the
probability two *different* buckets collide on both count and a 60-bit
XOR is negligible for diff purposes.

Everything here is chosen for *engine parity*: the exact same formula
is expressible in ANSI SQL (DuckDB oracle) — md5, substring, hex cast,
bit_xor — so correctness can be cross-checked engine-to-engine.

Spark-side these compile to built-in JVM expressions (whole-stage
codegen, no Python in the hot path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Separator that is unlikely to appear inside key values; the reference
# concatenates key parts with '' casts to varchar (internal/deletes.go:249).
KEY_SEP = "\x1f"


def key_string(cols: Sequence[str | Column]) -> Column:
    """Key tuple -> one string, null-safe (nulls become '\\x00')."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00")
        )
        for c in cols
    ]
    return F.concat_ws(KEY_SEP, *parts)


def h60(col: Column) -> Column:
    """Deterministic 60-bit non-negative hash of a string column.

    md5 -> first 15 hex digits -> integer. Portable: DuckDB spells it
    ``cast(concat('0x', substring(md5(x),1,15)) as bigint)``.

    This is the ORACLE-PARITY path (cross-checkable engine-to-engine).
    Hot production paths should use :func:`h64_fast` — xxhash64 is a
    single JVM intrinsic vs md5's digest + hex + base conversion,
    which profiling showed dominating the minhash pipeline (~16 seeded
    hashes per shingle).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_fast(*cols: str | Column) -> Column:
    """Production hash: xxhash64 over the given columns (seed its
    first argument when seeding — ``h64_fast(F.lit(seed), col)``).
    Full-range signed 64-bit; NOT oracle-portable (DuckDB has no
    xxhash64), so driver-contract queries keep :func:`h60`."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def key_hash(cols: Sequence[str | Column]) -> Column:
    """60-bit hash of a composite key tuple."""
    return h60(key_string(cols))


def _null_tagged(cols: Sequence[str | Column]) -> list[Column]:
    """Interleave per-column null flags with the key columns.

    xxhash64 SKIPS null inputs, so without the flags composite keys
    that differ only in WHICH column is null — (NULL, 'x') vs
    ('x', NULL) — would hash identically and a real divergence would
    fingerprint as clean. The boolean flags are never null, so the
    hashed stream always differs. (The portable path is immune:
    key_string() coalesces nulls to a sentinel between separators.)"""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out: list[Column] = []
    for c in cs:
        out.append(c.isNull())
        out.append(c)
    return out


def key_hash_fast(cols: Sequence[str | Column]) -> Column:
    """Production key hash: xxhash64 straight over the (null-tagged)
    key columns — no string concat, no md5. NOT oracle-portable; both
    sides of a diff must use the same mode."""
    return h64_fast(*_null_tagged(cols))


def bucket_id_fast(cols: Sequence[str | Column], n_buckets: int) -> Column:
    """Fast ephemeral bucket assignment, independent of
    :func:`key_hash_fast` via a seed column. Only for diffs computed
    on both sides in one run — STORED bucket layouts keep the
    portable :func:`bucket_id` so files stay readable across engine
    versions and configs."""
    return F.pmod(
        h64_fast(F.lit(0x5B5), *_null_tagged(cols)), F.lit(n_buckets)
    ).alias("bucket")


def bucket_id(cols: Sequence[str | Column], n_buckets: int) -> Column:
    """Stable hash-bucket assignment of a key tuple into [0, n_buckets).

    Uses a *different* hash than :func:`key_hash` (md5 offset 16) so the
    bucket id and the fingerprint are independent.
    """
    h = F.conv(F.substring(F.md5(key_string(cols)), 17, 15), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def h60_sql(expr: str) -> str:
    """DuckDB spelling of :func:`h60` for oracle parity."""
    return f"cast(concat('0x', substring(md5({expr}), 1, 15)) as bigint)"


def bucket_sql(expr: str, n_buckets: int) -> str:
    """DuckDB spelling of :func:`bucket_id`."""
    return (
        f"cast(concat('0x', substring(md5({expr}), 17, 15)) as bigint)"
        f" % {n_buckets}"
    )
