"""Approximate-membership operators: a distributed Bloom filter built
and probed entirely with DataFrame expressions.

The LLM-pipeline use case is cross-corpus membership at crawl scale:
"which keys (URLs, content hashes, shingles) of this new batch were
already present in the previous crawl?" — the previous crawl is too
big to semi-join raw, but its Bloom bit set is m-bounded and tiny, so
the probe side never shuffles.

Design (beyond the reference surface — the reference has no
approximate operators at all):

- ``bloom_positions``: k bit positions per key, each
  ``h60(seed:i:key) % m`` — the portable md5-derived hash
  (functions/hashing.h60), so the exact same filter is reproducible
  in DuckDB for the correctness oracle. Production pipelines that
  don't need engine portability can build the same shape over
  ``h64_fast`` (xxhash64) — the structure is hash-agnostic.
- ``bloom_build``: the filter IS a DataFrame of distinct set bit
  positions (<= m rows). One explode + one distinct; map-side
  combined. A position table beats a packed bitmap here because it
  stays declarative (broadcastable, persistable, unionable for
  incremental builds) and its size is bounded by m regardless of key
  count.
- ``bloom_probe``: per probe row, explode the (deduped) positions,
  broadcast-semi-join against the bit table, and compare the hit
  count to the position count — member iff EVERY position is set.
  The big probe side is touched exactly once, with only a k-way row
  amplification and zero shuffle of probe payloads (the count agg is
  on the probe key, map-side combinable).

False positives are inherent (classic Bloom guarantee: no false
negatives); pick m ~ 10-15 bits/key for ~1% FP at k=3. At 100 TB the
bit table for 1e9 keys at 14 bits/key is <= 2^34 positions but only
the SET ones materialize (~6e9 rows worst case) — for that regime
build per-partition filters or raise to a proper bitmap sink; for the
crawl-frontier sizes this targets (1e6-1e8 keys) the position table
broadcasts fine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sslr_spark.functions.hashing import h60, h60_sql


def bloom_positions(key: Column, m: int, k: int, seed: str = "bloom") -> Column:
    """Array of k bit positions in [0, m) for one key.

    Null keys coalesce to the sentinel BEFORE hashing (same
    convention as sampling.split_bucket: Spark's concat_ws drops
    nulls, DuckDB's concat keeps separators — coalescing first keeps
    the two engines bit-identical)."""
    safe = F.coalesce(key.cast("string"), F.lit("\x00"))
    return F.array(
        *[
            F.pmod(
                h60(F.concat_ws(":", F.lit(seed), F.lit(str(i)), safe)),
                F.lit(m),
            )
            for i in range(k)
        ]
    )


def bloom_positions_sql(
    key_expr: str, m: int, k: int, seed: str = "bloom"
) -> list[str]:
    """DuckDB spelling of :func:`bloom_positions` (one expr per hash)."""
    safe = f"coalesce(cast({key_expr} as varchar), chr(0))"
    out = []
    for i in range(k):
        concat = f"concat('{seed}', ':', '{i}', ':', {safe})"
        out.append(f"{h60_sql(concat)} % {m}")
    return out


def bloom_build(
    df: DataFrame, key_col: str, m: int, k: int, seed: str = "bloom"
) -> DataFrame:
    """Build the filter: DataFrame of distinct set positions (``pos``).

    <= m rows by construction; one pass over the keys (explode + a
    map-side-combined distinct on a long)."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), m, k, seed)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int,
    k: int,
    seed: str = "bloom",
) -> DataFrame:
    """Append a boolean ``bloom_member`` column: true iff every one of
    the key's k positions is set in ``bits``.

    Scale shape: ``bits`` (<= m rows of one long) is broadcast; the
    probe side explodes its DEDUPED positions (two hashes may collide
    mod m — comparing raw hit counts to k would then over- or
    under-count, so both sides count DISTINCT positions), semi-joins
    the broadcast, and aggregates hits per key. Honest cost
    accounting: attaching the per-key flag back costs ONE hash
    exchange of the probe rows (payload included) — the flag table has
    one row per distinct key, so it only broadcasts when the key space
    is small (AQE does this automatically). Callers that don't need
    flags on arbitrary payload rows should probe a
    ``select(key).distinct()`` projection and keep the join to
    themselves; callers that immediately filter (the
    incremental-dedup path) pay the exchange exactly once."""
    pos_arr = F.array_distinct(bloom_positions(F.col(key_col), m, k, seed))
    # internal null-safe key: plain equi-joins/groupBys drop null keys,
    # so all plumbing runs on the coalesced string form
    safe_key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    keyed = df.select(
        safe_key.alias("__k"), F.size(pos_arr).alias("__np"), pos_arr.alias("__pos")
    ).distinct()
    hits = (
        keyed.select("__k", F.explode("__pos").alias("pos"))
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    flags = (
        keyed.join(hits, "__k", "left")
        .na.fill(0, ["__hits"])
        .select("__k", (F.col("__hits") == F.col("__np")).alias("bloom_member"))
    )
    return (
        df.withColumn("__k", safe_key)
        .join(flags, "__k", "left")
        .drop("__k")
    )
