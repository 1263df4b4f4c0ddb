"""Distinct-count stats: exact vs HLL++ sketch (functions/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sslr_spark.functions.sketches import distinct_stats


def test_exact_distinct_counts(spark):
    df = spark.createDataFrame(
        [(g, v % 7) for g in ("a", "b") for v in range(50)],
        "g string, v long",
    )
    out = {r.g: (r.n_rows, r.n_distinct) for r in
           distinct_stats(df, ["g"], "v").collect()}
    assert out == {"a": (50, 7), "b": (50, 7)}


def test_hll_within_error_bound(spark):
    # 20k distinct values per group; HLL++ rsd=0.05 -> 3 sigma = 15%
    df = spark.range(0, 40000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    exact = {r.g: r.n_distinct for r in
             distinct_stats(df, ["g"], "v").collect()}
    approx = {r.g: r.n_distinct for r in
              distinct_stats(df, ["g"], "v", exact=False, rsd=0.05).collect()}
    for g, e in exact.items():
        assert abs(approx[g] - e) / e <= 0.15


def test_hll_plan_is_single_pass(spark):
    """The sketch path must NOT expand to the two-phase distinct
    aggregate: one partial/final pair, no expand, no second shuffle."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    plan = distinct_stats(df, ["g"], "v", exact=False)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert plan.count("Exchange") == 1


def test_quantile_exact_vs_approx(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    from sslr_spark.functions.sketches import quantile_stats

    exact = {r.g: (r.q_500, r.q_950) for r in
             quantile_stats(df, ["g"], "v", [0.5, 0.95]).collect()}
    approx = {r.g: (r.q_500, r.q_950) for r in
              quantile_stats(df, ["g"], "v", [0.5, 0.95],
                             exact=False, accuracy=10000).collect()}
    for g in exact:
        for e, a in zip(exact[g], approx[g]):
            # rank error <= 1/accuracy => value error tiny on a uniform
            # 0..10k ramp; allow 1% of the range
            assert abs(a - e) <= 100, (g, e, a)


def test_heavy_hitters_exact_and_sketch(spark):
    rows = (["hot"] * 500) + (["warm"] * 100) + [f"cold{i}" for i in range(400)]
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    from sslr_spark.functions.sketches import heavy_hitters

    top = heavy_hitters(df, "v", k=2).collect()
    assert [(r.value, r.cnt) for r in top] == [("hot", 500), ("warm", 100)]
    # sketch: superset of true frequent values, never misses one
    sketch_vals = {r.value for r in
                   heavy_hitters(df, "v", exact=False, support=0.09).collect()}
    assert {"hot", "warm"} <= sketch_vals


def test_cms_merge_equals_direct_build_and_never_underestimates(spark):
    """CMS invariants: (1) summing per-shard register builds equals
    one direct build (associativity — what makes the sketch
    cross-shard mergeable); (2) point estimates never underestimate
    the true count; (3) estimates are exact when no value collides on
    all depth rows (checked against truth on a skewed corpus)."""
    from pyspark.sql import functions as F

    from sslr_spark.functions.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    rows = [("g", i % 4, f"v{i % 23}") for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, sh int, v string")

    merged = cms_merge(cms_build(df, ["g", "sh"], "v"), ["g"])
    direct = cms_build(df, ["g"], "v")
    m = {(r.row, r.col): r.cnt for r in merged.collect()}
    d = {(r.row, r.col): r.cnt for r in direct.collect()}
    assert m == d

    items = df.select("g", "v").distinct()
    est = {
        r.v: r.est
        for r in cms_query(merged, items, ["g"], "v").collect()
    }
    true = {
        r.v: r.cnt
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert set(est) == set(true)
    for v, t in true.items():
        assert est[v] >= t  # the CMS upper-bound guarantee
    # 23 distinct values in 4x256 cells: collisions on ALL 4 rows are
    # effectively impossible — estimates should be exact here
    assert est == true
