"""Skew utilities: salted join and two-stage distinct must equal their
naive counterparts exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sslr_spark.functions.skew import salted_join, two_stage_distinct_count


def test_salted_join_equals_plain_join(spark):
    # skewed: 90% of rows share user_id 7
    rows = [(7 if i % 10 else i, f"p{i}") for i in range(2000)]
    skewed = spark.createDataFrame(rows, "user_id long, payload string")
    dim = spark.createDataFrame(
        [(i, f"u{i}") for i in range(200)], "user_id long, name string"
    )
    plain = {(r.user_id, r.payload, r.name) for r in skewed.join(dim, "user_id").collect()}
    salted = {
        (r.user_id, r.payload, r.name)
        for r in salted_join(skewed, dim, ["user_id"], n_salts=8).collect()
    }
    assert salted == plain and len(plain) > 0


def test_two_stage_distinct_count(spark):
    ev = spark.createDataFrame(
        [(i % 5, f"s{i % 37}") for i in range(5000)], "k long, v string"
    )
    naive = {
        (r.k, r.n) for r in ev.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    staged = {
        (r.k, r.n_distinct)
        for r in two_stage_distinct_count(ev, ["k"], "v").collect()
    }
    assert staged == naive


def test_oversize_block_guard_excludes_and_warns(spark):
    """Blocked pair generators: a runaway block (90% of rows in one
    label) must be excluded from the pair space with a RuntimeWarning,
    not ground through quadratically; normal blocks are unaffected."""
    import warnings

    from sslr_spark.functions.dedup import embedding_near_dup_pairs
    from sslr_spark.functions.similarity import all_pairs_topk_blocked

    rows = [
        (i, [float(i % 7), 1.0], "mega" if i % 10 else f"b{i % 5}")
        for i in range(1000)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        pairs = embedding_near_dup_pairs(
            df, threshold=0.0, max_block_size=200
        ).collect()
    assert any("mega" in str(w.message) for w in rec)
    blocks = {r[0] for r in df.join(
        spark.createDataFrame([(r.vec_a,) for r in pairs], "vec_id long"),
        "vec_id").select("label").distinct().collect()}
    assert "mega" not in blocks and len(pairs) > 0

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        knn = all_pairs_topk_blocked(df, k=2, max_block_size=200).collect()
    assert any("mega" in str(w.message) for w in rec)
    assert len(knn) > 0

    # under the limit: no warning, identical results to guard disabled
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        small = df.filter(F.col("label") != "mega")
        a = {(r.vec_a, r.vec_b) for r in embedding_near_dup_pairs(
            small, threshold=0.0, max_block_size=200).collect()}
        b = {(r.vec_a, r.vec_b) for r in embedding_near_dup_pairs(
            small, threshold=0.0, max_block_size=None).collect()}
    # only guard warnings matter here — Spark may emit unrelated ones
    assert not any("max_block_size" in str(w.message) for w in rec)
    assert a == b
