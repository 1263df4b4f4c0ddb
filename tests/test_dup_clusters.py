"""Connected-component dup-cluster resolution tests."""

from __future__ import annotations

from sslr_spark.functions.dedup import dup_clusters


def test_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {(r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_chain_converges(spark):
    # a 30-node chain needs ~log-diameter passes with doubling — our
    # simple propagation needs diameter passes; keep under max_iterations
    n = 18
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = dict(
        (r.doc_id, r.cluster_id) for r in dup_clusters(pairs, max_iterations=25).collect()
    )
    assert all(v == 0 for v in got.values())
    assert len(got) == n + 1


def test_keeper_is_min_id(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9)], "doc_a long, doc_b long")
    got = dict((r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect())
    assert got == {3: 3, 7: 3, 9: 3}
