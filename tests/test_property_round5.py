"""Property tests for the round-5 operator invariants: PPJoin prefix
losslessness (including float-ceiling-hostile thresholds), the
winnowing shared-run guarantee, and per-group cap append-stability."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small word pool => plenty of genuine overlaps between random docs
WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _doc(rng_words):
    return " ".join(rng_words)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=3, max_size=14),
        min_size=2,
        max_size=8,
    ),
    # includes thresholds where IEEE ceil(t*n) overshoots (0.55, 0.28,
    # 0.14, 0.07) alongside benign ones
    threshold=st.sampled_from([0.07, 0.14, 0.28, 0.3, 0.55, 0.5, 0.8]),
)
@pytest.mark.slow
def test_prefix_join_lossless_random(spark, docs, threshold):
    from sslr_spark.functions.dedup import (
        cache_scope,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    df = spark.createDataFrame(
        [(i, _doc(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    with cache_scope():
        plain = {(r.doc_a, r.doc_b): r.jaccard for r in
                 ngram_jaccard_pairs(df, threshold=threshold).collect()}
        pref = {(r.doc_a, r.doc_b): r.jaccard for r in
                ngram_jaccard_pairs_prefix(
                    df, threshold=threshold).collect()}
    assert plain == pref


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    head_a=st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
    head_b=st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
    run=st.lists(
        st.sampled_from(["r1", "r2", "r3", "r4", "r5", "r6"]),
        min_size=8, max_size=12,  # >= k + w - 1 = 8
    ),
)
def test_winnowing_guarantee_random(spark, head_a, head_b, run):
    """Any shared token run of length >= k + w - 1 must leave at
    least one identical fingerprint in both docs — the Schleimer
    guarantee the span operators rest on."""
    from sslr_spark.functions.dedup import winnow_fingerprints

    a = " ".join(head_a + run)
    b = " ".join(head_b + run + ["tailb"])
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fps = {1: set(), 2: set()}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], (a, b)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.sets(st.integers(0, 400), min_size=20, max_size=60),
    extra=st.sets(st.integers(1000, 1400), min_size=0, max_size=30),
    cap=st.integers(3, 12),
)
def test_source_cap_append_stable_random(spark, base, extra, cap):
    """Appending rows to OTHER groups never changes a group's kept
    set, and appending to the SAME group only ever removes kept rows
    (never resurrects an unkept one)."""
    from sslr_spark.functions.sampling import source_cap

    df = spark.createDataFrame(
        [(i, "g1") for i in sorted(base)], "doc_id long, source string"
    )
    kept1 = {r.doc_id for r in source_cap(df, "source", cap).collect()}
    # append a foreign group
    df2 = df.unionByName(spark.createDataFrame(
        [(i, "g2") for i in sorted(extra)] or [(9999, "g2")],
        "doc_id long, source string"))
    kept2 = {r.doc_id for r in source_cap(df2, "source", cap)
             .filter("source = 'g1'").collect()}
    assert kept1 == kept2
    # append into the SAME group: kept set can only shrink-or-swap
    # toward better hashes, never grow past cap, never resurrect
    df3 = df.unionByName(spark.createDataFrame(
        [(i + 500, "g1") for i in sorted(extra)] or [(9998, "g1")],
        "doc_id long, source string"))
    kept3 = {r.doc_id for r in source_cap(df3, "source", cap).collect()}
    assert len(kept3) == min(cap, len(base) + max(len(extra), 1))
    # old rows that survived the bigger corpus were kept before too
    assert (kept3 & set(base)) <= kept1
