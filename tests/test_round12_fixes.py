"""Round 12 fixes: ADVICE r11 items + optimization-variant equivalence.

Every optimization knob this round introduces must be result-neutral;
these tests pin that, plus the two ADVICE r11 engine items and the
new opt-in doc_id-unique contract guard.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "pack my box with five dozen liquor jugs"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "the quick brown fox jumps over the lazy dog again today"),
]


class TestDocIdContractGuard:
    def test_duplicate_doc_id_fails_loudly_in_debug_mode(self, spark, monkeypatch):
        from sslr_spark.functions.dedup import shingles

        monkeypatch.setenv("SSLR_DEBUG_CONTRACTS", "1")
        df = _docs(spark, DOCS + [(1, "split tail of document one")])
        with pytest.raises(AssertionError, match="doc_id-unique contract"):
            shingles(df).count()

    def test_unique_doc_ids_pass_in_debug_mode(self, spark, monkeypatch):
        from sslr_spark.functions.dedup import shingles

        monkeypatch.setenv("SSLR_DEBUG_CONTRACTS", "1")
        assert shingles(_docs(spark, DOCS)).count() > 0

    def test_guard_off_by_default(self, spark, monkeypatch):
        from sslr_spark.functions.dedup import shingles

        monkeypatch.delenv("SSLR_DEBUG_CONTRACTS", raising=False)
        df = _docs(spark, DOCS + [(1, "split tail of document one")])
        # no guard: the (documented) silent-wrong-multiplicity case
        shingles(df).count()


class TestMaxDocFreqZeroMeansOff:
    """ADVICE r11 item 2: max_shingle_doc_freq=0 must mean 'cap off'
    across the whole dedup family, not an empty result."""

    def test_prefix_generator_treats_zero_as_no_cap(self, spark):
        from sslr_spark.functions.dedup import ngram_jaccard_pairs_prefix

        df = _docs(spark, DOCS)
        with_zero = ngram_jaccard_pairs_prefix(
            df, threshold=0.5, max_shingle_doc_freq=0
        ).collect()
        with_none = ngram_jaccard_pairs_prefix(
            df, threshold=0.5, max_shingle_doc_freq=None
        ).collect()
        assert sorted(map(tuple, with_zero)) == sorted(map(tuple, with_none))
        assert with_zero  # docs 1/2/5 share most shingles


class TestDoubleArrayLiteral:
    def test_finite_values_round_trip_bitwise(self, spark):
        from sslr_spark.functions.similarity import _double_array_literal

        vals = [0.1, -3.7e300, 5e-324, 0.0, 123456.789]
        got = (
            spark.range(1)
            .select(_double_array_literal(vals).alias("a"))
            .first()["a"]
        )
        assert got == vals

    def test_non_finite_values_guard_to_lit(self, spark):
        from sslr_spark.functions.similarity import _double_array_literal

        vals = [1.0, float("inf"), float("-inf"), float("nan")]
        got = (
            spark.range(1)
            .select(_double_array_literal(vals).alias("a"))
            .first()["a"]
        )
        assert got[0] == 1.0
        assert got[1] == float("inf") and got[2] == float("-inf")
        assert math.isnan(got[3])


class TestSimhashFloorVariantsIdentical:
    """$SSLR_SIMHASH_FLOOR placements must be fingerprint-identical —
    the knob only moves WHERE the parallelism floor applies."""

    @pytest.mark.parametrize("mode", ["off", "hash"])
    def test_fingerprints_equal(self, spark, monkeypatch, mode):
        from sslr_spark.functions.dedup import simhash

        df = _docs(spark, DOCS)
        monkeypatch.setenv("SSLR_SIMHASH_FLOOR", "text")
        base = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
        monkeypatch.setenv("SSLR_SIMHASH_FLOOR", mode)
        got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
        assert got == base


class TestGateHistVariantsIdentical:
    """$SSLR_GATE_HIST materialization modes must be result-identical —
    the knob only changes whether the bounded histogram is pinned."""

    @pytest.mark.parametrize("mode", ["plain", "ckpt", "scored"])
    def test_quantile_gate_results_equal(self, spark, monkeypatch, mode):
        from sslr_spark.functions import dedup as DD
        from sslr_spark.functions.quality_model import (
            score_bp_quantile_gate,
        )

        scored = spark.createDataFrame(
            [(i, "en" if i % 3 else "de", (i * 37) % 100) for i in range(60)],
            "doc_id long, lang string, score_bp int",
        )
        monkeypatch.setenv("SSLR_GATE_HIST", "plain")
        base = sorted(
            map(tuple, score_bp_quantile_gate(scored, 0.5, "lang").collect())
        )
        monkeypatch.setenv("SSLR_GATE_HIST", mode)
        try:
            got = sorted(
                map(
                    tuple,
                    score_bp_quantile_gate(scored, 0.5, "lang").collect(),
                )
            )
        finally:
            DD.release_caches()  # 'scored' mode registers a persist
        assert got == base
        assert len(base) >= 60 * 0.5 * 0.9  # sanity: gate kept ~half


class TestCcRoundVariantsIdentical:
    """$SSLR_CC_ROUND forms (fused adjacency-array vs r11 join rounds)
    must produce identical (doc_id, cluster_id) labels — the knob only
    changes the physical round shape."""

    GRAPHS = {
        "chain": [(i, i + 1) for i in range(1, 30)],
        "star_min_centered": [(1, i) for i in range(2, 20)],
        "star_max_centered": [(i, 100) for i in range(2, 20)],
        "self_loop": [(5, 5), (5, 6)],
        "multi_component": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
        "dup_and_reversed_edges": [(2, 1), (1, 2), (3, 2), (2, 3), (7, 9)],
    }

    @pytest.mark.parametrize("name", sorted(GRAPHS))
    def test_labels_equal(self, spark, monkeypatch, name):
        from sslr_spark.functions.dedup import dup_clusters_star

        pairs = spark.createDataFrame(
            self.GRAPHS[name], "doc_a long, doc_b long"
        )
        monkeypatch.setenv("SSLR_CC_ROUND", "join")
        base = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        monkeypatch.setenv("SSLR_CC_ROUND", "fused")
        got = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        assert got == base
        # every cluster_id is its component's minimum member
        by_cluster: dict = {}
        for doc, c in got:
            by_cluster.setdefault(c, []).append(doc)
        assert all(c == min(docs) for c, docs in by_cluster.items())

    def test_labels_equal_random_graph(self, spark, monkeypatch):
        import random

        from sslr_spark.functions.dedup import dup_clusters_star

        rng = random.Random(7)
        edges = [
            (rng.randint(1, 150), rng.randint(1, 150)) for _ in range(250)
        ]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        monkeypatch.setenv("SSLR_CC_ROUND", "join")
        base = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        monkeypatch.setenv("SSLR_CC_ROUND", "fused")
        got = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        assert got == base

    def test_labels_equal_string_ids(self, spark, monkeypatch):
        from sslr_spark.functions.dedup import dup_clusters_star

        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")],
            "doc_a string, doc_b string",
        )
        monkeypatch.setenv("SSLR_CC_ROUND", "join")
        base = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        monkeypatch.setenv("SSLR_CC_ROUND", "fused")
        got = sorted(map(tuple, dup_clusters_star(pairs).collect()))
        assert got == base
