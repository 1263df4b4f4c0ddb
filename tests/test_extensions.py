"""Tests for the training-data-pipeline extension operators
(dedup / similarity / text / multimodal) on the sf0.001 tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_simhash_blocking_equals_naive(spark, docs):
    """Pigeonhole blocking must lose no pairs vs the quadratic scan."""
    from sslr_spark.functions.dedup import simhash, simhash_pairs

    blocked = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(docs, max_hamming=4).collect()
    }
    s = simhash(docs)
    a, b = s.alias("a"), s.alias("b")
    naive = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
        .collect()
    }
    assert blocked == naive


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    """Every truly-similar pair (jaccard >= 0.5) must be an LSH
    candidate with 4x4 bands at these parameters; and all reported
    jaccards must be correct wrt the exact pair computation."""
    from sslr_spark.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.02).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.02).collect()
    }
    for pair, j in exact.items():
        if j >= 0.5:
            assert pair in lsh, f"high-jaccard pair {pair} missed by LSH"
    for pair, j in lsh.items():
        assert exact.get(pair) == pytest.approx(j), pair


def test_exact_dedup_detects_planted_duplicates(spark, docs):
    from sslr_spark.functions.dedup import exact_dedup_groups

    doubled = docs.unionByName(
        docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    groups = exact_dedup_groups(doubled)
    assert groups.filter(F.col("n_docs") >= 2).count() >= 5
    # keeper is always the smallest doc_id
    assert groups.filter(F.col("keep_id") >= 1_000_000).count() == 0


def test_topk_lsh_subset_of_bruteforce_universe(spark, emb):
    from sslr_spark.functions.similarity import topk_bruteforce, topk_lsh

    exact = topk_bruteforce(emb, query_vec_id=0, k=10).collect()
    approx = topk_lsh(emb, query_vec_id=0, k=10, n_bits=6).collect()
    assert len(exact) == 10
    assert 0 < len(approx) <= 10
    # approximate scores can never beat the exact best
    assert approx[0].cos_sim <= exact[0].cos_sim + 1e-9


def test_decode_stub_plumbing(spark, docs):
    from sslr_spark.functions.multimodal import decode_metadata, with_binary_payload

    out = decode_metadata(with_binary_payload(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r.n_bytes > 0 and len(r.content_fp) == 32
    assert 64 <= r.width < 256 and 64 <= r.height < 256 and 1 <= r.n_frames <= 30
    # deterministic: same input -> same fake dimensions
    again = decode_metadata(with_binary_payload(docs)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_lang_id_and_quality_shapes(spark, docs):
    from sslr_spark.functions.text import lang_id, quality_metrics

    n = docs.count()
    li = lang_id(docs)
    assert li.count() == n
    assert set(li.select("pred_lang").distinct().toPandas()["pred_lang"]) <= {
        "en", "fr", "de", "es", "zh", "und",
    }
    qm = quality_metrics(docs).collect()
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in qm)
    assert all(r.n_subtokens >= r.n_tokens for r in qm)
