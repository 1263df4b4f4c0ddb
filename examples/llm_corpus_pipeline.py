"""End-to-end LLM training-corpus pipeline on the sslr_spark operators.

Composes the extension operators into the standard curation flow:

  JSONL drop ingest (corrupt lines quarantined, never silent) ->
  duplicate-coverage health scan -> quality funnel ->
  exact + MinHash dedup -> incremental dedup vs the accepted corpus ->
  decontamination -> perplexity-proxy scoring -> chunk -> pack ->
  gzip JSONL export (the training-stack handoff)

Run:  python examples/llm_corpus_pipeline.py [sf_dir]
(default sf_dir /root/testdata/sf0.01; prints per-stage counts and
writes nothing outside .bench_tmp/).

Every stage is a pure DataFrame transform — at cluster scale the same
script runs unchanged; only the session builder and paths move.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sslr_spark.functions.chunking import (  # noqa: E402
    chunk_text,
    filter_funnel,
    pack_token_budget,
)
from sslr_spark.functions.dedup import (  # noqa: E402
    contamination_rates,
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from sslr_spark.functions.text import (  # noqa: E402
    mean_word_len,
    token_count,
    unigram_logprob,
)
from sslr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="llm_corpus_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # -1. Ingest: corpora arrive as JSONL drops (crawl exports, vendor
    #     deliveries). Stage one from the parquet fixture plus two
    #     corrupt lines, then ingest through the file-drop adapter —
    #     parse losses land in a quarantine, never vanish silently.
    import shutil

    from sslr_spark.sources.files import FilesDatabase, export_jsonl

    drop_root = os.path.join(REPO, ".bench_tmp", "example_drop")
    shutil.rmtree(drop_root, ignore_errors=True)
    os.makedirs(drop_root, exist_ok=True)
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.mode(
        "overwrite"
    ).json(os.path.join(drop_root, "documents"))
    with open(
        os.path.join(drop_root, "documents", "zz-mangled.jsonl"), "w"
    ) as fh:
        fh.write('{"doc_id": broken json\n{"truncated": \n')
    drop = FilesDatabase(spark, drop_root, fmt="jsonl")
    all_docs, rejects = drop.read_with_quarantine("documents")
    print(f"== ingest == {all_docs.count()} docs parsed, "
          f"{rejects.count()} corrupt lines quarantined")
    # src0 plays the PRIOR crawl (already accepted and shipped): it is
    # excluded from this ingest up front — running the funnel and the
    # pairwise dedup over rows that can never land would be pure waste
    prior = all_docs.filter(F.col("source") == "src0")
    # persisted: every stage below branches off this frame, and the
    # JSON parse at the base would otherwise re-run per action
    docs = all_docs.filter(F.col("source") != "src0").persist()

    # 0. Corpus-health scan: how duplicated is this crawl? (cheap
    #    per-doc signal, no pairwise work — decides whether the
    #    MinHash stage below is even worth running)
    from sslr_spark.functions.dedup import dup_ngram_coverage

    cov = dup_ngram_coverage(docs, n=5)
    health = cov.agg(
        F.round(F.avg("dup_coverage"), 4).alias("mean_cov"),
        F.sum((F.col("dup_coverage") > 0.5).cast("int")).alias("mostly_dup"),
    ).first()
    print(f"== health == mean dup-5gram coverage {health['mean_cov']}, "
          f"docs >50% duplicated {health['mostly_dup']}")

    # 0a. Shared-substring exposure (winnowing): span-level copy-paste
    #     the doc-level Jaccard scan can't see
    from sslr_spark.functions.dedup import release_caches, shared_span_stats

    spans = shared_span_stats(docs).agg(
        F.avg("shared_ppm").cast("long").alias("mean_ppm"),
        F.sum((F.col("shared_ppm") > 500_000).cast("int")).alias("half_shared"),
    ).first()
    release_caches()
    print(f"== spans == mean shared-fingerprint ppm {spans['mean_ppm']}, "
          f"docs >50% shared spans {spans['half_shared']}")

    # 0c. Retrieval spot-check: BM25 top-5 for a probe query — the
    #     quick "what does the corpus say about X" tool reviewers use
    #     (over the persisted ingest frame: bm25 makes three passes —
    #     stats, doc frequencies, scoring — and a deep curated lineage
    #     would re-run the whole pipeline per pass)
    from sslr_spark.functions.text import bm25_topk

    top = bm25_topk(docs, ["spark", "join"], k=5).collect()
    print("== bm25 probe ==", [(r.doc_id, r.score_micros) for r in top])

    # 0b. Cross-source overlap: feeds that are re-crawls of each other
    #     (candidates for dropping a whole source before doc-level work)
    from sslr_spark.functions.dedup import source_overlap

    twins = (
        source_overlap(docs, "source")
        .orderBy(F.desc("jaccard"))
        .limit(3)
        .collect()
    )
    print("== top cross-source overlap ==")
    for r in twins:
        print(f"  {r.src_a} ~ {r.src_b}: {r.n_common} shared shingles, "
              f"jaccard={r.jaccard}")

    # 1. Quality funnel — one scan, per-stage survivor report. The
    #    Gopher rule battery (gopher_flags) runs as a separate report
    #    here because this synthetic corpus is shorter than Gopher's
    #    50-word floor; on a real crawl its `keep` IS the funnel gate.
    from sslr_spark.functions.text import gopher_flags

    g = gopher_flags(docs).agg(
        *[F.sum((~F.col(c)).cast("int")).alias(c) for c in (
            "ok_word_count", "ok_mean_word_len", "ok_bullets",
            "ok_ellipsis", "ok_alpha", "ok_symbols", "ok_stopwords")]
    ).first()
    print("== gopher rule failures == " + ", ".join(
        f"{k}={v}" for k, v in g.asDict().items()))

    t = F.col("text")
    funnel = filter_funnel(
        docs,
        [
            ("min_chars", F.col("n_chars") >= 120),
            ("min_tokens", token_count(t) >= 25),
            ("word_shape", (mean_word_len(t) >= 2.0) & (mean_word_len(t) <= 12.0)),
        ],
    )
    print("== funnel ==")
    for r in funnel.collect():
        print(f"  {r.stage} {r.stage_name:<12} in={r.n_in:<6} out={r.n_out:<6} dropped={r.n_dropped}")
    kept = docs.filter(
        (F.col("n_chars") >= 120)
        & (token_count(t) >= 25)
        & (mean_word_len(t) >= 2.0)
        & (mean_word_len(t) <= 12.0)
    )

    # 2. Exact dedup (hash groups -> keeper rows)
    keepers = exact_dedup_groups(kept).select(
        F.col("keep_id").alias("doc_id")
    )
    kept = kept.join(F.broadcast(keepers), "doc_id", "left_semi")

    # 3. Near-dup clusters via MinHash+LSH -> connected components;
    #    keep the highest-quality member of each cluster (most chars,
    #    ties to smallest id) instead of the blind min-id policy
    from sslr_spark.functions.dedup import cluster_keep_best, dup_clusters_star

    pairs = minhash_lsh_pairs(kept, jaccard_threshold=0.5)
    clusters = dup_clusters_star(pairs)
    best = cluster_keep_best(clusters, kept, F.col("n_chars"))
    losers = (
        clusters.join(best.select("cluster_id", "keep_id"), "cluster_id")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    kept = kept.join(F.broadcast(losers), "doc_id", "left_anti")

    # 3b. Incremental dedup against the already-accepted prior crawl:
    #     Bloom prefilter, exact verify; this ingest skips every doc
    #     whose content already shipped
    from sslr_spark.functions.dedup import incremental_exact_dedup

    flagged = incremental_exact_dedup(kept, prior)
    # persist the dedup survivor set: stages 4-6 each branch off it,
    # and its lineage (funnel -> exact dedup -> LSH clusters -> bloom
    # verify) is the expensive half of the pipeline
    kept = (
        flagged.filter(~F.col("in_corpus")).drop("in_corpus").persist()
    )

    # 4. Eval-set decontamination: drop docs overlapping a (here:
    #    simulated) eval set above 80% 8-gram overlap
    eval_set = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    rates = contamination_rates(kept, eval_set)
    dirty = rates.filter(F.col("contamination") > 0.8).select("doc_id")
    kept = kept.join(F.broadcast(dirty), "doc_id", "left_anti")

    # 5. Perplexity-proxy scoring: drop the bottom decile
    scored = unigram_logprob(kept)
    cutoff = scored.approxQuantile("mean_logprob", [0.1], 0.01)[0]
    good_ids = scored.filter(F.col("mean_logprob") >= cutoff).select("doc_id")
    # persist the final curated set: the leakage-safe split's internal
    # probe passes and the chunk/pack stages each branch off it, and
    # its tail lineage (logprob vocabulary + scoring) is several
    # aggregation passes that would otherwise re-run per consumer
    kept = kept.join(good_ids, "doc_id", "left_semi").persist()

    # 5b. Model-based quality score (fixed published weights — the
    #     serving path of the MLlib-trained classifier); report only
    from sslr_spark.functions.quality_model import quality_score

    mq = quality_score(
        kept, [0.02, -0.005, 3.0, 0.15], -2.0
    ).agg(F.round(F.avg("score"), 4).alias("mean_q")).first()
    print(f"== model quality == mean classifier score {mq['mean_q']}")

    # 5c. Leakage-free split of the curated corpus: holdout docs with
    #     a near-dup in another split join their twin's split
    from sslr_spark.functions.sampling import leakage_safe_split

    # persisted: consumed by the report below AND the train filter
    # feeding chunk/pack — and it is narrow (doc_id + split), far
    # cheaper to cache than the full-text frame it assigns
    split = leakage_safe_split(
        kept, weights={"train": 0.9, "val": 0.05, "test": 0.05},
        holdout="test", jaccard_threshold=0.3,
    ).persist()
    for r in split.groupBy("split").count().orderBy("split").collect():
        print(f"  split {r['split']:<6} {r['count']}")
    kept = kept.join(
        split.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 5d. Per-source cap: no hot feed dominates the curated corpus
    from sslr_spark.functions.sampling import source_cap

    before = kept.count()
    kept = source_cap(kept, "source", 30)
    print(f"== source cap == {before} -> {kept.count()} (max 30/source)")

    # 6. Chunk long documents, then pack into token-budget batches
    chunks = chunk_text(kept, chunk_chars=512, overlap=64)
    packed = pack_token_budget(
        chunks.withColumn("text", F.col("chunk")),
        id_col="doc_id",
        tokens=token_count(F.col("chunk")),
        budget=256,
        n_shards=8,
        shard=F.pmod(F.xxhash64("doc_id", "chunk_idx"), F.lit(8)),
    )

    print("== pipeline ==")
    print(f"  ingest docs       {docs.count()} (+{prior.count()} prior-crawl, excluded)")
    print(f"  after funnel+dedup+decontam+score {kept.count()}")
    print(f"  training chunks   {chunks.count()}")
    batches = packed.select("shard", "batch_id").distinct().count()
    print(f"  packed batches    {batches}")

    # 7. Hand off: gzip JSONL, the format the training stack ingests,
    #    plus a shard manifest over the chunk set. NOTE the manifest's
    #    shards are HASH shards (h60 of the key), not the physical
    #    part files (coalesce packs those arbitrarily): the trainer
    #    verifies by RELOADING the export, recomputing the same hash
    #    shards, and comparing counts + commutative checksums — a
    #    partition-layout-independent integrity check.
    out_dir = os.path.join(drop_root, "train_chunks")
    export_jsonl(
        chunks.select("doc_id", "chunk_idx", "chunk"), out_dir, coalesce=4
    )
    n_parts = len([f for f in os.listdir(out_dir) if f.startswith("part-")])
    print(f"  exported          {n_parts} gzip JSONL part files -> {out_dir}")

    from sslr_spark.functions.sampling import shard_manifest

    man = shard_manifest(
        chunks.withColumnRenamed("chunk", "text"), 4,
        content_cols=["doc_id", "chunk_idx", "text"],
    ).orderBy("shard").collect()
    print("== shard manifest ==")
    for r in man:
        print(f"  shard {r.shard}: rows={r.n_rows} keys={r.n_keys} "
              f"checksum={r.content_sum}")
    spark.stop()


if __name__ == "__main__":
    main()
