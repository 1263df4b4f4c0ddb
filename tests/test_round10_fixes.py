"""Round-10 ADVICE fixes (ADVICE.md r9, all low severity).

Each test pins one fix:
  1. curriculum_tiers NULL-score handling (excluded by default,
     sentinel tier via null_tier=..., boundaries never count NULLs);
  2. robots_allowed normalizes rules.host (mixed-case / :port rules
     corpora no longer fail open to allowed=true);
  3. bucketed_pair deterministic table names (repeated calls reclaim
     catalog entries instead of accumulating uuid tables);
  4. topk_matryoshka zero-norm guard (sentinel micros instead of
     NaN/NULL ordering divergence between Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---- 1. curriculum_tiers NULL scores --------------------------------


def _docs_with_nulls(spark):
    rows = [(i, float(i % 7) if i % 5 else None) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_curriculum_null_scores_excluded_by_default(spark):
    from sslr_spark.functions.sampling import curriculum_tiers

    df = _docs_with_nulls(spark)
    out = curriculum_tiers(df, "score", n_tiers=4)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {i for i in range(40) if i % 5}  # NULL rows dropped
    assert out.filter(F.col("tier").isNull()).count() == 0


def test_curriculum_null_tier_sentinel_routes_nulls(spark):
    from sslr_spark.functions.sampling import curriculum_tiers

    df = _docs_with_nulls(spark)
    out = curriculum_tiers(df, "score", n_tiers=4, null_tier=-1)
    rows = {r.doc_id: r.tier for r in out.collect()}
    assert set(rows) == set(range(40))  # every row survives
    for i in range(0, 40, 5):
        assert rows[i] == -1  # NULL scores land on the sentinel tier
    # non-null rows get real tiers, and the sentinel rows still carry
    # a deterministic order_key
    assert all(0 <= t < 4 for d, t in rows.items() if d % 5)
    ok = {r.doc_id: r.order_key for r in out.collect()}
    out2 = curriculum_tiers(df, "score", n_tiers=4, null_tier=-1)
    assert ok == {r.doc_id: r.order_key for r in out2.collect()}


def test_curriculum_boundaries_ignore_null_rows(spark):
    """Tier boundaries must be computed over non-NULL rows only: the
    same non-null data with extra NULL rows appended yields identical
    tiers for the non-null ids."""
    from sslr_spark.functions.sampling import curriculum_tiers

    clean = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "doc_id long, score double"
    )
    noisy = clean.unionByName(
        spark.createDataFrame(
            [(100 + i, None) for i in range(30)],
            "doc_id long, score double",
        )
    )
    t_clean = {
        r.doc_id: r.tier
        for r in curriculum_tiers(clean, "score", n_tiers=4).collect()
    }
    t_noisy = {
        r.doc_id: r.tier
        for r in curriculum_tiers(noisy, "score", n_tiers=4).collect()
        if r.doc_id < 100
    }
    assert t_clean == t_noisy


# ---- 2. robots_allowed host normalization ----------------------------


def test_robots_allowed_normalizes_rules_host(spark):
    from sslr_spark.functions.robots import robots_allowed

    rules = spark.createDataFrame(
        [
            ("EXAMPLE.com", "/private", False),
            ("shop.example.org:8080", "/", False),
        ],
        "host string, path string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://example.com/private/x"),
            (2, "https://example.com/public"),
            (3, "http://shop.example.org/anything"),
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.allowed for r in robots_allowed(urls, rules).collect()
    }
    # pre-fix these all came back allowed=true (fail-open): the
    # mixed-case and port-suffixed rule hosts never matched
    assert got == {1: False, 2: True, 3: False}


# ---- 3. bucketed_pair deterministic names ----------------------------


def test_bucketed_pair_reclaims_catalog_entries(spark, tmp_path):
    from sslr_spark.sources.bucketed import bucketed_pair

    left = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    right = spark.range(100).select(
        F.col("id").alias("k2"), (F.col("id") * 3).alias("w")
    )

    def n_tables():
        return len(
            [
                t
                for t in spark.catalog.listTables()
                if t.name.startswith("bpair10_")
            ]
        )

    for i in range(3):  # bench-style repeated calls
        lt, rt = bucketed_pair(
            spark, left, right, "k", "k2",
            str(tmp_path / f"b{i}"), n_buckets=4,
            name_prefix="bpair10",
        )
        assert lt.join(rt, lt.k == rt.k2).count() == 100
        assert n_tables() == 2  # reclaimed, not accumulated

    # coexisting pairs still possible via explicit tags
    bucketed_pair(
        spark, left, right, "k", "k2", str(tmp_path / "tagged"),
        n_buckets=4, name_prefix="bpair10", tag="aux",
    )
    assert n_tables() == 4
    for t in list(spark.catalog.listTables()):
        if t.name.startswith("bpair10_"):
            spark.sql(f"drop table if exists {t.name}")


# ---- image_phash_clusters: linear output on dup-heavy corpora --------


def test_image_phash_clusters_linear_on_dup_heavy(spark):
    """VERDICT r9 item 3: a c-fold duplicate cluster must emit c
    (doc, cluster) rows and ZERO intra-cluster pairs at any stage —
    where the pair list materializes C(c, 2) rows."""
    from sslr_spark.functions.dedup import (
        image_phash_clusters,
        image_phash_near_dup,
    )

    # 300 docs: 200 share ONE hash (the aliased-pattern crawl shape),
    # 50 sit 2 bits away (near-dups of the big cluster), 50 spread
    # out via a 7x repetition code (pairwise Hamming >= 7 — mutually
    # far AND far from the big cluster, asserted below).
    def spread(i):
        v = 0
        for j in range(8):
            if (i >> j) & 1:
                v |= 0x7F << (7 * j)
        return v ^ 0x2A2A2A2A2A2A2A  # offset away from the big hash

    big, near = 0x00FF00FF00FF00, 0x00FF00FF00FF03
    rows = (
        [(i, big) for i in range(200)]
        + [(200 + i, near) for i in range(50)]
        + [(250 + i, spread(i)) for i in range(50)]
    )
    # brute-force union-find oracle over the distinct hashes
    hashes = sorted({h for _, h in rows})
    parent = {h: h for h in hashes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in hashes:
        for b in hashes:
            if a < b and bin(a ^ b).count("1") <= 4:
                parent[find(a)] = find(b)
    min_doc = {}
    for d, h in rows:
        r = find(h)
        min_doc[r] = min(min_doc.get(r, d), d)
    expected = {d: min_doc[find(h)] for d, h in rows}
    # fixture sanity: one big 250-doc component + 50 singletons
    assert sorted(
        sum(1 for v in expected.values() if v == c)
        for c in set(expected.values())
    ) == [1] * 50 + [250]

    df = spark.createDataFrame(rows, "doc_id long, phash long")
    out = image_phash_clusters(df, max_hamming=4).collect()
    assert len(out) == 300  # linear: one row per doc, never C(c,2)
    assert {r.doc_id: r.cluster_id for r in out} == expected

    # contrast: the calibration pair list on the same corpus is
    # quadratic — C(200,2) + 200*50 + C(50,2) intra-component pairs
    n_pairs = image_phash_near_dup(df, max_hamming=4).count()
    assert n_pairs == 200 * 199 // 2 + 200 * 50 + 50 * 49 // 2

    # and the structural fix: the hub edge set the clusters path
    # feeds to CC is ONE edge (two distinct hash values), not 31k
    hubs = df.groupBy("phash").agg(F.min("doc_id").alias("d"))
    hub_edges = image_phash_near_dup(
        hubs.select(F.col("d").alias("doc_id"), "phash"), max_hamming=4
    ).count()
    assert hub_edges == 1


# ---- 4. topk_matryoshka zero-norm sentinel ---------------------------


def test_matryoshka_zero_norm_prefix_ranks_last(spark):
    from sslr_spark.functions.similarity import topk_matryoshka

    sentinel = -(1 << 62)
    # vec 99 has a ZERO prefix (first 4 comps) but a nonzero tail —
    # its prefix cosine is 0/0; vec 98 is all-zero (full cosine 0/0
    # too). Both must rank LAST via the sentinel, never NaN.
    rows = [
        (i, [float(i + 1), 1.0, 0.5, 0.25, 1.0, 2.0]) for i in range(6)
    ]
    rows.append((99, [0.0, 0.0, 0.0, 0.0, 5.0, 5.0]))
    rows.append((98, [0.0] * 6))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = topk_matryoshka(
        df, query_vec_id=0, k=10, prefix_dim=4, shortlist=10
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[99].cos_prefix_micros == sentinel
    assert by_id[98].cos_prefix_micros == sentinel
    assert by_id[98].cos_full_micros == sentinel
    # zero-prefix vec still gets a REAL full-vector score in stage 2
    assert by_id[99].cos_full_micros > sentinel
    # sentinel rows sort last among the k results
    assert out[-1].vec_id == 98
    for r in out:
        assert r.cos_prefix_micros is not None
        assert r.cos_full_micros is not None


# ---- crawl_epoch composition: exchange audit --------------------------


def test_crawl_epoch_exchange_audit(spark):
    """VERDICT r9 item 5's plan criterion: no stage of the composed
    crawl epoch re-shuffles what a prior stage already partitioned.

    Audited over pre-materialized local inputs so the fixture
    contributes no exchanges of its own.  The DATA side (pages — the
    100 TB side — and the scheduled batch flowing through dedup and
    gates) must show each semantic re-key exactly once and the fetch
    join must NOT shuffle the store (the bounded top_n schedule
    broadcasts against it).  host-keyed exchanges all belong to the
    METADATA side: robots group-selection windows and the politeness
    window run over per-host rows (~1e8 hosts at web scale, not
    100 TB), so they are bounded, not forbidden."""
    import re
    from collections import Counter

    from sslr_spark.curation import crawl_epoch
    from tests.test_plans import plan_of

    cand = spark.createDataFrame(
        [(f"http://h{i % 5}.test/p/{i}",) for i in range(200)],
        "url string",
    )
    robots = spark.createDataFrame(
        [
            (f"h{i}.test", "User-agent: *\nDisallow: /x\nCrawl-delay: 2\n")
            for i in range(5)
        ],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            (
                f"http://h{i % 5}.test/p/{i}",
                f"<html><body><p>{'word ' * 60}{i}</p></body></html>",
            )
            for i in range(200)
        ],
        "url string, html string",
    )
    ranks = spark.createDataFrame(
        [(f"h{i}.test", 1000 * i) for i in range(5)],
        "host string, rank_micros long",
    )
    df = crawl_epoch(
        cand, robots, pages, ranks, per_host_cap=50, top_n=100, n_shards=4
    )
    plan = plan_of(df)
    specs = re.findall(r"Exchange hashpartitioning\(([^)\n]*)", plan)
    counts = Counter(s.split("#")[0].split(",")[0].strip() for s in specs)
    # data-side re-keys: exactly one exchange each for the dedup
    # collapses; url-keyed exchanges belong to the PRE-CUT candidate
    # set (robots verdict aggregate, frontier URL-set distinct — at
    # most those two), never the fetch store: the bounded top_n
    # schedule broadcasts against pages instead of shuffling it
    assert counts["canonical_url"] == 1, (counts, plan)
    assert counts["text"] == 1, (counts, plan)
    assert counts["url"] <= 2, (counts, plan)
    assert "BroadcastHashJoin" in plan
    # shard: partial/final aggregate + the n_shards-row cover join
    assert counts["shard"] <= 3, (counts, plan)
    # metadata side: robots parse windows + politeness window, bounded
    host_like = sum(
        n for k, n in counts.items() if k in ("host", "__rh", "__dh")
    )
    assert host_like <= 20, (counts, plan)
    # and the frontier cut must be a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan
    assert df.count() == 4


# ---- bpe_train: canonical reference comparison ------------------------


def test_bpe_train_matches_reference_merges(spark):
    """bpe_train vs an independent canonical implementation
    (Sennrich-style: re.sub over the pre-round space-joined word
    histogram), including the 'aaaa' repeated-run case where greedy
    merging must yield [aa, aa]."""
    import re
    from collections import Counter

    from sslr_spark.functions.text import bpe_train

    texts = [
        "low low low low lower lower newest newest",
        "newest newest newest widest widest aaaa lower low",
        "the quick brown fox jumps over the lazy dog aaaa",
    ]

    def reference(texts, n_merges):
        vocab = Counter()
        for t in texts:
            for w in t.lower().split():
                if re.fullmatch("[a-z]+", w) and len(w) >= 2:
                    vocab[w] += 1
        hist = {" ".join(w): c for w, c in vocab.items()}
        rules = []
        for rank in range(1, n_merges + 1):
            pairs = Counter()
            for s, c in hist.items():
                syms = s.split(" ")
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            (l, r), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            rules.append((rank, l, r, l + r, cnt))
            pat = re.compile(
                r"(?<!\S)" + re.escape(l) + " " + re.escape(r) + r"(?!\S)"
            )
            hist = {pat.sub(l + r, s): c for s, c in hist.items()}
        return rules

    expected = reference(texts, 5)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=5).orderBy("rank").collect()
    ]
    assert got == expected, (got, expected)


def test_bpe_tokenize_count_matches_reference(spark):
    """bpe_tokenize_count over the trained rules vs a Python
    reference applying the same rules in rank order; untrained words
    (non-[a-z]+ or single-char) pass through as one token."""
    import re
    from collections import Counter

    from sslr_spark.functions.text import bpe_train, bpe_tokenize_count

    texts = [
        "low low lower lowest newest new 42 a!",
        "newest newest widest wide new new lower",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=4)
    rules = [
        (r.lhs, r.rhs) for r in merges.orderBy("rank").collect()
    ]

    def segment(w):
        s = " ".join(w)
        for l, r in rules:
            s = re.sub(
                r"(?<!\S)" + re.escape(l) + " " + re.escape(r) + r"(?!\S)",
                l + r,
                s,
            )
        return len(s.split(" "))

    expected = {}
    for i, t in enumerate(texts):
        n = 0
        ws = t.lower().split()
        for w in ws:
            if re.fullmatch("[a-z]+", w) and len(w) >= 2:
                n += segment(w)
            else:
                n += 1
        expected[i] = (len(ws), n)

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_tokenize_count(df, merges).collect()
    }
    assert got == expected, (got, expected, rules)


# ---- edge cases: empty inputs through the r10 operators --------------


def test_bpe_train_empty_vocab_yields_no_rules(spark):
    """A corpus with no trainable words (digits/punct/single chars)
    produces an EMPTY rule table with the right schema, and
    tokenization falls back to one token per word."""
    from sslr_spark.functions.text import bpe_tokenize_count, bpe_train

    df = spark.createDataFrame(
        [(0, "42 7 ! x y"), (1, None)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=3)
    assert merges.columns == [
        "rank", "lhs", "rhs", "merged", "pair_count",
    ]
    assert merges.count() == 0
    counts = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_tokenize_count(df, merges).collect()
    }
    assert counts == {0: (5, 5)}  # doc 1 has no words -> no row


def test_crawl_epoch_empty_candidates_yields_zero_manifest(spark):
    """No candidate URLs -> the manifest still emits one explicit
    zero row per shard (the shard_manifest completeness contract)."""
    from sslr_spark.curation import crawl_epoch

    empty = spark.createDataFrame([], "url string")
    robots = spark.createDataFrame(
        [("h.test", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame([], "url string, html string")
    ranks = spark.createDataFrame([], "host string, rank_micros long")
    out = crawl_epoch(empty, robots, pages, ranks, n_shards=4).collect()
    assert len(out) == 4
    assert all(r.n_rows == 0 and r.content_sum == 0 for r in out)


def test_crawl_epoch_no_robots_rules_allows_everything(spark):
    """An empty robots corpus fails OPEN by design (no rules = no
    restrictions): every candidate flows to the frontier."""
    from pyspark.sql import functions as F

    from sslr_spark.curation import crawl_epoch

    cand = spark.createDataFrame(
        [(f"http://h.test/p/{i}",) for i in range(5)], "url string"
    )
    robots = spark.createDataFrame([], "host string, robots_txt string")
    # body must PASS the gopher gate: >= 50 words, sane word shape,
    # >= 2 distinct stopwords
    body = "the quick brown fox jumps over a lazy dog and runs to it " * 5
    pages = cand.select(
        "url",
        F.concat(
            F.lit("<html><body><p>"),
            F.lit(body),
            F.col("url"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    ranks = spark.createDataFrame([], "host string, rank_micros long")
    out = crawl_epoch(cand, robots, pages, ranks, n_shards=2)
    assert sum(r.n_rows for r in out.collect()) == 5


def test_cms_query_unseen_item_estimates_zero_or_collision(spark):
    """Querying an item the sketch never saw returns >= 0 and is 0
    unless all depth cells collide with seen values."""
    from sslr_spark.functions.sketches import cms_build, cms_query

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(5)], "g string, v string"
    )
    sk = cms_build(df, ["g"], "v")
    probe = spark.createDataFrame([("g", "never-seen")], "g string, v string")
    [row] = cms_query(sk, probe, ["g"], "v").collect()
    assert row.est == 0  # 5 values in 4x256 cells: no full collision
