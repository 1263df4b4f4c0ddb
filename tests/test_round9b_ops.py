"""Round-9 continuation operators:

- dsir_weights / dsir_select: DSIR importance resampling (Xie et al.
  2023) — hashed unigram+bigram log-ratio of a target distribution
  against the raw corpus, integer-micros quantized per bucket so the
  per-doc weight is an order-free bigint sum.
- tfidf_topk: per-doc top-k keywords, smooth idf, micros-quantized
  scores ranked per doc.
- cluster_balance: frozen-quantizer cluster-capped diversity
  sampling — keep the cap most-central vectors per cell.
"""
from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from sslr_spark.functions.sampling import (
    cluster_balance,
    dsir_select,
    dsir_weights,
)
from sslr_spark.functions.text import tfidf_topk


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------
# DSIR
# ------------------------------------------------------------------

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "quantum flux capacitor array manifold"),
    (4, "cat mat cat mat cat"),
    (5, ""),
    (6, "der hund und die katze"),
]
TARGET_IDS = {1, 2}  # the "wiki-like" subset


def _py_dsir(docs, target_ids, n_buckets):
    """Pure-Python replay of dsir_weights' exact arithmetic."""

    def buckets(text):
        ws = text.strip().split() if text.strip() else []
        fs = list(ws) + [f"{a}\x1f{b}" for a, b in zip(ws, ws[1:])]
        return [
            int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % n_buckets
            for f in fs
        ]

    raw: Counter = Counter()
    tgt: Counter = Counter()
    per = {}
    for did, text in docs:
        bs = buckets(text)
        per[did] = Counter(bs)
        raw.update(bs)
        if did in target_ids:
            tgt.update(bs)
    tr, tt, b = sum(raw.values()), sum(tgt.values()), float(n_buckets)
    lam = {
        bk: math.floor(
            (
                math.log(tgt.get(bk, 0) + 1.0)
                - math.log(tt + b)
                - math.log(c + 1.0)
                + math.log(tr + b)
            )
            * 1e6
            + 0.5
        )
        for bk, c in raw.items()
    }
    return {
        did: (
            sum(cnt.values()),
            sum(c * lam[bk] for bk, c in cnt.items()),
        )
        for did, cnt in per.items()
    }


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dsir_weights_match_python_reference(docs_df):
    got = {
        r.doc_id: (r.n_features, r.logratio_micros)
        for r in dsir_weights(
            docs_df,
            docs_df.filter(F.col("doc_id").isin(list(TARGET_IDS))),
            n_buckets=64,
        ).collect()
    }
    want = _py_dsir(DOCS, TARGET_IDS, 64)
    assert got == want


def test_dsir_target_docs_outscore_off_target(docs_df):
    w = {
        r.doc_id: r.logratio_micros
        for r in dsir_weights(
            docs_df,
            docs_df.filter(F.col("doc_id").isin(list(TARGET_IDS))),
            n_buckets=64,
        ).collect()
    }
    # every target doc beats every off-target non-empty doc
    for t in (1, 2):
        for o in (3, 6):
            assert w[t] > w[o]


def test_dsir_zero_token_doc_scores_zero(docs_df):
    w = {
        r.doc_id: (r.n_features, r.logratio_micros)
        for r in dsir_weights(
            docs_df, docs_df.filter("doc_id = 1"), n_buckets=64
        ).collect()
    }
    assert w[5] == (0, 0)


def test_dsir_select_cut_size_and_order(docs_df):
    tgt = docs_df.filter(F.col("doc_id").isin([1, 2]))
    kept = dsir_select(docs_df, tgt, 0.5, n_buckets=64).collect()
    assert len(kept) == 3  # floor(0.5 * 6)
    scores = [r.logratio_micros for r in kept]
    assert scores == sorted(scores, reverse=True)
    w = _py_dsir(DOCS, TARGET_IDS, 64)
    want_ids = [
        d
        for d, _ in sorted(
            w.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:3]
    ]
    assert [r.doc_id for r in kept] == want_ids


def test_dsir_select_validates_fraction(docs_df):
    with pytest.raises(ValueError, match="keep_fraction"):
        dsir_select(docs_df, docs_df, 0.0)
    with pytest.raises(ValueError, match="keep_fraction"):
        dsir_select(docs_df, docs_df, 1.5)


def test_dsir_lam_join_is_broadcast(docs_df):
    """The bounded log-ratio table must reach the scoring join as a
    broadcast — a shuffle there re-exchanges every doc-bucket row."""
    plan = plan_of(
        dsir_weights(docs_df, docs_df.filter("doc_id = 1"), n_buckets=64)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------
# TF-IDF top-k
# ------------------------------------------------------------------


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [
            (1, "common common zebra"),
            (2, "common filler words"),
            (3, "common more filler"),
        ],
        "doc_id long, text string",
    )
    top = {
        r.rk: r.term
        for r in tfidf_topk(df, k=2).filter("doc_id = 1").collect()
    }
    # zebra: tf=1, df=1 -> idf ln(4/2)+1; common in every doc:
    # tf=2, idf ln(4/4)+1 = 1 -> 2.0 vs zebra 1.693 -> common #1 by tf,
    # but zebra beats the OTHER singletons everywhere
    assert top[1] == "common" and top[2] == "zebra"


def test_tfidf_matches_python_reference(spark):
    rows = [(i, t) for i, t in DOCS if t]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rk): (r.term, r.tf, r.score_micros)
        for r in tfidf_topk(df, k=3).collect()
    }
    # pure-Python replay
    toks = {d: t.split() for d, t in rows}
    n = float(len(rows))
    dfreq: Counter = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    want = {}
    for d, ws in toks.items():
        tf = Counter(ws)
        scored = sorted(
            (
                (
                    -math.floor(
                        c * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)
                        * 1e6
                        + 0.5
                    ),
                    t,
                    c,
                )
                for t, c in tf.items()
            )
        )
        for rk, (negs, t, c) in enumerate(scored[:3], start=1):
            want[(d, rk)] = (t, c, -negs)
    assert got == want


def test_tfidf_validates_k(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        tfidf_topk(df, k=0)


# ------------------------------------------------------------------
# cluster_balance
# ------------------------------------------------------------------


@pytest.fixture()
def vecs(spark):
    # two tight clusters around orthogonal axes; ids 1 and 2 are the
    # frozen centroids
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    rows += [
        (10 + i, [1.0, 0.01 * i]) for i in range(5)
    ]  # cell 0, decreasing centrality as i grows
    rows += [(20, [0.02, 1.0])]  # cell 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cluster_balance_caps_and_keeps_most_central(vecs):
    out = cluster_balance(vecs, [1, 2], cap=3).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    assert len(by_cell[0]) == 3 and len(by_cell[1]) == 2
    # cell 0's most central: the centroid itself (cos 1.0), then the
    # smallest-perturbation members in order
    kept0 = sorted(by_cell[0], key=lambda r: r.rk)
    assert [r.vec_id for r in kept0] == [1, 10, 11]
    assert [r.rk for r in kept0] == [1, 2, 3]


def test_cluster_balance_single_exchange(vecs):
    """Assignment is a literal-centroid map; only the per-cell window
    may exchange. More than one exchange means the assignment started
    shuffling — the exact regression the fixed-centroid path exists
    to prevent."""
    plan = plan_of(cluster_balance(vecs, [1, 2], cap=3))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_cluster_balance_validates_cap(vecs):
    with pytest.raises(ValueError, match="cap"):
        cluster_balance(vecs, [1, 2], cap=0)


# ------------------------------------------------------------------
# dsir_gate + curation chain wiring
# ------------------------------------------------------------------


def test_dsir_gate_matches_mean_bp_cut(docs_df):
    """The gate's survivors = top keep_fraction by mean-per-feature
    bp score with ties kept — replayed from dsir_weights by hand."""
    from sslr_spark.functions.sampling import dsir_gate

    tgt = docs_df.filter(F.col("doc_id").isin([1, 2]))
    kept = {
        r.doc_id: (r.score_bp, r.threshold_bp)
        for r in dsir_gate(docs_df, tgt, 0.5, n_buckets=64).collect()
    }
    w = _py_dsir(DOCS, TARGET_IDS, 64)
    bp = {
        d: (0 if nf == 0 else math.floor(m / (nf * 100.0)))
        for d, (nf, m) in w.items()
    }
    n = len(bp)
    ordered = sorted(bp.values(), reverse=True)
    thr = ordered[math.ceil(0.5 * n) - 1]
    want = {d for d, s in bp.items() if s >= thr}
    assert set(kept) == want
    for d, (s, t) in kept.items():
        assert s == bp[d] and t == thr


def test_dsir_gate_is_action_free(docs_df, monkeypatch):
    """Pipeline stages must not run jobs at plan-build time (the
    dsir_select count() is exactly what the gate variant avoids)."""
    from pyspark.sql import DataFrame as SparkDF

    from sslr_spark.functions.sampling import dsir_gate

    def boom(self, *a, **k):  # any eager action fails the build
        raise AssertionError("dsir_gate ran an action at build time")

    for action in ("count", "collect", "first", "take"):
        monkeypatch.setattr(SparkDF, action, boom)
    df = dsir_gate(docs_df, docs_df.filter("doc_id = 1"), 0.5)
    assert "score_bp" in df.columns  # plan built, nothing executed


@pytest.mark.slow
def test_curation_chain_dsir_stage(spark):
    """Chain wiring: the DSIR stage gates the quality-gate survivors
    toward the target source's surviving docs, and the funnel records
    it between the content gates and the cap."""
    from sslr_spark.curation import curate_documents
    from sslr_spark.functions.sampling import dsir_gate

    rows = []
    for i in range(30):
        src = "wiki" if i % 3 == 0 else f"crawl{i % 2}"
        text = (
            "the quick brown fox jumps over the lazy dog near a river "
            * 3
            if i % 3 == 0
            else f"unique{i} zzz qqq xxx random junk tokens entirely "
            f"unrelated words padding document length token{i} "
            * 2
        )
        rows.append((i, text, "en", src))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    res = curate_documents(
        docs,
        quality_weights=[0.0, 0.0, 0.0, 0.0],
        quality_bias=0.0,
        keep_fraction=1.0,
        gopher=False,
        exact_dedup=False,
        dsir_keep_fraction=0.4,
        dsir_target_source="wiki",
        dsir_buckets=64,
        max_per_source=None,
        n_shards=None,
        with_funnel=True,
    )
    got = {r.doc_id for r in res.df.collect()}
    want = {
        r.doc_id
        for r in dsir_gate(
            docs,
            docs.filter(F.col("source") == "wiki"),
            0.4,
            n_buckets=64,
        ).collect()
    }
    assert got == want
    # every (identical-text, maximally target-like) wiki doc survives;
    # the cut lands inside the distinct-text crawl docs —
    # ceil(0.4 * 30) = 12 kept, no blanket tie
    assert {i for i in range(30) if i % 3 == 0} <= got
    assert len(got) == 12
    assert res.funnel["dsir_gate"] == len(got)
    assert list(res.funnel) == ["input", "dsir_gate"]


def test_curation_dsir_requires_target(spark):
    from sslr_spark.curation import curate_documents

    docs = spark.createDataFrame(
        [(1, "a", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    with pytest.raises(ValueError, match="dsir_target_source"):
        curate_documents(
            docs,
            quality_weights=[0.0] * 4,
            quality_bias=0.0,
            keep_fraction=1.0,
            dsir_keep_fraction=0.5,
        )


def test_curation_config_dsir_keys():
    from sslr_spark.config import ConfigError
    from sslr_spark.curation import load_curation_config

    cfg = load_curation_config(
        '{"source": "/s", "output": "/o", "keepFraction": 1.0, '
        '"dsirKeepFraction": 0.7, "dsirTargetSource": "wiki", '
        '"dsirBuckets": 512}'
    )
    assert cfg.dsir_keep_fraction == 0.7
    assert cfg.dsir_target_source == "wiki"
    assert cfg.dsir_buckets == 512
    with pytest.raises(ConfigError, match="dsirTargetSource"):
        load_curation_config(
            '{"source": "/s", "output": "/o", "keepFraction": 1.0, '
            '"dsirKeepFraction": 0.7}'
        )


# ------------------------------------------------------------------
# epoch_allocation (repeat-capped water-filling)
# ------------------------------------------------------------------


def _py_epoch(av: dict, budget: float, r: float, alpha: float):
    """Closed-form mirror of epoch_allocation's exact arithmetic."""
    cap = {d: math.floor(a * r) for d, a in av.items()}
    wq = {d: math.floor((a ** alpha) * 1e6) for d, a in av.items()}
    out = {}
    if budget >= sum(cap.values()):
        alloc = {d: float(c) for d, c in cap.items()}
    else:
        order = sorted(av, key=lambda d: (cap[d] / wq[d], d))
        tw = sum(wq.values())
        cum_cap = cum_w = 0
        lam = None
        for d in order:
            cum_cap += cap[d]
            cum_w += wq[d]
            suf = tw - cum_w
            if suf > 0:
                lh = (budget - cum_cap) / suf
                if cap[d] / wq[d] <= lh:
                    lam = lh
        if lam is None:
            lam = budget / tw
        alloc = {d: min(cap[d], lam * wq[d]) for d in av}
    for d, a in av.items():
        al = math.floor(alloc[d])
        out[d] = (a, cap[d], al, math.floor(al * 10000.0 / a))
    return out


@pytest.fixture()
def domains_df(spark):
    # one row per (domain, doc) with n_chars; domain sizes spread so
    # sqrt-temperature makes the small ones hit the repeat cap
    rows = []
    sizes = {"big": 4000, "mid": 900, "small": 100, "tiny": 25}
    for d, tot in sizes.items():
        rows += [(d, i, tot // 5) for i in range(5)]
    return spark.createDataFrame(
        rows, "domain string, doc_id long, n_chars long"
    )


def test_epoch_allocation_matches_closed_form(domains_df):
    from sslr_spark.functions.sampling import epoch_allocation

    av = {"big": 4000, "mid": 900, "small": 100, "tiny": 25}
    budget = 2 * sum(av.values())
    got = {
        r.domain: (r.avail, r.cap, r.allocation, r.epochs_bp)
        for r in epoch_allocation(
            domains_df, ["domain"], "n_chars",
            budget=budget, max_repeats=4.0, alpha=0.5,
        ).collect()
    }
    assert got == _py_epoch(av, float(budget), 4.0, 0.5)
    # the spread forces real capping: tiny/small at 4 epochs, big not
    assert got["tiny"][3] >= 39990  # ~4.0 epochs in bp (floor slack)
    assert got["big"][3] < 40000


def test_epoch_allocation_water_level_conserves_budget(domains_df):
    """When caps bind, the floored allocations sum to the budget up
    to one floor-loss per domain — the water level is exact."""
    from sslr_spark.functions.sampling import epoch_allocation

    budget = 2 * 5025
    rows = epoch_allocation(
        domains_df, ["domain"], "n_chars",
        budget=budget, max_repeats=4.0, alpha=0.5,
    ).collect()
    total = sum(r.allocation for r in rows)
    assert budget - len(rows) <= total <= budget
    for r in rows:
        assert r.allocation <= r.cap


def test_epoch_allocation_all_capped_when_budget_exceeds_supply(
    domains_df,
):
    from sslr_spark.functions.sampling import epoch_allocation

    rows = epoch_allocation(
        domains_df, ["domain"], "n_chars",
        budget=10**9, max_repeats=4.0, alpha=0.5,
    ).collect()
    for r in rows:
        assert r.allocation == r.cap
        assert 39990 <= r.epochs_bp <= 40000


def test_epoch_allocation_validates_inputs(domains_df):
    from sslr_spark.functions.sampling import epoch_allocation

    with pytest.raises(ValueError, match="budget"):
        epoch_allocation(domains_df, ["domain"], "n_chars", budget=0)
    with pytest.raises(ValueError, match="max_repeats"):
        epoch_allocation(
            domains_df, ["domain"], "n_chars", budget=10,
            max_repeats=0.0,
        )


# ------------------------------------------------------------------
# CCNet perplexity buckets
# ------------------------------------------------------------------


def test_ccnet_buckets_thirds_and_order(spark):
    """head/middle/tail are per-group thirds with ties kept, and the
    ordering invariant holds: every head score >= every middle score
    >= every tail score within a group."""
    from sslr_spark.functions.quality_model import (
        lm_perplexity_buckets,
    )

    rows = [
        (i, "the cat sat on the mat " * (1 + i % 3), "en")
        for i in range(9)
    ] + [(100 + i, f"unique{i} gibberish tokens xq{i}", "en")
         for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    out = lm_perplexity_buckets(df, vocab_size=40).collect()
    assert len(out) == 12
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.score_bp)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    # thirds with all-ties-kept: head holds AT LEAST ceil(n/3) docs
    assert len(by_bucket["head"]) >= 4
    # the repeated-phrase docs are more probable under the corpus LM
    # than the unique-gibberish docs, which land in the tail
    assert {r.doc_id for r in out if r.bucket == "tail"} >= {
        100, 101, 102
    } - {r.doc_id for r in out if r.bucket != "tail"}


# ------------------------------------------------------------------
# incremental DSIR (frozen-model fit + batch scoring)
# ------------------------------------------------------------------


def test_dsir_incremental_matches_full_weights_on_corpus_buckets(
    spark,
):
    """A batch doc whose features all exist in the corpus must score
    IDENTICALLY under the frozen model and under dsir_weights run on
    the corpus (same arithmetic, same quantization)."""
    from sslr_spark.functions.sampling import (
        dsir_fit,
        dsir_score_batch,
    )

    corpus = spark.createDataFrame(
        DOCS, "doc_id long, text string"
    )
    tgt = corpus.filter(F.col("doc_id").isin([1, 2]))
    rows, default = dsir_fit(corpus, tgt, n_buckets=64)
    # batch doc 100 reuses doc 1's text -> all buckets known
    batch = spark.createDataFrame(
        [(100, DOCS[0][1])], "doc_id long, text string"
    )
    got = dsir_score_batch(batch, rows, default, n_buckets=64).collect()[0]
    want = _py_dsir(DOCS, TARGET_IDS, 64)[1]
    assert (got.n_features, got.logratio_micros) == want


def test_dsir_incremental_unknown_buckets_use_default(spark):
    """Features the corpus never produced score the empty-bucket
    default, not null/zero."""
    import math

    from sslr_spark.functions.sampling import (
        dsir_fit,
        dsir_score_batch,
    )

    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = corpus.filter(F.col("doc_id").isin([1, 2]))
    rows, default = dsir_fit(corpus, tgt, n_buckets=4096)
    # 4096 buckets over a 6-doc corpus: novel words won't collide
    batch = spark.createDataFrame(
        [(200, "xylophone quasar nebulae")],
        "doc_id long, text string",
    )
    got = dsir_score_batch(
        batch, rows, default, n_buckets=4096
    ).collect()[0]
    assert got.n_features == 5  # 3 unigrams + 2 bigrams
    assert got.logratio_micros == 5 * default
    # default = ln(tr + B) - ln(tt + B) in micros
    w = _py_dsir(DOCS, TARGET_IDS, 4096)
    tr = sum(nf for nf, _ in w.values())
    tt = sum(nf for d, (nf, _) in w.items() if d in TARGET_IDS)
    assert default == math.floor(
        (math.log(tr + 4096.0) - math.log(tt + 4096.0)) * 1e6 + 0.5
    )


# ------------------------------------------------------------------
# URL canonicalization + dedup
# ------------------------------------------------------------------


def test_canonical_url_rules(spark):
    from sslr_spark.functions.urls import canonical_url

    cases = [
        ("HTTP://Example.COM:80/doc/1?q=1#frag",
         "http://example.com/doc/1?q=1"),
        ("https://Site.ORG:443/a", "https://site.org/a"),
        ("http://h:8080/x", "http://h:8080/x"),  # non-default kept
        ("example.com", "http://example.com/"),  # scheme-less
        ("ftp://Files.Net:21/pub/", "ftp://files.net:21/pub/"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "i long, url string",
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want


def test_url_dedup_collapses_variants(spark):
    from sslr_spark.functions.urls import url_dedup

    df = spark.createDataFrame(
        [
            (1, "HTTP://A.com:80/x#f"),
            (2, "http://a.com/x"),
            (3, "http://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r.canonical_url: (r.n_urls, r.keep_id)
           for r in url_dedup(df, "url").collect()}
    assert out["http://a.com/x"] == (2, 1)
    assert out["http://a.com/y"] == (1, 3)


def test_epoch_allocation_single_corpus_exchange(domains_df):
    """The corpus is touched by exactly ONE hash exchange (the domain
    aggregate); the water-filling windows run on the bounded
    aggregated rows only (single-partition exchanges, not
    corpus-keyed ones)."""
    from sslr_spark.functions.sampling import epoch_allocation

    plan = plan_of(
        epoch_allocation(
            domains_df, ["domain"], "n_chars",
            budget=1000, max_repeats=4.0, alpha=0.5,
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
