"""Property tests for the round-9 continuation operators, each
against a pure-Python reference on randomized corpora: DSIR weights
(exact integer parity + append-of-target monotonicity), tfidf_topk
(exact parity), cluster_balance (cap + centrality invariants).
"""

from __future__ import annotations

import pytest

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _py_dsir(docs, target_ids, n_buckets):
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


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=1,
        max_size=6,
    ),
    target_mod=st.sampled_from([2, 3]),
    n_buckets=st.sampled_from([16, 64]),
)
@pytest.mark.slow
def test_dsir_weights_match_reference(spark, docs, target_mod, n_buckets):
    from sslr_spark.functions.sampling import dsir_weights

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    target_ids = {i for i, _ in rows if i % target_mod == 0}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_features, r.logratio_micros)
        for r in dsir_weights(
            df,
            df.filter(F.col("doc_id") % target_mod == 0),
            n_buckets=n_buckets,
        ).collect()
    }
    assert got == _py_dsir(rows, target_ids, n_buckets)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
        min_size=1,
        max_size=5,
    ),
    k=st.sampled_from([1, 3]),
)
def test_tfidf_matches_reference(spark, docs, k):
    from sslr_spark.functions.text import tfidf_topk

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rk): (r.term, r.tf, r.score_micros)
        for r in tfidf_topk(df, k=k).collect()
    }
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
                        c
                        * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)
                        * 1e6
                        + 0.5
                    ),
                    t,
                    c,
                )
                for t, c in tf.items()
            )
        )
        for rk, (negs, t, c) in enumerate(scored[:k], start=1):
            want[(d, rk)] = (t, c, -negs)
    assert got == want


@settings(**_SETTINGS)
@given(
    n_extra=st.integers(min_value=0, max_value=12),
    cap=st.sampled_from([1, 3, 100]),
)
def test_cluster_balance_invariants(spark, n_extra, cap):
    """Per-cell output size == min(cap, cell size); survivors are the
    cell's most-central members; ranks are 1..size with no gaps."""
    from sslr_spark.functions.sampling import cluster_balance

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    rows += [
        (10 + i, [1.0, 0.005 * (i + 1)]) for i in range(n_extra)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balance(df, [1, 2], cap=cap).collect()
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    # cell sizes: cell 0 = centroid + extras, cell 1 = its centroid
    assert len(by_cell.get(0, [])) == min(cap, 1 + n_extra)
    assert len(by_cell.get(1, [])) == min(cap, 1)
    for cell, members in by_cell.items():
        rks = sorted(r.rk for r in members)
        assert rks == list(range(1, len(members) + 1))
    # most-central first: the perturbed vectors' centrality falls
    # with the perturbation index, so kept ids are the smallest ones
    kept0 = {r.vec_id for r in by_cell.get(0, [])}
    want0 = set(
        [1] + [10 + i for i in range(min(cap - 1, n_extra))]
    )
    assert kept0 == want0
