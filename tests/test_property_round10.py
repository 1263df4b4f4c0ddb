"""Property tests for the round-10 operators, each against a
pure-Python reference: BPE merge-rule training (canonical re.sub
semantics over random word histograms), BPE tokenization counts, and
count-min sketch invariants (merge associativity + the
never-underestimate guarantee) under random corpora.
"""

from __future__ import annotations

import pytest

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# short alphabet maximizes pair collisions and repeated runs — the
# regime where greedy-merge semantics can diverge
_WORD = st.text(alphabet="ab", min_size=2, max_size=6)


def _reference_bpe(texts, n_merges):
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
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, l, r, l + r, cnt))
        pat = re.compile(
            r"(?<!\S)" + re.escape(l) + " " + re.escape(r) + r"(?!\S)"
        )
        hist = {pat.sub(l + r, s): c for s, c in hist.items()}
    return rules, hist


@settings(**_SETTINGS)
@given(
    words=st.lists(_WORD, min_size=1, max_size=20),
    n_merges=st.sampled_from([1, 3, 5]),
)
def test_bpe_train_property(spark, words, n_merges):
    """bpe_train == the canonical reference on random 'ab'-alphabet
    corpora — repeated-run words like 'aaaa' are common here, so the
    greedy fold's run semantics are exercised hard."""
    from sslr_spark.functions.text import bpe_train

    text = " ".join(words)
    expected, _ = _reference_bpe([text], n_merges)
    df = spark.createDataFrame([(text,)], "text string")
    got = [
        (r.rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(df, n_merges=n_merges).orderBy("rank").collect()
    ]
    assert got == expected, (got, expected, words)


@settings(**_SETTINGS)
@given(words=st.lists(_WORD, min_size=1, max_size=15))
@pytest.mark.slow
def test_bpe_tokenize_property(spark, words):
    """Token counts after applying the trained rules equal the
    reference histogram's post-merge symbol counts."""
    from sslr_spark.functions.text import bpe_tokenize_count, bpe_train

    text = " ".join(words)
    _, hist = _reference_bpe([text], 3)
    seg = {s.replace(" ", ""): len(s.split(" ")) for s in hist}
    exp_tokens = sum(seg.get(w, 1) for w in text.split())
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=3)
    row = bpe_tokenize_count(df, merges).collect()[0]
    assert (row.n_words, row.n_bpe_tokens) == (len(words), exp_tokens)


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.sampled_from(["x", "y", "z", "w", "v"]), min_size=1, max_size=40
    ),
    n_shards=st.sampled_from([1, 3]),
)
@pytest.mark.slow
def test_cms_property(spark, values, n_shards):
    """CMS invariants on random corpora: shard builds SUM-merge into
    the direct build, and every point estimate >= its true count."""
    from pyspark.sql import functions as F

    from sslr_spark.functions.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    rows = [("g", i % n_shards, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "g string, sh int, v string")
    merged = cms_merge(cms_build(df, ["g", "sh"], "v"), ["g"])
    direct = cms_build(df, ["g"], "v")
    assert {(r.row, r.col): r.cnt for r in merged.collect()} == {
        (r.row, r.col): r.cnt for r in direct.collect()
    }
    est = {
        r.v: r.est
        for r in cms_query(
            merged, df.select("g", "v").distinct(), ["g"], "v"
        ).collect()
    }
    true = {
        r.v: r.cnt
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(est) == set(true)
    assert all(est[v] >= t for v, t in true.items())
