"""Property tests for the round-9 operator invariants, each against a
pure-Python reference: containment pairs, the blocklist gate (word +
phrase), byte-budget shard packing, PSI identity/symmetry, and the
line cleaners.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _sh3(text):
    w = text.split()
    return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12),
        min_size=2,
        max_size=6,
    ),
    threshold=st.sampled_from([0.3, 0.7, 1.0]),
)
@pytest.mark.slow
def test_containment_matches_reference(spark, docs, threshold):
    """ngram_containment_pairs == the exhaustive per-pair formula,
    and containment >= jaccard always (min(|A|,|B|) <= |A∪B|)."""
    import itertools

    import sslr_spark.functions.dedup as D

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sets = {i: _sh3(t) for i, t in rows}
    expected = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        if A and B:
            c = round(len(A & B) / min(len(A), len(B)), 6)
            if c >= threshold:
                expected[(a, b)] = c
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with D.cache_scope():
        got = {
            (r.doc_a, r.doc_b): r.containment
            for r in D.ngram_containment_pairs(
                df, threshold=threshold
            ).collect()
        }
        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
    assert got == expected
    for pair, c in got.items():
        assert c >= jac.get(pair, 0.0) - 1e-9


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS + ["bad", "bad thing"]),
                 min_size=0, max_size=15),
        min_size=1,
        max_size=6,
    ),
    budget_ppm=st.sampled_from([0, 100_000, 1_000_000]),
)
def test_blocklist_matches_reference(spark, docs, budget_ppm):
    from sslr_spark.functions.text import blocklist_filter

    blocklist = ["bad", "bad thing"]
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in blocklist_filter(
            df, blocklist, max_banned_ppm=budget_ppm
        ).collect()
    }
    for i, t in rows:
        w = t.lower().split()
        n_single = sum(1 for x in w if x == "bad")
        n_phrase = sum(
            1 for j in range(len(w) - 1) if w[j] == "bad" and w[j + 1] == "thing"
        )
        exp = n_single + n_phrase
        assert out[i].n_words == len(w)
        assert out[i].n_banned == exp, (t, exp, out[i])
        assert out[i].n_banned <= out[i].n_words * 2  # sanity bound
        assert out[i].keep == (exp * 1_000_000 <= budget_ppm * len(w))


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=500),
                   min_size=1, max_size=30),
    budget=st.sampled_from([100, 250, 1000]),
)
def test_shard_budget_matches_reference(spark, sizes, budget):
    """shard_by_budget == the sequential next-fit walk; every shard's
    total is < budget + its largest single member."""
    from sslr_spark.functions.sampling import shard_by_budget

    rows = [(i, "s", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    got = {r.doc_id: r.shard for r in shard_by_budget(df, budget).collect()}
    cum = 0
    for i, n in enumerate(sizes):
        assert got[i] == cum // budget, (i, sizes)
        cum += n
    # shard totals never exceed budget + one member
    totals: dict[int, int] = {}
    for i, n in enumerate(sizes):
        totals[got[i]] = totals.get(got[i], 0) + n
    for sh, tot in totals.items():
        members = [sizes[i] for i in range(len(sizes)) if got[i] == sh]
        assert tot <= budget + max(members)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=99),
                  min_size=1, max_size=50),
)
@pytest.mark.slow
def test_psi_identity_and_symmetry(spark, vals):
    """PSI(X, X) == 0 exactly; PSI contributions are finite; swapping
    sides flips nothing but the sign structure (total is symmetric
    because (p-q)ln(p/q) is)."""
    from sslr_spark.functions.quality_model import distribution_psi

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    same = distribution_psi(df, df, "v", [25.0, 50.0, 75.0]).collect()
    assert all(r.psi_contrib == 0.0 for r in same)
    shifted = spark.createDataFrame(
        [(float(v) + 10,) for v in vals], "v double"
    )
    ab = distribution_psi(df, shifted, "v", [25.0, 50.0, 75.0]).collect()
    ba = distribution_psi(shifted, df, "v", [25.0, 50.0, 75.0]).collect()
    assert all(math.isfinite(r.psi_contrib) for r in ab + ba)
    tot_ab = round(sum(r.psi_contrib for r in ab), 5)
    tot_ba = round(sum(r.psi_contrib for r in ba), 5)
    assert tot_ab == tot_ba  # (p-q)ln(p/q) is side-symmetric


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["l1", "l2", "l3", "footer"]),
                 min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    ),
    min_docs=st.sampled_from([2, 3]),
)
@pytest.mark.slow
def test_line_cleaners_match_reference(spark, docs, min_docs):
    from sslr_spark.functions.text import (
        dedup_doc_lines,
        strip_boilerplate_lines,
    )

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_d = {r.doc_id: r for r in dedup_doc_lines(df).collect()}
    for i, ls in enumerate(docs):
        seen, kept = set(), []
        for l in ls:
            if l not in seen:
                seen.add(l)
                kept.append(l)
        assert got_d[i].text == "\n".join(kept)
        assert got_d[i].n_dup_lines == len(ls) - len(kept)

    got_s = {r.doc_id: r for r in strip_boilerplate_lines(df, min_docs).collect()}
    df_count: dict[str, set] = {}
    for i, ls in enumerate(docs):
        for l in set(ls):
            df_count.setdefault(l, set()).add(i)
    hot = {l for l, d in df_count.items() if len(d) >= min_docs}
    for i, ls in enumerate(docs):
        kept = [l for l in ls if l not in hot]
        assert got_s[i].text == "\n".join(kept)
        assert got_s[i].n_stripped == len(ls) - len(kept)
