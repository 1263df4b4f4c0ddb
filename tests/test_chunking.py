"""Chunking / packing / funnel / PII-scrub operator behavior
(functions/chunking.py — LLM-pipeline additions beyond the reference
surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sslr_spark.functions.chunking import (
    PII_PATTERNS,
    chunk_text,
    filter_funnel,
    pack_token_budget,
    pii_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_covers_text_exactly(spark):
    df = _docs(spark, [(1, "abcdefghij")])  # 10 chars
    out = chunk_text(df, chunk_chars=4, overlap=1).orderBy("chunk_idx")
    rows = out.collect()
    # step 3: starts 0,3,6 -> abcd, defg, ghij; start 9 is suppressed
    # because chunk "j" would be fully contained in "ghij" (duplicate)
    assert [r.chunk for r in rows] == ["abcd", "defg", "ghij"]
    assert [r.chunk_len for r in rows] == [4, 4, 4]
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    # overlap=1: consecutive chunks share their boundary char
    assert rows[0].chunk[-1] == rows[1].chunk[0]


def test_chunk_no_overlap_reassembles(spark):
    text = "x" * 10 + "yz" * 45  # 100 chars
    df = _docs(spark, [(7, text)])
    out = chunk_text(df, chunk_chars=16, overlap=0).orderBy("chunk_idx")
    assert "".join(r.chunk for r in out.collect()) == text


def test_chunk_skips_null_and_empty(spark):
    df = _docs(spark, [(1, None), (2, ""), (3, "ab")])
    out = chunk_text(df, chunk_chars=8)
    assert [r.doc_id for r in out.collect()] == [3]


def test_chunk_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "abc")])
    with pytest.raises(ValueError):
        chunk_text(df, chunk_chars=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_text(df, chunk_chars=4, overlap=-1)


def test_pack_budget_invariants(spark):
    # 40 docs, ~7 tokens each, budget 16 -> docs pack back-to-back
    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(40)]
    out = pack_token_budget(
        _docs(spark, rows), budget=16, n_shards=4
    ).collect()
    assert len(out) == 40
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rs in by_shard.values():
        run = 0
        for r in rs:
            # doc starts at the running offset of its shard stream
            assert r.batch_id == run // 16
            assert r.batch_off == run % 16
            run += r.n_tokens


def test_pack_window_is_sharded_not_global(spark):
    rows = [(i, "a b c") for i in range(100)]
    plan = pack_token_budget(
        _docs(spark, rows), budget=8, n_shards=8
    )._jdf.queryExecution().executedPlan().toString()
    # the running-sum window must partition by shard — a global window
    # would serialize the corpus through one task
    assert "Window" in plan
    assert "partitionBy" not in plan or "shard" in plan
    import re

    m = re.search(r"Window \[.*windowspecdefinition\(([^,]+),", plan)
    assert m and "shard" in m.group(1), plan


def test_filter_funnel_counts(spark):
    rows = [
        (1, "the " * 30),          # long, survives all
        (2, "hi"),                  # dropped at min_len
        (3, "the " * 30),          # survives
        (4, None),                  # null text -> dropped (coalesce False)
    ]
    df = _docs(spark, rows)
    out = filter_funnel(
        df,
        [
            ("min_len", F.length("text") >= 20),
            ("has_the", F.col("text").contains("the")),
        ],
    ).orderBy("stage")
    got = [(r.stage, r.stage_name, r.n_in, r.n_out, r.n_dropped) for r in out.collect()]
    assert got == [
        (0, "input", 4, 4, 0),
        (1, "min_len", 4, 2, 2),
        (2, "has_the", 2, 2, 0),
    ]


def test_filter_funnel_rejects_empty(spark):
    with pytest.raises(ValueError):
        filter_funnel(_docs(spark, [(1, "x")]), [])


def test_pii_scrub_counts_and_order(spark):
    df = _docs(
        spark,
        [
            (1, "mail a.b@x.org and b@y.co end"),
            (2, "call +1 415 555 0123 or (030) 1234-567"),
            (3, "host 10.0.3.217 up"),
            # an email's digits must not double-count as a phone
            (4, "x 12345678@example.com y"),
        ],
    )
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].n_email == 2 and "<EMAIL>" in out[1].scrubbed
    assert "@" not in out[1].scrubbed
    assert out[2].n_phone == 2 and "<PHONE>" in out[2].scrubbed
    assert out[3].n_ipv4 == 1 and out[3].scrubbed == "host <IP> up"
    assert out[4].n_email == 1 and out[4].n_phone == 0


def test_pii_patterns_are_ordered_email_first(spark):
    assert [n for n, _, _ in PII_PATTERNS][:2] == ["email", "phone"]


def test_chunk_short_doc_still_chunks(spark):
    # doc shorter than the overlap must still produce its one chunk
    df = _docs(spark, [(1, "ab")])
    rows = chunk_text(df, chunk_chars=10, overlap=5).collect()
    assert [(r.chunk, r.chunk_len) for r in rows] == [("ab", 2)]


def test_filter_funnel_empty_input_reports_zeros(spark):
    df = _docs(spark, []).filter(F.lit(False))
    out = filter_funnel(df, [("any", F.lit(True))]).orderBy("stage").collect()
    assert [(r.n_in, r.n_out, r.n_dropped) for r in out] == [(0, 0, 0), (0, 0, 0)]


def test_filter_funnel_quoted_stage_name(spark):
    df = _docs(spark, [(1, "xx")])
    out = filter_funnel(
        df, [("don't count 'ws'", F.length("text") >= 1)]
    ).orderBy("stage").collect()
    assert out[1].stage_name == "don't count 'ws'"
    assert out[1].n_out == 1


def test_pack_rejects_string_id_without_shard(spark):
    df = spark.createDataFrame([("doc-1", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError, match="numeric"):
        pack_token_budget(df)
    # explicit shard works for string ids
    out = pack_token_budget(
        df, shard=F.pmod(F.xxhash64("doc_id"), F.lit(4))
    ).collect()
    assert len(out) == 1


def test_dedup_latest_version_handles_map_payload(spark):
    """Non-orderable payload types (maps) must not break the dedup
    aggregation (they ride in the max_by value, never compared)."""
    from sslr_spark.operators.updates import dedup_latest_version

    df = spark.createDataFrame(
        [(1, 1, {"a": "1"}), (1, 2, {"b": "2"})],
        "k long, xmin long, attrs map<string,string>",
    )
    rows = dedup_latest_version(df, ["k"]).collect()
    assert len(rows) == 1 and rows[0].xmin == 2 and rows[0].attrs == {"b": "2"}


def test_chunk_properties_random(spark):
    """Property check over random docs: chunks tile the text exactly —
    reassembly with overlap trimmed equals the original, chunk_idx is
    dense from 0, and no chunk is contained in its predecessor."""
    import random

    rng = random.Random(420)
    rows, params = [], []
    for i in range(30):
        n = rng.randint(1, 60)
        rows.append((i, "".join(rng.choice("abcdxyz ") for _ in range(n))))
    df = _docs(spark, rows)
    for chunk, overlap in [(8, 0), (8, 3), (5, 4), (16, 7)]:
        got = {}
        for r in chunk_text(df, chunk_chars=chunk, overlap=overlap).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk))
        for doc_id, text in rows:
            chunks = [c for _, c in sorted(got[doc_id])]
            assert [i for i, _ in sorted(got[doc_id])] == list(range(len(chunks)))
            rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
            assert rebuilt == text, (doc_id, chunk, overlap)
            for prev, cur in zip(chunks, chunks[1:]):
                # successor must extend coverage (no fully-contained dup)
                assert len(cur) > overlap or prev != chunks[-2]
