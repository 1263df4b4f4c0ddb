"""WARC source adapter: spec-shaped round trips (plain + per-record
gzip members), corruption is loud, and the read plan is a pure
one-file-per-task map — no shuffle."""
from __future__ import annotations

import gzip
import os

import pytest

from sslr_spark.sources.warc import (
    build_warc,
    build_warc_gz,
    parse_warc_records,
    read_warc,
)


def _recs(n=3):
    return [
        {
            "record_id": f"<urn:doc:{i}>",
            "warc_type": "response",
            "target_uri": f"http://example.com/doc/{i}",
            "warc_date": "2026-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": f"body of document {i} ☃".encode(),
        }
        for i in range(n)
    ]


def test_parse_round_trip_plain_and_gz():
    recs = _recs()
    for blob in (build_warc(recs), build_warc_gz(recs)):
        got = list(parse_warc_records(blob))
        assert len(got) == 3
        for r, want in zip(got, recs):
            assert r["record_id"] == want["record_id"]
            assert r["target_uri"] == want["target_uri"]
            assert r["content_type"] == "text/plain"
            assert r["payload"] == want["payload"]
            assert r["n_bytes"] == len(want["payload"])


def test_parse_rejects_truncated_payload():
    blob = build_warc(_recs(1))
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_records(blob[:-10]))


def test_parse_rejects_missing_version_line():
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n"))


def test_parse_rejects_truncated_gzip_member():
    blob = gzip.compress(build_warc(_recs(1)))
    with pytest.raises(ValueError, match="gzip member"):
        list(parse_warc_records(blob[:-5]))


def test_parse_rejects_missing_content_length():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_records(bad))


def test_read_warc_mixed_dir(spark, tmp_path):
    recs = _recs(4)
    (tmp_path / "a.warc").write_bytes(build_warc(recs[:2]))
    (tmp_path / "b.warc.gz").write_bytes(build_warc_gz(recs[2:]))
    df = read_warc(spark, str(tmp_path))
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {r["target_uri"] for r in recs}
    for want in recs:
        got = rows[want["target_uri"]]
        assert bytes(got.payload) == want["payload"]
        assert got.n_bytes == len(want["payload"])
        assert os.path.basename(got.warc_file).startswith(
            ("a.", "b.")
        )


def test_read_warc_plan_has_no_shuffle(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc(_recs(1)))
    plan = (
        read_warc(spark, str(tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_split_http_payload_and_html_extract(spark, tmp_path):
    from sslr_spark.functions.text import html_to_text
    from sslr_spark.sources.warc import split_http_payload
    from pyspark.sql import functions as F

    html = (
        "<html><head><script>var x = '<p>sneaky</p>';</script>"
        "<style>body { color: red }</style></head>"
        "<body><h1>Title</h1><p>first &amp; second</p>"
        "<ul><li>a</li><li>b</li></ul><!-- hidden note -->"
        "<div>tail &nbsp;text</div></body></html>"
    )
    http = (
        "HTTP/1.1 301 Moved\r\nLocation: /x\r\n"
        "Content-Type: text/html; charset=utf-8\r\n\r\n" + html
    ).encode()
    df = spark.createDataFrame(
        [(http,), (b"plain bytes, no envelope",)],
        "payload binary",
    )
    out = split_http_payload(df).withColumn(
        "text", html_to_text(F.col("body"))
    )
    rows = sorted(out.collect(), key=lambda r: r.http_status is None)
    assert rows[0].http_status == 301
    assert rows[0].http_content_type == "text/html; charset=utf-8"
    # script/style/comment payloads gone, entities decoded, block
    # edges become newlines, whitespace collapsed
    assert rows[0].text == "Title\nfirst & second\na\nb\ntail text"
    assert "sneaky" not in rows[0].text
    assert rows[1].http_status is None
    assert rows[1].body == "plain bytes, no envelope"
