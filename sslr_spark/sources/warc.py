"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
Common Crawl, the raw feedstock of every web-scale LLM corpus.

A WARC file is a concatenation of records, each a header block
(``WARC/1.0`` version line + RFC-822-style headers, CRLF line ends,
blank-line terminated) followed by exactly ``Content-Length`` payload
bytes and a ``\\r\\n\\r\\n`` separator. ``.warc.gz`` files are a
concatenation of per-record (or per-run) GZIP MEMBERS — the spec's
trick that lets a reader seek to a record offset and inflate just
that member; this parser inflates members sequentially with one
``zlib`` stream per member (``unused_data`` hands the next member's
offset over), so it needs no index.

Spark shape: there is no Spark-native WARC reader, and the format is
not line-splittable, so the standard processing granularity — the one
Common Crawl itself publishes for — is ONE FILE PER TASK (a crawl
"segment", ~1 GB). ``spark.read.format("binaryFile")`` provides
exactly that (file = row = task); :func:`read_warc` fans the files
through an Arrow-batched ``mapInPandas`` running the pure-Python
record parser. At 100 TB the parallelism unit is the ~100k segment
files, not intra-file splits — matching how warcio+Spark jobs process
CC in practice. Memory per task is bounded by the file size (the
decompressed record stream is consumed incrementally, but binaryFile
materializes the compressed blob); cap input file size upstream, not
here.

Beyond-reference surface (the reference syncs SQL tables; a crawl
pipeline's upstream is WARC segments).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a multi-member gzip blob (the .warc.gz layout) into one
    byte stream. A truncated trailing member raises — half a record
    must not silently pass as a whole one."""
    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("warc.gz: truncated gzip member")
        rest = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record from raw (or gzipped) bytes.

    Tolerates leading/trailing CRLF runs between records; raises on a
    structurally broken record (no version line, unparseable or
    missing Content-Length, payload shorter than declared) — a crawl
    job must see corruption, not absorb it.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("warc: record header not terminated")
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"warc: expected version line, got {lines[0][:40]!r}"
            )
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                "warc: missing or non-integer Content-Length"
            ) from None
        body_start = head_end + len(_CRLF2)
        body_end = body_start + clen
        if body_end > n:
            raise ValueError("warc: payload truncated")
        yield {
            "record_id": fields.get("warc-record-id", ""),
            "warc_type": fields.get("warc-type", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_type": fields.get("content-type", ""),
            "n_bytes": clen,
            "payload": data[body_start:body_end],
        }
        pos = body_end


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WARC.GZ files under ``path`` into one row per record
    (WARC_SCHEMA). One file per task via binaryFile; the parser runs
    as an Arrow-batched mapInPandas — bytes never cross a row-at-a-
    time Python boundary."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(blob)):
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=WARC_SCHEMA
    )


def build_warc(records: list[dict]) -> bytes:
    """Serialize records (record_id, warc_type, target_uri, warc_date,
    content_type, payload bytes) into a spec-shaped WARC byte stream —
    the fixture builder tests and the oracle key use. Deliberately a
    separate code path from the parser (string formatting vs parsing)
    so a round trip actually proves both sides."""
    parts = []
    for r in records:
        payload = r["payload"]
        head = (
            "WARC/1.0\r\n"
            f"WARC-Record-ID: {r['record_id']}\r\n"
            f"WARC-Type: {r['warc_type']}\r\n"
            f"WARC-Target-URI: {r['target_uri']}\r\n"
            f"WARC-Date: {r['warc_date']}\r\n"
            f"Content-Type: {r['content_type']}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        parts.append(head + payload + _CRLF2)
    return b"".join(parts)


def build_warc_gz(records: list[dict]) -> bytes:
    """build_warc with each record its own gzip member (the canonical
    .warc.gz layout)."""
    import gzip

    return b"".join(
        gzip.compress(build_warc([r])) for r in records
    )


def split_http_payload(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Split the HTTP response envelope off WARC ``response`` payloads
    (real crawl records carry ``application/http; msgtype=response``
    bodies: status line + headers + CRLF CRLF + entity). Adds
    http_status (int), http_content_type, and ``body`` (string) —
    non-HTTP payloads pass through with null status/content-type and
    the whole payload as body. Pure codegen expressions over the
    payload cast to string; no Python, no shuffle."""
    from pyspark.sql import functions as F

    s = F.col(payload_col).cast("string")
    sep = F.instr(s, "\r\n\r\n")
    is_http = s.startswith("HTTP/1.")
    status = F.when(
        is_http,
        F.nullif(
            F.regexp_extract(s, r"^HTTP/1\.[01] (\d{3})", 1), F.lit("")
        ).cast("int"),
    )
    ctype = F.when(
        is_http,
        F.nullif(
            F.regexp_extract(
                s, r"(?im)^content-type:[ \t]*([^\r\n]+)", 1
            ),
            F.lit(""),
        ),
    )
    body = F.when(
        is_http & (sep > 0), s.substr(sep + F.lit(4), F.length(s))
    ).otherwise(s)
    return (
        df.withColumn("http_status", status)
        .withColumn("http_content_type", ctype)
        .withColumn("body", body)
    )
