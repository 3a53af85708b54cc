"""WARC source: read Common-Crawl-style WARC files into the PAGES schema.

Method sources (public): the WARC 1.0 format (ISO 28500 — records of
``WARC/1.0\\r\\n`` header block, ``Content-Length`` body, blank-line
terminators) and Common Crawl's cc-pyspark pattern (one WARC file per
task via a binary-file source; records parsed streaming inside the
task — the files are independently splittable units, so a 100 TB crawl
parallelizes by file with zero shuffle). Common Crawl gzips each record
as its own member; ``gzip.decompress`` consumes concatenated members, so
the same code path reads .warc and .warc.gz.

The parser is deliberately tolerant (crawl WARCs are ragged): records
without a target URI / Content-Length, or of types other than
response/resource, are skipped, never raised.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from webr import schema

_CRLF = b"\r\n"


def warc_record_bytes(url: str, date: str, body: bytes,
                      warc_type: str = "response",
                      http_headers: bool = True) -> bytes:
    """One well-formed WARC record (writer twin of the parser — used by
    the sink test and the oracle query's synthesizer). ``date`` is the
    WARC-Date string (e.g. ``2024-01-01T00:00:00Z``). For ``response``
    records the body is wrapped in a minimal HTTP/1.1 response block
    (the shape Common Crawl stores); ``resource`` records carry the
    payload bare."""
    if warc_type == "response" and http_headers:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   + b"Content-Length: " + str(len(body)).encode()
                   + b"\r\n\r\n" + body)
    else:
        payload = body
    head = (b"WARC/1.0\r\n"
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF)
    return head + payload + _CRLF + _CRLF


def _split_http_payload(payload: bytes) -> bytes:
    """Drop the stored HTTP response headers, keep the entity body."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{url, date, html}`` for each response/resource record in a
    WARC blob (plain or multi-member gzip). Ragged input skips, never
    raises."""
    if data[:2] == b"\x1f\x8b":  # gzip magic; multi-member ok
        import zlib
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):  # corrupt member: skip
            return
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # cannot locate the body boundary — resync on the next magic
            pos = start + 5
            continue
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        if wtype in ("response", "resource") and url:
            yield {"url": url,
                   "date": headers.get("warc-date", ""),
                   "html": (_split_http_payload(body)
                            if wtype == "response" else body)}


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC files -> PAGES-schema DataFrame. One file per task
    (``binaryFile`` source — Spark's whole-file reader), records parsed
    streaming inside the task; no shuffle. ``text``/``lang`` are left
    empty — extraction is the pipeline's first stage, same as the
    parquet source."""
    import pandas as pd

    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in iter_warc_records(bytes(content)):
                    rows.append({
                        "url": rec["url"],
                        "warc_ts": pd.to_datetime(
                            rec["date"], utc=True, errors="coerce")
                        .tz_localize(None) if rec["date"] else None,
                        "html": rec["html"], "text": "", "lang": ""})
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(gen, schema.PAGES)
