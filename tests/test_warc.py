"""WARC source (webr.warc): byte-identical round-trip through real
.warc/.warc.gz files, ragged-input tolerance, and pipeline integration
(WARC-read pages extract identically to parquet-read pages — the
north-gate byte-identical-text contract is format-independent)."""

from __future__ import annotations

import gzip
import os
import tempfile

import pandas as pd

from webr.warc import iter_warc_records, read_warc_pages, warc_record_bytes


def _mk_pages(n=12):
    from webr.synth import generate_pages, pages_to_pandas
    return pages_to_pandas(generate_pages(
        n_entities=3, pages_per_entity=n // 3, seed=11))


def test_warc_roundtrip_files_byte_identical(spark):
    pages = _mk_pages()
    d = tempfile.mkdtemp(prefix="webr_warc_")
    half = len(pages) // 2
    plain = b"".join(
        warc_record_bytes(r.url, "2024-03-01T06:00:00Z", bytes(r.html))
        for r in pages.iloc[:half].itertuples())
    gzd = b"".join(
        gzip.compress(
            warc_record_bytes(r.url, "2024-03-01T07:00:00Z",
                              bytes(r.html)))
        for r in pages.iloc[half:].itertuples())
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(plain)
    with open(os.path.join(d, "b.warc.gz"), "wb") as f:
        f.write(gzd)

    got = read_warc_pages(spark, d).toPandas().sort_values(
        "url").reset_index(drop=True)
    want = pages.sort_values("url").reset_index(drop=True)
    assert list(got.url) == list(want.url)
    # the north gate is byte-identical extraction; that starts with
    # byte-identical html out of the container format
    assert all(bytes(a) == bytes(b) for a, b in zip(got.html, want.html))
    assert str(got.warc_ts.min()) == "2024-03-01 06:00:00"
    assert (got.text == "").all() and (got.lang == "").all()


def test_warc_parser_ragged_input():
    ok = warc_record_bytes("https://x/1", "2024-01-01T00:00:00Z",
                           b"<html>one</html>")
    req = warc_record_bytes("https://x/skip", "2024-01-01T00:00:00Z",
                            b"GET / HTTP/1.1", warc_type="request")
    bad_len = ok.replace(b"Content-Length: ", b"Content-Length: zz", 1)
    truncated = ok[: len(ok) // 2]
    resource = warc_record_bytes("https://x/2", "2024-01-01T00:00:00Z",
                                 b"bare payload", warc_type="resource",
                                 http_headers=False)
    blob = req + bad_len + ok + resource + truncated
    got = list(iter_warc_records(blob))
    # ragged pieces skipped; both well-formed content records survive
    urls = [r["url"] for r in got]
    assert "https://x/1" in urls and "https://x/2" in urls
    assert "https://x/skip" not in urls
    by = {r["url"]: r["html"] for r in got}
    assert by["https://x/1"] == b"<html>one</html>"   # HTTP block stripped
    assert by["https://x/2"] == b"bare payload"       # resource kept bare
    # corrupt gzip never raises
    assert list(iter_warc_records(b"\x1f\x8b\x08garbage")) == []
    assert list(iter_warc_records(b"")) == []


def test_warc_pages_extract_identically(spark):
    """Same pages through the WARC source and through createDataFrame
    must produce identical mention extraction (format independence)."""
    from webr import schema
    from webr.engine import build_mentions

    pages = _mk_pages()
    d = tempfile.mkdtemp(prefix="webr_warc_int_")
    with open(os.path.join(d, "c.warc"), "wb") as f:
        for r in pages.itertuples():
            f.write(warc_record_bytes(
                r.url, pd.Timestamp(r.warc_ts).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"), bytes(r.html)))

    via_warc = build_mentions(read_warc_pages(spark, d)).toPandas()
    via_df = build_mentions(spark.createDataFrame(
        pages[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)).toPandas()
    a = via_warc.sort_values("url").reset_index(drop=True)
    b = via_df.sort_values("url").reset_index(drop=True)
    for col in ("url", "name_norm", "host", "first", "middle", "last"):
        assert list(a[col]) == list(b[col]), col
