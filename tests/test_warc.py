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


def test_warc_multimember_gzip_streams_bounded():
    """Common-Crawl shape: every record its own gzip member. The
    streaming walk must (a) recover every record byte-identically and
    (b) never hand the parser one giant chunk — per-member
    zlib.decompressobj with a small read size keeps every yielded chunk
    bounded (the old whole-file gzip.decompress is the 100-TB killer
    this replaces)."""
    import io

    from webr.warc import _gz_chunks, iter_warc_records_file

    pages = _mk_pages(30)
    members = [gzip.compress(warc_record_bytes(
        r.url, "2024-05-01T00:00:00Z", bytes(r.html)))
        for r in pages.itertuples()]
    blob = b"".join(members)

    chunk = 1024
    sizes = [len(c) for c in _gz_chunks(io.BytesIO(blob), chunk)]
    assert len(sizes) > 1                      # really incremental
    assert max(sizes) <= 64 * chunk            # no whole-archive chunk

    got = list(iter_warc_records_file(io.BytesIO(blob), chunk_bytes=chunk))
    want = {r.url: bytes(r.html) for r in pages.itertuples()}
    assert {g["url"]: g["html"] for g in got} == want
    # trailing garbage after the last member ends the walk quietly
    got2 = list(iter_warc_records_file(
        io.BytesIO(blob + b"not gzip trailing junk"), chunk_bytes=chunk))
    assert len(got2) == len(got)


def test_warc_tiny_chunks_match_eager():
    """Chunk boundaries may split the magic, a header line, or a body:
    a 7-byte read size must still parse identically to one-shot bytes."""
    import io

    from webr.warc import iter_warc_records_file

    pages = _mk_pages(9)
    blob = b"".join(warc_record_bytes(
        r.url, "2024-02-02T02:02:02Z", bytes(r.html))
        for r in pages.itertuples())
    eager = list(iter_warc_records(blob))
    tiny = list(iter_warc_records_file(io.BytesIO(blob), chunk_bytes=7))
    assert eager == tiny and len(eager) == len(pages)


def test_warc_negative_content_length_terminates():
    """ADVICE r4 (medium): a negative Content-Length must not move the
    scan backwards — the old parser re-parsed the same record forever.
    The bad record is skipped, later records still parse, and the walk
    terminates."""
    good1 = warc_record_bytes("https://x/a", "2024-01-01T00:00:00Z",
                              b"<html>a</html>")
    bad = good1.replace(b"WARC-Target-URI: https://x/a",
                        b"WARC-Target-URI: https://x/bad")
    bad = bad.replace(b"Content-Length: ", b"Content-Length: -9999", 1)
    good2 = warc_record_bytes("https://x/b", "2024-01-01T00:00:00Z",
                              b"<html>b</html>")
    got = list(iter_warc_records(bad + good1 + good2))
    urls = [r["url"] for r in got]
    assert urls == ["https://x/a", "https://x/b"]


def test_warc_page_batches_bounded():
    """read_warc_pages yields bounded frames, not one frame per file:
    row cap and html-byte cap both close a batch."""
    from webr.warc import _page_batches

    recs = [{"url": f"https://x/{i}", "date": "2024-01-01T00:00:00Z",
             "html": b"x" * 10} for i in range(10)]
    out = list(_page_batches(iter(recs), batch_rows=3, batch_bytes=1 << 30))
    assert [len(b) for b in out] == [3, 3, 3, 1]
    assert list(out[0].columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert all(bytes(h) == b"x" * 10 for b in out for h in b.html)

    out_b = list(_page_batches(iter(recs), batch_rows=100, batch_bytes=25))
    # 10-byte bodies: the byte cap trips on every 3rd record
    assert [len(b) for b in out_b] == [3, 3, 3, 1]
    assert list(out_b[0].url) == ["https://x/0", "https://x/1",
                                  "https://x/2"]


def test_warc_source_through_full_pipeline(spark, corpus_pd, pipeline_out):
    """S7 end-to-end: the WARC source feeding the flagship path (ref
    lifecycle SURVEY §3.1 starts at the scan). The same corpus written
    as multi-member .warc.gz files and read back through read_warc_pages
    must produce IDENTICAL clusters to the createDataFrame-source run —
    source format must be invisible to the pipeline."""
    import shutil

    from webr.engine import Pipeline

    d = tempfile.mkdtemp(prefix="webr_warc_pipe_")
    wh = tempfile.mkdtemp(prefix="webr_warc_pipe_wh_")
    try:
        # two files (two tasks), each record its own gzip member
        half = len(corpus_pd) // 2
        for i, part in enumerate((corpus_pd.iloc[:half],
                                  corpus_pd.iloc[half:])):
            with open(os.path.join(d, f"seg-{i}.warc.gz"), "wb") as f:
                for r in part.itertuples():
                    f.write(gzip.compress(warc_record_bytes(
                        r.url,
                        pd.Timestamp(r.warc_ts).strftime(
                            "%Y-%m-%dT%H:%M:%SZ"),
                        bytes(r.html))))
        pages = read_warc_pages(spark, d)
        out = Pipeline(spark, wh, input_id="warc-e2e-v1").run(pages)
        got = (out["clusters"].toPandas()
               .sort_values("url").reset_index(drop=True))
        want = (pipeline_out["clusters"].toPandas()
                .sort_values("url").reset_index(drop=True))
        assert list(got.url) == list(want.url)
        assert list(got.cluster_id) == list(want.cluster_id)
        assert list(got.is_noise) == list(want.is_noise)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)
