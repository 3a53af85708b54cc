"""Link-graph kernels (webr.links): extractor edge cases, PageRank vs a
NumPy power-iteration twin (incl. the dangling-node path the synthetic
corpus never hits), and degree arithmetic."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from webr.links import extract_links, link_targets, pagerank, synth_link_html


# --------------------------------------------------------------------------
# extractor

def test_extract_links_quote_styles():
    html = ('<a href="http://a/1">one</a>'
            "<a href='http://a/2'>two</a>"
            "<a href=http://a/3>three</a>")
    assert extract_links(html) == [
        ("http://a/1", "one"), ("http://a/2", "two"), ("http://a/3", "three")]


def test_extract_links_case_attr_order_and_markup():
    html = ('<A rel="nofollow" HREF="http://a/x" target=_blank>'
            "see <b>bold</b>\n  text</A>")
    assert extract_links(html) == [("http://a/x", "see bold text")]


def test_extract_links_ragged_html():
    # no href -> skipped; unclosed trailing <a> -> skipped; empty/None ok
    assert extract_links('<a name="top">anchor-less</a>'
                         '<a href="http://a/1">ok</a>'
                         '<a href="http://a/2">never closed') == [
        ("http://a/1", "ok")]
    assert extract_links("") == []
    assert extract_links(None) == []
    # href in a LATER tag must not be claimed by an earlier href-less <a>
    assert extract_links('<a id="x">first</a><a href="u">second</a>') == [
        ("u", "second")]
    # data-href is NOT href
    assert extract_links('<a data-href="bad" href="good">t</a>') == [
        ("good", "t")]


def test_synth_html_roundtrip_matches_arithmetic():
    n = 37
    for did in range(n):
        got = [(int(h.rsplit("/", 1)[-1]), a)
               for h, a in extract_links(synth_link_html(did, n))]
        want = [(dst, f"see doc {dst}") for dst in link_targets(did, n)]
        assert got == want, did


def test_link_targets_invariants():
    n = 50
    for did in range(n):
        ts = link_targets(did, n)
        assert all(0 <= t < n and t != did for t in ts)
        assert len(ts) >= 1  # no dangling pages
    # hub skew: every 10th page cites doc 0
    assert all(0 in link_targets(d, n) for d in range(10, n, 10))


# --------------------------------------------------------------------------
# PageRank vs NumPy power iteration

def _numpy_pagerank(n: int, edges: list[tuple[int, int]], iters: int,
                    d: float) -> np.ndarray:
    outd = np.zeros(n)
    for s, _ in edges:
        outd[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = r[outd == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[t] += d * r[s] / outd[s]
        r = nxt
    return r


@pytest.mark.parametrize("edges,n", [
    # synthetic-corpus shape (no dangling)
    ([(s, t) for s in range(30) for t in set(link_targets(s, 30))], 30),
    # explicit dangling node: 3 has no out-links
    ([(0, 1), (1, 2), (2, 0), (0, 3), (1, 3)], 4),
])
def test_pagerank_matches_numpy(spark, edges, n):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["r"]
           for r in pagerank(nodes, edf, iters=5, damping=0.85).collect()}
    want = _numpy_pagerank(n, edges, iters=5, d=0.85)
    assert len(got) == n
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12), i
    # a probability distribution: mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_extract_links_roundtrip_property():
    """Property: ANY list of (href, anchor) pairs rendered through a
    randomized-but-valid HTML template — random quote style, attribute
    order, tag case, inter-tag junk text — is recovered exactly, in
    order. Hypothesis drives the renderer; the extractor never sees the
    generation parameters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    href_st = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                               whitelist_characters=":/._-"),
        min_size=1, max_size=30).filter(
            lambda s: not s.isspace() and ">" not in s)
    anchor_st = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                               whitelist_characters=" .,"),
        min_size=0, max_size=20)
    junk_st = st.text(
        alphabet=st.characters(whitelist_categories=("Ll",),
                               whitelist_characters=" "),
        max_size=10)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(href_st, anchor_st, junk_st,
                              st.integers(0, 2), st.booleans(),
                              st.booleans()),
                    max_size=8))
    def run(items):
        parts = ["<html><body>"]
        want = []
        for href, anchor, junk, quote, upper, extra_attr in items:
            q = ['"', "'", ""][quote]
            if quote == 2 and (" " in href or not href):
                q = '"'  # unquoted href cannot hold spaces / be empty
            tag = "A" if upper else "a"
            attr = ' rel="x"' if extra_attr else ""
            pre = attr if extra_attr else ""
            parts.append(
                f"{junk}<{tag}{pre} href={q}{href}{q}{attr}>"
                f"{anchor}</{tag}>")
            want.append((href, " ".join(anchor.split())))
        parts.append("</body></html>")
        got = extract_links("".join(parts))
        assert got == want

    run()


def test_pagerank_partition_invariance(spark):
    """The oracled query rounds ranks at 7dp; that is only a valid
    cross-engine contract if the rounded values are invariant to Spark's
    partition-dependent summation order. Pin it: same graph, different
    partitionings, identical round-7 output."""
    import pyspark.sql.functions as F
    n = 40
    edges = [(s, t) for s in range(n) for t in set(link_targets(s, n))]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    outs = []
    for parts in (2, 13):
        edf = spark.createDataFrame(edges, "src long, dst long") \
            .repartition(parts)
        r = pagerank(nodes, edf, iters=5, damping=0.85)
        outs.append(sorted(
            (row["id"], row["r7"]) for row in
            r.select("id", F.round("r", 7).alias("r7")).collect()))
    assert outs[0] == outs[1]


def test_pagerank_50_iters_bounded(spark):
    """Real iteration counts: 50 rounds must stay fast and flat —
    localCheckpoint every 10 rounds cuts the lineage to a leaf, so the
    final logical plan is shallow instead of 50 joins deep, and no
    intermediate cache survives the call (eo / dang_ids / per-round
    states are all unpersisted; only the returned ranks remain)."""
    import time

    import pyspark.sql.functions as F
    n = 60
    edges = [(s, t) for s in range(n) for t in set(link_targets(s, n))]
    # make doc 59 dangling so the dangling-mass branch runs all 50 rounds
    edges = [(s, t) for (s, t) in edges if s != 59]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    def persistent_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = persistent_ids()
    t0 = time.monotonic()
    r = pagerank(nodes, edf, iters=50, damping=0.85)
    wall = time.monotonic() - t0
    total = r.agg(F.sum("r")).first()[0]
    assert abs(total - 1.0) < 1e-9          # mass conserved through 50 rounds
    assert wall < 120                        # no per-round plan blowup
    # iter 50 ends on a checkpoint boundary: the plan is a leaf scan,
    # not a 50-deep join tree
    plan = r._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    after = persistent_ids()
    assert len(after - before) <= 1          # only the returned ranks
    r.unpersist()


def test_pagerank_tol_early_exit_matches_converged(spark):
    """tol: iteration stops once the L1 delta drops below it (damping
    0.5 contracts the delta ~2x/round, so 1e-10 is reached around round
    35 of the granted 200), and the early-exited ranks equal a fixed
    deep run to well beyond the tolerance (the fixed point is the fixed
    point)."""
    n = 40
    edges = [(s, t) for s in range(n) for t in set(link_targets(s, n))]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    early = {row["id"]: row["r"] for row in
             pagerank(nodes, edf, iters=200, damping=0.5,
                      tol=1e-10).collect()}
    assert pagerank.last_iters < 60         # it really exited early
    deep = {row["id"]: row["r"] for row in
            pagerank(nodes, edf, iters=60, damping=0.5).collect()}
    assert set(early) == set(deep)
    assert all(abs(early[i] - deep[i]) < 1e-8 for i in early)
    assert abs(sum(early.values()) - 1.0) < 1e-9


def test_streaming_link_indegree(spark):
    """Streaming twin of link_degree: pages stream in, links are
    extracted with the SAME kernel, and windowed per-host in-degree
    equals the arithmetic ground truth (every link occurrence counted,
    split across two 1h event-time windows)."""
    import os
    import tempfile

    import pandas as pd

    from webr import schema
    from webr.streaming import streaming_link_indegree

    n = 24
    rows = []
    for i in range(n):
        rows.append({
            "url": f"https://src.example.net/p/{i}",
            # first half in hour 0, second half in hour 1
            "warc_ts": pd.Timestamp("2024-01-01 00:05:00")
            + pd.Timedelta(hours=int(i >= n // 2)),
            "html": synth_link_html(i, n).encode(),
            "text": "", "lang": "eng"})
    pdf = pd.DataFrame(rows)
    in_dir = os.path.join(tempfile.mkdtemp(prefix="webr_slink_"), "in")
    (spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES).repartition(3).write.parquet(in_dir))

    stream = spark.readStream.schema(schema.PAGES).parquet(in_dir)
    q = (streaming_link_indegree(stream)
         .writeStream.outputMode("complete").format("memory")
         .queryName("slink").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(str(r["window_start"]), r["target_host"]): r["in_links"]
           for r in spark.sql("SELECT * FROM slink").collect()}
    want_h0 = sum(len(link_targets(i, n)) for i in range(n // 2))
    want_h1 = sum(len(link_targets(i, n)) for i in range(n // 2, n))
    assert got == {
        ("2024-01-01 00:00:00", "docs.example.org"): want_h0,
        ("2024-01-01 01:00:00", "docs.example.org"): want_h1,
    }


def test_streaming_link_indegree_edge_hrefs(spark):
    """ADVICE r4: 'HTTP://Host/..' must count under the lowercased host
    (case-insensitive scheme match), relative/schemeless hrefs must be
    DROPPED (not pooled into one '' host group), and a null-warc_ts page
    contributes nothing (dropped explicitly, not aliased to epoch)."""
    import os
    import tempfile

    import pandas as pd

    from webr import schema
    from webr.streaming import streaming_link_indegree

    ts = pd.Timestamp("2024-01-01 00:05:00")
    html = (b'<html><body>'
            b'<a href="HTTP://Upper.Example.ORG/x">u</a>'
            b'<a href="https://plain.example.org/y">p</a>'
            b'<a href="/relative/path">r</a>'
            b'<a href="no-scheme.html">n</a>'
            b'</body></html>')
    rows = [
        {"url": "https://s/1", "warc_ts": ts, "html": html,
         "text": "", "lang": "eng"},
        # same links but no timestamp: must not appear anywhere
        {"url": "https://s/2", "warc_ts": None, "html": html,
         "text": "", "lang": "eng"},
    ]
    pdf = pd.DataFrame(rows)
    in_dir = os.path.join(tempfile.mkdtemp(prefix="webr_slinke_"), "in")
    (spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES).write.parquet(in_dir))
    stream = spark.readStream.schema(schema.PAGES).parquet(in_dir)
    q = (streaming_link_indegree(stream)
         .writeStream.outputMode("complete").format("memory")
         .queryName("slinke").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(str(r["window_start"]), r["target_host"]): r["in_links"]
           for r in spark.sql("SELECT * FROM slinke").collect()}
    assert got == {
        ("2024-01-01 00:00:00", "upper.example.org"): 1,
        ("2024-01-01 00:00:00", "plain.example.org"): 1,
    }


def test_link_degree_hub_skew(spark):
    from webr.queries.linkgraph import q_link_degree
    deg = {r["doc_id"]: (r["out_deg"], r["in_deg"])
           for r in q_link_degree(spark, "/root/testdata/sf0.001").collect()}
    n = len(deg)
    # arithmetic twin, straight from link_targets
    want_in = {i: 0 for i in range(n)}
    for s in range(n):
        for t in set(link_targets(s, n)):
            want_in[t] += 1
    for i in range(n):
        assert deg[i] == (len(set(link_targets(i, n))), want_in[i]), i
    # the hub REALLY is skewed (its in-degree ~ n/10 + mod-rule hits)
    assert deg[0][1] >= n // 10
