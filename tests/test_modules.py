"""Streaming ingest, ANN similarity, multimodal plumbing."""

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest


# --- streaming ---------------------------------------------------------------

def test_streaming_ingest_and_window_counts(spark, corpus_pd):
    from webr import schema
    from webr.streaming import ingest_to_staging, windowed_host_counts

    d = tempfile.mkdtemp(prefix="webr_stream_")
    in_dir = os.path.join(d, "in")
    staging = os.path.join(d, "staging")
    ckpt = os.path.join(d, "ckpt")
    pages = spark.createDataFrame(
        corpus_pd[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    pages.repartition(4).write.parquet(in_dir)

    q = ingest_to_staging(spark, in_dir, staging, ckpt)
    q.awaitTermination(120)
    staged = spark.read.parquet(staging)
    assert staged.count() == len(corpus_pd)
    assert "_epoch" in staged.columns

    # re-run with same checkpoint: no duplicate ingestion (exactly-once)
    q2 = ingest_to_staging(spark, in_dir, staging, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(staging).count() == len(corpus_pd)

    # windowed aggregation parity with the batch equivalent
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401
    stream = (spark.readStream.schema(schema.PAGES).parquet(in_dir))
    from webr.streaming import windowed_host_counts as whc
    agg = whc(stream)
    mq = (agg.writeStream.outputMode("complete")
          .format("memory").queryName("hostcounts")
          .trigger(availableNow=True).start())
    mq.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n_pages) AS n FROM hostcounts").collect()[0]["n"]
    assert got == len(corpus_pd)


def test_streaming_incremental_assign_stateful(spark, corpus_pd):
    """applyInPandasWithState C6: first drop creates representatives; a
    RESTARTED query (same checkpoint) must resume with that state — pages
    of the same entity arriving later link to the first drop's rep, and
    assignments agree with the compat gate (same-entity pages of one
    block share exactly one rep)."""
    from webr import schema
    from webr.streaming import incremental_assign_query

    d = tempfile.mkdtemp(prefix="webr_incr_")
    in_dir, out_dir, ckpt = (os.path.join(d, x)
                             for x in ("in", "out", "ckpt"))
    os.makedirs(in_dir)
    pages = spark.createDataFrame(
        corpus_pd[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    half1 = pages.where(F.crc32("url") % 2 == 0)
    half2 = pages.where(F.crc32("url") % 2 == 1)

    half1.write.parquet(os.path.join(in_dir, "drop1"))
    q1 = incremental_assign_query(
        spark, in_dir + "/drop*", out_dir, ckpt)
    q1.awaitTermination(180)
    first = spark.read.parquet(out_dir).toPandas()
    assert len(first) == half1.count() and first.is_new.any()

    # second drop, NEW query object, same checkpoint -> state restored
    half2.write.parquet(os.path.join(in_dir, "drop2"))
    q2 = incremental_assign_query(
        spark, in_dir + "/drop*", out_dir, ckpt)
    q2.awaitTermination(180)
    allout = spark.read.parquet(out_dir).toPandas()
    assert len(allout) == pages.count()

    # per (bk, entity) exactly one representative, established in drop1
    # when the entity appeared there (state survived the restart)
    truth = corpus_pd[["url", "entity_id"]]
    merged = allout.merge(truth, on="url")
    per_entity = merged.groupby(["bk", "entity_id"])["rep"].nunique()
    # compat-gate granularity: an entity never splits within a block
    # unless the generator emitted incompatible name variants; the synth
    # corpus pins names per entity, so reps are unique per (bk, entity)
    assert (per_entity == 1).all()
    seen_drop1 = set(first.url)
    rep_drop1 = merged[merged.url.isin(seen_drop1)].groupby(
        ["bk", "entity_id"])["rep"].first()
    rep_all = merged.groupby(["bk", "entity_id"])["rep"].first()
    for k, r in rep_drop1.items():
        assert rep_all[k] == r
    shutil.rmtree(d, ignore_errors=True)


# --- similarity: LSH vs brute force ------------------------------------------

@pytest.fixture(scope="module")
def embeddings_df(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_lsh_recall_vs_brute_force(spark, embeddings_df):
    from webr.similarity import brute_force_topk, lsh_topk
    queries = (embeddings_df.where(F.col("vec_id") % 100 == 0)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    exact = brute_force_topk(embeddings_df, queries, k=5).toPandas()
    approx = lsh_topk(embeddings_df, queries, dim=64, k=5,
                      n_tables=6, n_bits=4, probe_hamming=1).toPandas()
    exact_sets = exact.groupby("q_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("q_id")["vec_id"].apply(set)
    recalls = [len(exact_sets[q] & approx_sets.get(q, set()))
               / len(exact_sets[q]) for q in exact_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_runs_and_ranks(spark, embeddings_df):
    from webr.similarity import ivf_topk
    queries = (embeddings_df.where(F.col("vec_id") % 250 == 0)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    res = ivf_topk(embeddings_df, queries, dim=64, k=3).toPandas()
    assert set(res.columns) == {"q_id", "vec_id", "cosine", "rk"}
    assert (res.groupby("q_id")["rk"].max() <= 3).all()
    assert len(res) > 0


# --- learned blocking (A11/M4) -------------------------------------------------

def test_learned_blocking_dnf(spark):
    from webr.blocking_learn import evaluate_scheme, learn_dnf
    # 400 labeled pairs; pred_good covers most matches tightly, pred_extra
    # adds the remaining matches plus some noise, pred_all covers everything
    # (rr=0 => adding it must never help).
    rows = []
    for i in range(400):
        match = i % 10 == 0                      # 40 matches
        pred_good = match and i % 20 == 0        # half the matches, 0 noise
        pred_extra = match or (i % 7 == 0)       # all matches + noise
        rows.append((match, pred_good, pred_extra, True))
    pairs = spark.createDataFrame(
        rows, "match boolean, pred_good boolean, pred_extra boolean, "
              "pred_all boolean")
    steps = learn_dnf(pairs, ["pred_good", "pred_extra", "pred_all"])
    assert steps, "learner must pick at least one term"
    final = steps[-1]
    assert "pred_all" not in final.predicates     # rr=0 term never helps
    # F must be monotonically non-decreasing across greedy steps
    fs = [s.f for s in steps]
    assert fs == sorted(fs)
    # the scheme must beat each single weaker predicate it extends
    ev_extra = evaluate_scheme(pairs, ["pred_extra"])
    assert final.f >= ev_extra.f
    assert 0.0 <= final.rr <= 1.0 and 0.0 <= final.pc <= 1.0
    # sanity of the metric definitions on a known scheme
    ev_good = evaluate_scheme(pairs, ["pred_good"])
    assert ev_good.pc == 0.5 and ev_good.rr == 1.0 - 20 / 400


# --- multimodal ---------------------------------------------------------------

def test_multimodal_meta_and_frames(spark, corpus_pd):
    from webr import schema
    from webr.multimodal import (extract_media_meta, pages_as_media,
                                 sample_frames)
    pages = spark.createDataFrame(
        corpus_pd.head(60)[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    media = pages_as_media(pages)
    meta = extract_media_meta(media).toPandas()
    assert len(meta) == 60
    assert (meta.n_bytes > 0).all()
    assert meta.sha256.str.len().eq(64).all()
    assert set(meta.kind) <= {"image", "audio", "video"}
    assert (meta[meta.kind == "image"].n_frames == 1).all()

    frames = sample_frames(media, every_n=8).toPandas()
    assert (frames.frame_no % 8 == 0).all()
    assert frames.frame.map(len).eq(32).all()
    # deterministic: same input -> same frames
    frames2 = sample_frames(media, every_n=8).toPandas()
    assert frames.sort_values(["media_id", "frame_no"]).frame.map(
        bytes.hex).tolist() == frames2.sort_values(
        ["media_id", "frame_no"]).frame.map(bytes.hex).tolist()


def test_multimodal_raise_stub(spark, corpus_pd):
    from webr import schema
    from webr.multimodal import extract_media_meta, pages_as_media
    pages = spark.createDataFrame(
        corpus_pd.head(4)[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    with pytest.raises(Exception, match="codec"):
        extract_media_meta(pages_as_media(pages),
                           decode_stub="raise").collect()


# --- connected components: distributed final pass (_resolve) ------------------

def test_cc_resolve_matches_single_task(spark):
    """Force the residual-forest budget to 0 so the ladder finishes via the
    distributed min-label propagation instead of the single final task; the
    labels must be identical. Graph: chains + stars + cross-partition
    bridges scattered over many partitions."""
    from webr.cluster import connected_components
    edges = []
    # 40 chains of length 6 (urls interleaved so partitions cut chains)
    for c in range(40):
        for i in range(5):
            edges.append((f"u{i * 40 + c:04d}", f"u{(i + 1) * 40 + c:04d}"))
    # a star and a bridge merging two chains
    for i in range(10):
        edges.append(("star-center", f"star-leaf-{i}"))
    edges.append(("u0000", "u0001"))
    df = (spark.createDataFrame(edges, "url_1 string, url_2 string")
          .repartition(16))
    single = (connected_components(df, final_rows_max=10**9).toPandas()
              .sort_values("url").reset_index(drop=True))
    dist = (connected_components(df, final_rows_max=0).toPandas()
            .sort_values("url").reset_index(drop=True))
    assert list(single.url) == list(dist.url)
    assert list(single.rep) == list(dist.rep)
    # reps are component minima
    mins = single.groupby("rep")["url"].min()
    assert (mins.index == mins.values).all()


# --- warehouse MERGE/upsert (K4) ----------------------------------------------

def test_warehouse_merge_upsert(spark, warehouse_dir):
    """K4 MERGE semantics: incoming rows replace same-key rows, others are
    kept, new keys insert; the manifest chains the parent snapshot."""
    from webr.catalog import Warehouse
    wh = Warehouse(spark, warehouse_dir)
    v1 = spark.createDataFrame(
        [(1, "alice", 3), (2, "bob", 5), (3, "carol", 2)],
        "cluster_id long, canonical_name string, n_members long")
    wh.write("entities", v1, snapshot="snap-v1")
    upd = spark.createDataFrame(
        [(2, "robert", 6), (4, "dave", 2)],
        "cluster_id long, canonical_name string, n_members long")
    out = (wh.merge("entities", upd, keys=["cluster_id"],
                    snapshot="snap-v2").toPandas()
           .sort_values("cluster_id").reset_index(drop=True))
    assert list(out.cluster_id) == [1, 2, 3, 4]
    assert list(out.canonical_name) == ["alice", "robert", "carol", "dave"]
    assert list(out.n_members) == [3, 6, 2, 2]
    man = wh.manifest("entities")
    assert man["table"] == "entities"
    assert man["snapshot"] == "snap-v2"
    assert man["lineage"]["parent"] == "snap-v1"
    assert man["lineage"]["merge_keys"] == ["cluster_id"]
    assert man["rows"] == 4
    # merging into a missing table degrades to a plain write
    wh.merge("fresh", upd, keys=["cluster_id"], snapshot="snap-f1")
    assert wh.manifest("fresh")["snapshot"] == "snap-f1"
    # duplicate key tuples in the incoming df must be rejected, not
    # silently inserted twice
    dup = spark.createDataFrame(
        [(5, "eve", 1), (5, "evelyn", 2)],
        "cluster_id long, canonical_name string, n_members long")
    with pytest.raises(ValueError, match="not unique"):
        wh.merge("entities", dup, keys=["cluster_id"], snapshot="snap-v3")
    # the failed merge left the table untouched
    assert wh.manifest("entities")["snapshot"] == "snap-v2"
    assert wh.read("entities").count() == 4


def test_learned_blocking_cnf(spark):
    from webr.blocking_learn import evaluate_scheme, learn_cnf
    # pred_a / pred_b each admit all matches plus DIFFERENT noise slices;
    # their conjunction keeps PC=1 while shrinking candidates (RR up).
    rows = []
    for i in range(600):
        match = i % 12 == 0                       # 50 matches
        pred_a = match or (i % 5 == 1)            # matches + noise A
        pred_b = match or (i % 7 == 2)            # matches + noise B
        pred_none = True                          # admits everything
        rows.append((match, pred_a, pred_b, pred_none))
    pairs = spark.createDataFrame(
        rows, "match boolean, pred_a boolean, pred_b boolean, "
              "pred_none boolean")
    steps = learn_cnf(pairs, ["pred_a", "pred_b", "pred_none"])
    assert steps, "learner must conjoin at least one predicate"
    final = steps[-1]
    assert set(final.predicates) == {"pred_a", "pred_b"}
    assert "pred_none" not in final.predicates    # rr gain 0: never helps
    assert final.pc == 1.0                        # conjunction kept matches
    # conjunction beats each single predicate
    assert final.rr > evaluate_scheme(pairs, ["pred_a"]).rr
    assert final.f >= evaluate_scheme(pairs, ["pred_a"]).f
    # rr_at_pc gain: maximize RR subject to PC floor
    steps2 = learn_cnf(pairs, ["pred_a", "pred_b", "pred_none"],
                       gain="rr_at_pc", min_pc=0.99)
    assert steps2 and steps2[-1].pc >= 0.99
    assert steps2[-1].rr >= final.rr - 1e-12


def test_entities_host_containment_dedup(spark):
    """A6: top hosts are deduped by substring containment in rank order
    (ref import_clusters.py:148-166) — 'a.mega.org' collapses into the
    higher-ranked 'mega.org'; an unrelated host survives."""
    from webr.engine import build_entities
    rows = []
    hosts = (["mega.org"] * 5 + ["a.mega.org"] * 4 + ["other.net"] * 3
             + ["b.mega.org"] * 2)
    # transitive case: 'x.other.net' is dropped against the SURVIVOR
    # 'other.net', but 'unrelated.io' must not be dropped through an
    # already-dropped middleman
    hosts += ["x.other.net", "unrelated.io"]
    for i, h in enumerate(hosts):
        rows.append((f"u{i:02d}", f"u{i:02d}", h, "jane doe", "jane", "",
                     "doe", ["t"], ["tok"]))
    mentions = spark.createDataFrame(
        rows, "url string, doc_id string, host string, name_norm string, "
              "first string, middle string, last string, "
              "title_toks array<string>, body_toks array<string>")
    idf = spark.createDataFrame([("tok", 0.5)], "token string, idf double")
    clusters = spark.createDataFrame(
        [(f"u{i:02d}", 1, False) for i in range(len(hosts))],
        "url string, cluster_id long, is_noise boolean")
    ents = build_entities(mentions, idf, clusters).toPandas()
    assert len(ents) == 1
    assert list(ents.hosts[0]) == ["mega.org", "other.net", "unrelated.io"]


def test_oversample_minority(spark):
    from webr.blocking_learn import oversample_minority
    pairs = spark.createDataFrame(
        [(i, i % 10 == 0) for i in range(200)], "id long, match boolean")
    out = oversample_minority(pairs).toPandas()
    pos = int(out.match.sum())
    neg = len(out) - pos
    # 20 pos / 180 neg -> factor 9 -> 180/180
    assert pos == 180 and neg == 180
    # every original row survives; replication is exact per-row
    assert out[out.match].id.value_counts().eq(9).all()
    # balanced input is untouched
    bal = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(100)], "id long, match boolean")
    assert oversample_minority(bal).count() == 100


def test_streaming_sessionized_counts_matches_batch(spark):
    """Streaming session_window sessionization must agree with the batch
    lag+cumsum twin (q_sessionize_events) on drained input: same
    per-(user, session) event counts and cent sums."""
    import pandas as pd
    from webr.queries.relational import q_sessionize_events
    from webr.streaming import sessionized_counts

    import datetime as dt
    import os
    import shutil
    import tempfile
    import pyspark.sql.functions as F
    sf = "/root/testdata/sf0.001"
    # file streams need a DIRECTORY source; append-mode session windows
    # only emit once the watermark passes them, so two far-future
    # sentinel drops (processed as LATER micro-batches via
    # maxFilesPerTrigger=1) flush every real session out of state
    d = tempfile.mkdtemp(prefix="webr_sess_")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ev.write.parquet(os.path.join(d, "d1"))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    for i, days in enumerate((1, 2)):
        spark.createDataFrame(
            [(10**9 + i, max_ts + dt.timedelta(days=days), -1,
              "sentinel", 0.0, "")],
            ev.schema).write.parquet(os.path.join(d, f"d{2 + i}"))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(d + "/d*"))
    q = (sessionized_counts(stream)
         .writeStream.outputMode("append")
         .format("memory").queryName("sessions")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.sql("SELECT * FROM sessions WHERE user_id >= 0")
           .toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    shutil.rmtree(d, ignore_errors=True)
    want = (q_sessionize_events(spark, sf).toPandas()
            .sort_values(["user_id", "session_no"]).reset_index(drop=True))
    assert len(got) == len(want)
    ga = got.groupby("user_id")[["n_events", "session_cents"]].sum()
    wa = want.groupby("user_id")[["n_events", "session_cents"]].sum()
    pd.testing.assert_frame_equal(ga, wa, check_dtype=False)
    # per-session multisets agree (session ids differ; counts must match)
    for u in ga.index:
        g = sorted(got[got.user_id == u].n_events)
        w = sorted(want[want.user_id == u].n_events)
        assert g == w, (u, g, w)


def test_streaming_dedup_exact(spark, corpus_pd):
    """Watermark-scoped streaming dedup: duplicated page drops collapse
    to one row per content fingerprint."""
    import os
    import shutil
    import tempfile
    from webr import schema
    from webr.streaming import stream_dedup_exact

    d = tempfile.mkdtemp(prefix="webr_sdd_")
    pages = spark.createDataFrame(
        corpus_pd.head(80)[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    pages.write.parquet(os.path.join(d, "in", "drop1"))
    pages.write.parquet(os.path.join(d, "in", "drop2"))  # exact replay
    stream = (spark.readStream.schema(schema.PAGES)
              .parquet(os.path.join(d, "in", "drop*")))
    q = (stream_dedup_exact(stream)
         .writeStream.outputMode("append")
         .format("parquet")
         .option("path", os.path.join(d, "out"))
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    out = spark.read.parquet(os.path.join(d, "out")).toPandas()
    n_fp = corpus_pd.head(80).html.map(bytes).nunique()
    assert len(out) == n_fp
    assert out.fp.nunique() == n_fp
    shutil.rmtree(d, ignore_errors=True)


# --- CLI entrypoints (ref author_disambiguation.py / record_based_query.py) --

def test_cli_run_and_query(spark, corpus_pd, warehouse_dir, capsys):
    import os
    from webr import schema
    from webr.__main__ import main

    pages_dir = os.path.join(warehouse_dir, "pages_in")
    (spark.createDataFrame(
        corpus_pd[["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES).write.parquet(pages_dir))
    wh = os.path.join(warehouse_dir, "wh")
    rc = main(["run", "--input", pages_dir, "--warehouse", wh,
               "--input-id", "cli-test"])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "clusters=" in out1 and "warehouse=" in out1
    assert os.path.exists(os.path.join(wh, "entities", "_manifest.json"))

    # resume: a second run with the same input-id reuses every stage
    rc = main(["run", "--input", pages_dir, "--warehouse", wh,
               "--input-id", "cli-test"])
    assert rc == 0

    # query: resubmit two corpus pages; each must match its own cluster
    q_dir = os.path.join(warehouse_dir, "q_in")
    urls = sorted(corpus_pd.url)[:2]
    (spark.createDataFrame(
        corpus_pd[corpus_pd.url.isin(urls)]
        [["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES).write.parquet(q_dir))
    q_out = os.path.join(warehouse_dir, "q_out")
    rc = main(["query", "--warehouse", wh, "--pages", q_dir,
               "--out", q_out])
    assert rc == 0
    res = spark.read.parquet(q_out).toPandas()
    assert set(res.q_url) <= set(urls) and len(res) >= 1
    assert (res[res["rank"] == 1].votes >= 1).all()


def test_cli_auto_input_id_tracks_content():
    from webr.__main__ import _auto_input_id
    d = tempfile.mkdtemp(prefix="webr_autoid_")
    p = os.path.join(d, "part-0.parquet")
    open(p, "wb").write(b"A" * 100)
    a = _auto_input_id(d)
    assert a == _auto_input_id(d)          # deterministic
    open(p, "wb").write(b"B" * 101)        # content change -> new id
    b = _auto_input_id(d)
    assert b != a
    # SAME-SIZE rewrite must still change the id (mtime in fingerprint)
    os.utime(p, ns=(1, 1))
    c = _auto_input_id(d)
    open(p, "wb").write(b"C" * 101)
    os.utime(p, ns=(2, 2))
    assert _auto_input_id(d) != c
    # real parquet: row count from the footer reaches the fingerprint
    import pandas as pd
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(p)
    os.utime(p, ns=(3, 3))
    r3 = _auto_input_id(d)
    pd.DataFrame({"x": [1, 2]}).to_parquet(p)
    os.utime(p, ns=(3, 3))
    assert _auto_input_id(d) != r3
    shutil.rmtree(d, ignore_errors=True)


def test_classification_report_and_pr_curve(spark):
    from webr.evalm import classification_report, pr_curve
    rows = [(0.9, True)] * 8 + [(0.9, False)] * 2 \
         + [(0.2, True)] * 1 + [(0.2, False)] * 9
    scored = spark.createDataFrame(rows, "score double, match boolean")
    rep = classification_report(scored, threshold=0.5).toPandas().iloc[0]
    assert (rep.tp, rep.fp, rep.fn, rep.tn) == (8, 2, 1, 9)
    assert rep.precision == 0.8 and rep.f1 == round(2*0.8*(8/9)/(0.8+8/9), 6)
    curve = pr_curve(scored).toPandas()
    assert list(curve.thr) == [0.9, 0.2]
    assert list(curve.n_pred) == [10, 20]
    assert list(curve.n_tp) == [8, 9]
    assert curve.recall.iloc[-1] == 1.0  # lowest threshold recalls all


def test_time_features_missing_ts_markers():
    """A pair with a missing crawl timestamp gets ts_day_diff = -1 and
    era_match = NULL (None) — never a fake 'different era' False."""
    import pandas as pd

    from webr.features import MEMBER_COLUMNS, score_pairs_indexed
    base = {
        "url": ["u0", "u1", "u2"],
        "warc_ts": [pd.Timestamp("2021-03-01"), None,
                    pd.Timestamp("2021-04-15")],
        "doc_id": ["d0", "d1", "d2"],
        "name_norm": ["ann lee", "ann lee", "ann lee"],
        "first": ["ann"] * 3, "middle": [""] * 3, "last": ["lee"] * 3,
        "title_toks": [["x"], ["x"], ["y"]],
        "host": ["a.example"] * 3,
        "w_toks": [[1], [1], [2]], "w_vals": [[1.0], [1.0], [1.0]],
        "w_norm": [1.0, 1.0, 1.0],
    }
    assert set(base) == set(MEMBER_COLUMNS)
    out = score_pairs_indexed(base, [0, 0], [1, 2])
    # (u0, u1): u1 lacks warc_ts -> markers
    assert out["ts_day_diff"][0] == -1 and out["era_match"][0] is None
    # (u0, u2): both present -> real values (45 days apart, same era)
    assert out["ts_day_diff"][1] == 45 and out["era_match"][1] is True


def test_pyfiles_zip_is_zipimportable():
    """The spark-submit --py-files path (north_rule; tools/submit_er.py)
    ships webr as a zip. zipimport does NOT support PEP-420 namespace
    packages, so webr/__init__.py must exist and the zip must import in
    a clean interpreter with ONLY the zip on sys.path — this is exactly
    what a cluster executor (or a cluster-mode driver) sees."""
    import subprocess
    import sys

    from webr.session import _package_zip
    z = _package_zip()
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import webr, webr.engine, webr.queries.dataops, webr.synth; "
        "assert 'webr_pyfiles' in webr.__file__, webr.__file__; "
        "print('zipimport-ok')")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    out = subprocess.run([sys.executable, "-c", probe, z],
                         capture_output=True, text=True, env=env,
                         cwd=tempfile.gettempdir())
    assert out.returncode == 0, out.stderr
    assert "zipimport-ok" in out.stdout


def test_vec_kernel_bitwise():
    """score_pairs_indexed_vec (the engine's kernel) must reproduce the
    scalar oracle-twin kernel cell-for-cell — bitwise floats, identical
    None/bool cells — on a randomized member table that exercises every
    edge: repeated names/hosts/titles (the distinct-pair reduction),
    empty strings, missing timestamps, empty titles, zero-norm weight
    vectors, same-doc pairs, and self-pairs."""
    import random

    import pandas as pd

    from webr.features import (
        FEATURE_COLUMNS, score_pairs_indexed, score_pairs_indexed_vec,
        weight_arrays,
    )
    rng = random.Random(20260818)
    firsts = ["ann", "a", "bob", "", "carol"]
    middles = ["", "j", "jane", "k"]
    lasts = ["lee", "li", "smith", "", "zhao"]
    hosts = ["a.example", "b.example", "", "news.example.org"]
    titles = [[], ["deep", "nets"], ["deep", "nets", "win"], ["x"]]
    toks = ["alpha", "beta", "gamma", "delta", "eps"]
    idf = {t: 1.0 + i * 0.37 for i, t in enumerate(toks)}
    m = 60
    memb = {c: [] for c in ("url", "warc_ts", "doc_id", "name_norm",
                            "first", "middle", "last", "title_toks",
                            "host", "w_toks", "w_vals", "w_norm")}
    for k in range(m):
        f, mi, la = (rng.choice(firsts), rng.choice(middles),
                     rng.choice(lasts))
        memb["url"].append(f"u{k}")
        memb["warc_ts"].append(
            None if rng.random() < 0.2
            else pd.Timestamp("2019-01-01")
            + pd.Timedelta(days=rng.randrange(0, 2500)))
        memb["doc_id"].append(f"d{rng.randrange(0, 40)}")
        memb["name_norm"].append(" ".join(x for x in (f, mi, la) if x))
        memb["first"].append(f)
        memb["middle"].append(mi)
        memb["last"].append(la)
        memb["title_toks"].append(rng.choice(titles))
        memb["host"].append(rng.choice(hosts))
        body = [rng.choice(toks)
                for _ in range(rng.randrange(0, 8))]
        t, v, nm = weight_arrays(body, idf if rng.random() < 0.9 else {})
        memb["w_toks"].append(t)
        memb["w_vals"].append(v)
        memb["w_norm"].append(nm)
    i1 = [rng.randrange(0, m) for _ in range(800)] + [0]
    i2 = [rng.randrange(0, m) for _ in range(800)] + [0]  # self-pair too
    ref = score_pairs_indexed(memb, i1, i2)
    vec = score_pairs_indexed_vec(memb, i1, i2)
    n_edges = 0
    for c in FEATURE_COLUMNS:
        r, v = list(ref[c]), list(vec[c])
        assert len(r) == len(v) == len(i1), c
        for p in range(len(r)):
            if r[p] is None:
                assert v[p] is None, (c, p)
            elif isinstance(r[p], float):
                assert repr(r[p]) == repr(v[p]), (c, p, r[p], v[p])
            else:
                assert r[p] == v[p], (c, p, r[p], v[p])
    n_edges = sum(ref["is_edge"])
    assert sum(1 for x in ref["era_match"] if x is None) > 0
    assert any(ref["compat"]) and any(ref["same_doc"])

    # empty batch: both kernels agree on shape
    e1 = score_pairs_indexed(memb, [], [])
    e2 = score_pairs_indexed_vec(memb, [], [])
    assert all(len(e1[c]) == 0 and len(e2[c]) == 0
               for c in FEATURE_COLUMNS)


def test_sniff_media_formats_and_edges():
    """Pure header parser: real PNG/JPEG/GIF dims round-trip through the
    byte builders; truncated / garbage / dimension-less containers
    degrade to NULLs, never raise."""
    from webr.multimodal import (
        gif_bytes, jpeg_bytes, png_bytes, sniff_media,
    )
    assert sniff_media(png_bytes(640, 480)) == ("png", 640, 480)
    assert sniff_media(jpeg_bytes(1920, 1080)) == ("jpeg", 1920, 1080)
    assert sniff_media(gif_bytes(320, 200)) == ("gif", 320, 200)
    assert sniff_media(b"") == (None, None, None)
    assert sniff_media(b"<html>not media</html>") == (None, None, None)
    assert sniff_media(png_bytes(9, 9)[:20]) == (None, None, None)
    # recognized JPEG whose SOF was truncated away: format, NULL dims
    assert sniff_media(jpeg_bytes(9, 9)[:6]) == ("jpeg", None, None)
    # JPEG with a restart marker before SOF still walks to the dims
    j = jpeg_bytes(33, 44)
    assert sniff_media(j[:2] + b"\xff\xd0" + j[2:]) == ("jpeg", 33, 44)
    # GIF87a variant
    g = bytearray(gif_bytes(12, 34))
    g[3:6] = b"87a"
    assert sniff_media(bytes(g)) == ("gif", 12, 34)


def test_multimodal_sniff_mode(spark):
    """decode_stub='sniff' flows REAL header dims + format through the
    Arrow batch path; unknown payloads keep NULL dims and NULL format."""
    import pandas as pd

    from webr.multimodal import (
        extract_media_meta, jpeg_bytes, png_bytes,
    )
    rows = pd.DataFrame({
        "media_id": ["a", "b", "c"],
        "kind": ["image", "image", "image"],
        "payload": [png_bytes(100, 50), jpeg_bytes(70, 35),
                    b"not an image"],
    })
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary")
    meta = (extract_media_meta(media, decode_stub="sniff")
            .toPandas().set_index("media_id"))
    assert (meta.loc["a", "format"], meta.loc["a", "width"],
            meta.loc["a", "height"]) == ("png", 100, 50)
    assert (meta.loc["b", "format"], meta.loc["b", "width"],
            meta.loc["b", "height"]) == ("jpeg", 70, 35)
    assert meta.loc["c", "format"] is None
    assert pd.isna(meta.loc["c", "width"])
    # 'fake' mode still sniffs the format column (no codec needed)
    fake = (extract_media_meta(media, decode_stub="fake")
            .toPandas().set_index("media_id"))
    assert fake.loc["a", "format"] == "png"
    assert fake.loc["a", "width"] is not None
