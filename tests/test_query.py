"""Incremental record-based query (C6): held-in pages must match their own
cluster at rank 1; unmatchable records must return no rows (the reference's
no-match-correct notion, record_based_query_exp1.py:166-174)."""

import datetime as dt

import pyspark.sql.functions as F

from webr import schema
from webr.query import match_records


def test_query_matches_own_cluster(spark, pipeline_out, corpus_pd):
    clusters = pipeline_out["clusters"]
    non_noise = (clusters.where(~F.col("is_noise"))
                 .limit(500).toPandas())
    # pick 5 urls from distinct clusters
    picks = (non_noise.drop_duplicates("cluster_id").head(5))
    urls = list(picks.url)
    expected = dict(zip(picks.url, picks.cluster_id))

    qpages = spark.createDataFrame(
        corpus_pd[corpus_pd.url.isin(urls)]
        [["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    res = match_records(qpages, pipeline_out["idf"],
                        pipeline_out["entities"], clusters,
                        pipeline_out["mention_feats"]).toPandas()
    top1 = res[res["rank"] == 1].set_index("q_url")["cluster_id"].to_dict()
    for u in urls:
        assert top1.get(u) == expected[u], (u, top1.get(u), expected[u])


def test_query_batch_shares_candidate_join(spark, pipeline_out, corpus_pd):
    """Batch query path (ref record_based_query_exp2.py:124-150 caches
    cluster profiles by name key across queries): 100 query pages in ONE
    match_records call share the stage-1 entity join and each still ranks
    its own cluster first."""
    clusters = pipeline_out["clusters"]
    non_noise = clusters.where(~F.col("is_noise")).toPandas()
    picks = non_noise.head(100)
    urls = list(picks.url)
    expected = dict(zip(picks.url, picks.cluster_id))
    qpages = spark.createDataFrame(
        corpus_pd[corpus_pd.url.isin(urls)]
        [["url", "warc_ts", "html", "text", "lang"]],
        schema=schema.PAGES)
    res = match_records(qpages, pipeline_out["idf"],
                        pipeline_out["entities"], clusters,
                        pipeline_out["mention_feats"]).toPandas()
    top1 = res[res["rank"] == 1].set_index("q_url")["cluster_id"].to_dict()
    assert len(top1) == len(urls)
    for u in urls:
        assert top1.get(u) == expected[u], (u, top1.get(u), expected[u])


def test_query_eval_exact_counts(spark):
    """query_eval arithmetic on a hand-built result/gold table: every
    count and ratio is exact (ref exp1:320-345 accuracy@K / avg rank /
    no-match correctness)."""
    from webr.evalm import query_eval
    # q1: gold at rank 1; q2: gold at rank 3; q3: gold exists, absent
    # from results (miss, empty answer); q4: no gold, empty result
    # (correct no-match); q5: no gold but a result came back (incorrect
    # no-match); q6: gold exists but only WRONG clusters returned (miss
    # with a non-empty answer — must count the same as q3)
    res = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2),
         ("q2", 20, 1), ("q2", 21, 2), ("q2", 22, 3),
         ("q5", 50, 1), ("q6", 99, 1)],
        "q_url string, cluster_id long, rank long")
    gold = spark.createDataFrame(
        [("q1", 10), ("q2", 22), ("q3", 30), ("q4", None), ("q5", None),
         ("q6", 60)],
        "q_url string, cluster_id long")
    row = query_eval(res, gold, k=10).toPandas().iloc[0]
    assert row.n_queries == 6 and row.n_with_gold == 4
    assert row.acc_at_1 == round(1 / 4, 6)
    assert row.acc_at_k == round(2 / 4, 6)
    assert row.avg_rank == 2.0          # gold ranks found: 1 and 3
    assert row.n_missed == 2            # q3 (empty) + q6 (wrong clusters)
    assert row.no_match_correct == 0.5  # q4 yes, q5 no
    # tighter k drops q2's rank-3 gold hit (q2 becomes a miss too)
    row2 = query_eval(res, gold, k=2).toPandas().iloc[0]
    assert row2.acc_at_k == round(1 / 4, 6) and row2.avg_rank == 1.0
    assert row2.n_missed == 3


def test_query_eval_pipeline_perfect(spark, pipeline_out, corpus_pd):
    """Held-in pages evaluated against their own clusters: accuracy@1 = 1,
    avg rank = 1, and the unmatchable record counts as a correct
    no-match."""
    from webr import spec
    from webr.evalm import query_eval
    clusters = pipeline_out["clusters"]
    non_noise = clusters.where(~F.col("is_noise")).limit(500).toPandas()
    picks = non_noise.drop_duplicates("cluster_id").head(4)
    urls = list(picks.url)
    import pandas as pd
    nm_url = "https://nowhere.example/eval-nomatch"
    nomatch = pd.DataFrame([{
        "url": nm_url, "warc_ts": pd.Timestamp("2024-01-01"),
        "html": (b"<html><head><title>zzz</title></head><body>"
                 b"<h1>Xqz Vvkw</h1><p>unseen tokens qqq www eee</p>"
                 b"</body></html>"),
        "text": "", "lang": "eng"}])
    qpd = pd.concat(
        [corpus_pd[corpus_pd.url.isin(urls)]
         [["url", "warc_ts", "html", "text", "lang"]], nomatch],
        ignore_index=True)
    qpages = spark.createDataFrame(qpd, schema=schema.PAGES)
    res = match_records(qpages, pipeline_out["idf"],
                        pipeline_out["entities"], clusters,
                        pipeline_out["mention_feats"])
    gold = spark.createDataFrame(
        [(u, int(c)) for u, c in zip(picks.url, picks.cluster_id)]
        + [(nm_url, None)], "q_url string, cluster_id long")
    row = query_eval(res, gold, k=spec.TOP_K).toPandas().iloc[0]
    assert row.n_queries == 5 and row.n_with_gold == 4
    assert row.acc_at_1 == 1.0 and row.acc_at_k == 1.0
    assert row.avg_rank == 1.0 and row.n_missed == 0
    assert row.no_match_correct == 1.0


def test_query_no_match(spark, pipeline_out):
    html = (b"<html><head><title>zzz</title></head><body>"
            b"<h1>Xqz Vvkw</h1><p>unseen tokens qqq www eee</p>"
            b"</body></html>")
    qpages = spark.createDataFrame(
        [("https://nowhere.example/1", dt.datetime(2024, 1, 1), html, "",
          "eng")], schema=schema.PAGES)
    res = match_records(qpages, pipeline_out["idf"],
                        pipeline_out["entities"], pipeline_out["clusters"],
                        pipeline_out["mention_feats"]).toPandas()
    assert len(res) == 0
