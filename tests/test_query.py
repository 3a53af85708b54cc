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
