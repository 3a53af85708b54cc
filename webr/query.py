"""Incremental record-based query (SURVEY §3.3, ref record_based_query.py):
match new page records against existing entity clusters without
re-clustering.

Two stages, exactly the reference's shape:
  1. candidate clusters share the name key (last, first-initial)
     (ref record_based_query.py:24-25, J5) and pass a cluster-profile
     tf-idf cosine gate (CLUSTER_EPS analog, ref :72-93, C6 stage 1);
  2. survivors are re-ranked by member votes: count of members whose full
     pairwise score >= RECORD_EPS; clusters keep >=MIN_VOTES votes (>=1
     when the cluster has <2 members) (ref :95-127, A7), ranked by votes
     desc then stage-1 cosine, top-K (W1).

The query side is tiny => broadcast joins against the entity/member tables.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from webr import schema, spec
from webr.engine import build_mention_feats, build_mentions
from webr.features import score_pairs, sparse_cosine_sorted


def prepare_query_mentions(query_pages: DataFrame,
                           idf: DataFrame) -> DataFrame:
    """Same extract/normalize/weights path as the corpus (shared kernels),
    with the CORPUS idf (a query must not shift corpus statistics)."""
    mentions = build_mentions(query_pages)
    return build_mention_feats(mentions, idf)


def _stage1(query_feats: DataFrame, entities: DataFrame) -> DataFrame:
    q = query_feats.select(
        F.col("url").alias("q_url"),
        F.col("last").alias("q_last"),
        F.substring("first", 1, 1).alias("q_fi"),
        "first", "middle", "name_norm", "title_toks", "host", "doc_id",
        "w_toks", "w_vals", "w_norm")
    cand = (F.broadcast(q).join(
        entities,
        (q.q_last == entities.last)
        & ((q.q_fi == entities.first_initial) | (q.q_fi == F.lit(""))
           | (entities.first_initial == F.lit("")))))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from webr.features import token_hash
        for pdf in batches:
            cos = []
            for toks, vals, nrm, prof in zip(
                    pdf["w_toks"], pdf["w_vals"], pdf["w_norm"],
                    pdf["profile"]):
                prof = prof if isinstance(prof, dict) else {}
                # entity profiles keep human-readable tokens; hash to the
                # same int64 id space as the mention weight arrays
                entries = sorted((token_hash(t), v) for t, v in prof.items())
                p_toks = [h for h, _ in entries]
                p_vals = [v for _, v in entries]
                acc = 0.0
                for v in p_vals:
                    acc += v * v
                cos.append(sparse_cosine_sorted(
                    list(toks), list(vals), nrm, p_toks, p_vals,
                    acc ** 0.5))
            pdf = pdf.copy()
            pdf["cluster_cos"] = cos
            yield pdf[["q_url", "cluster_id", "n_members", "cluster_cos"]]

    out_schema = ("q_url string, cluster_id long, n_members long, "
                  "cluster_cos double")
    return (cand.mapInPandas(gen, out_schema)
            .where(F.col("cluster_cos") >= spec.CLUSTER_EPS))


def _stage2(query_feats: DataFrame, survivors: DataFrame,
            clusters: DataFrame, mention_feats: DataFrame) -> DataFrame:
    members = (survivors.select("q_url", "cluster_id", "n_members",
                                "cluster_cos")
               .join(clusters.where(~F.col("is_noise")), "cluster_id")
               # shuffle_hash: never sort the fat weight-array side
               # (scoped hint — see webr/session.py note)
               .join(mention_feats.hint("shuffle_hash"), "url"))
    qside = query_feats.select(
        F.col("url").alias("url_1"),
        *[F.col(c).alias(f"{c}_1")
          for c in [f.name for f in schema.MENTION_FEATS.fields
                    if f.name != "url"]])
    pair_cols = [f.name for f in schema.PAIRS.fields]
    paired = (members
              .select(F.col("q_url").alias("url_1"),
                      F.col("url").alias("url_2"),
                      "cluster_id", "n_members", "cluster_cos",
                      *[F.col(c).alias(f"{c}_2")
                        for c in [f.name for f in schema.MENTION_FEATS.fields
                                  if f.name != "url"]])
              .join(F.broadcast(qside), "url_1")
              .withColumn("block_key", F.lit("query")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scored = score_pairs(pdf[pair_cols])
            out = pdf[["url_1", "url_2", "cluster_id", "n_members",
                       "cluster_cos"]].copy()
            out["score"] = scored["score"]
            yield out

    out_schema = ("url_1 string, url_2 string, cluster_id long, "
                  "n_members long, cluster_cos double, score double")
    scored = paired.mapInPandas(gen, out_schema)
    votes = (scored.groupBy(F.col("url_1").alias("q_url"), "cluster_id",
                            "n_members", "cluster_cos")
             .agg(F.sum(F.when(F.col("score") >= spec.RECORD_EPS, 1)
                        .otherwise(0)).alias("votes")))
    min_votes = F.when(F.col("n_members") < 2, 1).otherwise(spec.MIN_VOTES)
    ranked = (votes.where(F.col("votes") >= min_votes)
              .withColumn("rank", F.row_number().over(
                  Window.partitionBy("q_url").orderBy(
                      F.desc("votes"), F.desc("cluster_cos"),
                      F.asc("cluster_id"))))
              .where(F.col("rank") <= spec.TOP_K))
    return ranked.select("q_url", "cluster_id", "votes",
                         F.round("cluster_cos", 9).alias("cluster_cos"),
                         "rank")


def match_records(query_pages: DataFrame, idf: DataFrame,
                  entities: DataFrame, clusters: DataFrame,
                  mention_feats: DataFrame) -> DataFrame:
    """-> (q_url, cluster_id, votes, cluster_cos, rank): top-K existing
    clusters for each query page; empty result for a query = no match
    (ref record_based_query_exp1.py:166-174 'no-match correct').

    Batch-friendly by construction: pass MANY query pages in one call and
    the stage-1 name-key candidate join against the entity table runs
    ONCE for the whole batch (the distributed analog of ref
    record_based_query_exp2.py:124-150's per-name-key profile cache —
    there the cache avoids refetching cluster profiles per query; here
    one broadcast-join stage amortizes the same work across the batch).
    Tested with a 100-query batch in tests/test_query.py."""
    qf = prepare_query_mentions(query_pages, idf)
    s1 = _stage1(qf, entities)
    return _stage2(qf, s1, clusters, mention_feats)
