"""Classifier evaluation surface (SURVEY §2.9 M3; ref train_rf.py:218-236
prints precision/recall/F1 and a PR sweep for the trained model).

Distributed re-expression: the PR curve is ONE groupBy over score buckets
plus a cumulative window over the (tiny, bounded-by-bucket-count) curve
table — never a per-threshold rescan of the pair table. All ratios divide
exact integer counts, so a DuckDB oracle checks bit-for-bit after
round(x, 6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pr_curve(scored: DataFrame, label_col: str = "match",
             score_col: str = "score", decimals: int = 2) -> DataFrame:
    """-> (thr, n_pred, n_tp, precision, recall, f1): metrics of the rule
    'positive iff score >= thr' for every occupied score bucket (score
    rounded to ``decimals``). The bucket groupBy collapses the pair table
    map-side; the cumulative window then runs over at most 10^decimals+1
    rows, so the single-partition window is deliberate and safe."""
    g = (scored
         .withColumn("thr", F.round(F.col(score_col), decimals))
         .groupBy("thr")
         .agg(F.count("*").alias("n"),
              F.sum(F.col(label_col).cast("long")).alias("pos")))
    w = (Window.orderBy(F.desc("thr"))
         .rowsBetween(Window.unboundedPreceding, 0))
    tot = scored.agg(
        F.sum(F.col(label_col).cast("long")).alias("tot_pos"))
    cum = (g.withColumn("n_pred", F.sum("n").over(w))
           .withColumn("n_tp", F.sum("pos").over(w))
           .crossJoin(F.broadcast(tot)))
    prec = F.col("n_tp") / F.col("n_pred")
    rec = F.col("n_tp") / F.greatest(F.col("tot_pos"), F.lit(1))
    f1 = F.when(prec + rec > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return (cum.select("thr", "n_pred", "n_tp",
                       F.round(prec, 6).alias("precision"),
                       F.round(rec, 6).alias("recall"),
                       F.round(f1, 6).alias("f1"))
            .orderBy(F.desc("thr")))


def query_eval(results: DataFrame, gold: DataFrame,
               k: int = 10) -> DataFrame:
    """Quality metrics of the incremental record query (ref
    record_based_query_exp1.py:135-362, esp. :320-345: accuracy@K=10,
    average rank, no-match correctness).

    ``results``: match_records output (q_url, cluster_id, rank, ...).
    ``gold``: (q_url, cluster_id) — the true cluster per query; a NULL
    cluster_id marks a query whose correct answer is "no match".

    One row: n_queries / n_with_gold, accuracy@1, accuracy@k, average
    rank of the gold cluster where found, misses (gold exists but absent
    from the top-k — whether the query returned nothing or only wrong
    clusters), and the no-match queries answered correctly with an
    empty result. Distributed shape: one join on q_url + two bounded
    aggregations — the curve never rescans the result table per metric.
    All ratios divide exact integer counts (round 6)."""
    g = gold.select("q_url", F.col("cluster_id").alias("gold_cid"))
    r = (results.where(F.col("rank") <= k)
         .select("q_url", F.col("cluster_id").alias("pred_cid"), "rank"))
    per_q = (g.join(r, "q_url", "left")
             .groupBy("q_url", "gold_cid")
             .agg(F.min(F.when(F.col("pred_cid") == F.col("gold_cid"),
                               F.col("rank"))).alias("gold_rank"),
                  F.count("pred_cid").alias("n_returned")))
    has_gold = F.col("gold_cid").isNotNull()
    agg = per_q.agg(
        F.count("*").alias("n_queries"),
        F.sum(has_gold.cast("long")).alias("n_with_gold"),
        F.sum((F.col("gold_rank") == 1).cast("long")).alias("n_acc1"),
        F.sum(F.col("gold_rank").isNotNull().cast("long")).alias("n_acck"),
        F.sum(F.coalesce("gold_rank", F.lit(0))).alias("rank_sum"),
        F.sum((has_gold & F.col("gold_rank").isNull()).cast("long"))
        .alias("n_missed"),
        F.sum((~has_gold).cast("long")).alias("n_no_gold"),
        F.sum((~has_gold & (F.col("n_returned") == 0)).cast("long"))
        .alias("n_no_match_correct"))
    safe = lambda num, den: F.round(  # noqa: E731
        num / F.greatest(den, F.lit(1)), 6)
    return agg.select(
        "n_queries", "n_with_gold",
        safe(F.col("n_acc1"), F.col("n_with_gold")).alias("acc_at_1"),
        safe(F.col("n_acck"), F.col("n_with_gold")).alias("acc_at_k"),
        safe(F.col("rank_sum"), F.col("n_acck")).alias("avg_rank"),
        "n_missed",
        safe(F.col("n_no_match_correct"), F.col("n_no_gold"))
        .alias("no_match_correct"))


def classification_report(scored: DataFrame, threshold: float,
                          label_col: str = "match",
                          score_col: str = "score") -> DataFrame:
    """One-row binary report at a fixed threshold: tp/fp/fn/tn counts and
    precision/recall/f1/accuracy (ref train_rf.py:218-236's printout as a
    table). Single exact aggregation pass."""
    pred = F.col(score_col) >= F.lit(threshold)
    lab = F.col(label_col)
    agg = scored.agg(
        F.sum((pred & lab).cast("long")).alias("tp"),
        F.sum((pred & ~lab).cast("long")).alias("fp"),
        F.sum((~pred & lab).cast("long")).alias("fn"),
        F.sum((~pred & ~lab).cast("long")).alias("tn"))
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    acc = ((F.col("tp") + F.col("tn"))
           / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")))
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(acc, 6).alias("accuracy"))
