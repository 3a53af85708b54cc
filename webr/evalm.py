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
