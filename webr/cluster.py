"""Distributed transitive clustering: iterative hash-min connected
components over the edge DataFrame (SURVEY §2.8 C3 — with minPts=2 the
reference's DBSCAN is connected components; GraphFrames is unavailable, so
this is a hand-rolled min-label propagation with per-iteration
localCheckpoint to cut lineage, SURVEY §7.4 item 4)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges: (url_1, url_2). Returns (url, rep) for every url that appears
    in an edge; rep = lexicographic min url of its component (matches the
    oracle's union-by-min-url exactly)."""
    both = (edges.select(F.col("url_1").alias("src"),
                         F.col("url_2").alias("dst"))
            .union(edges.select(F.col("url_2").alias("src"),
                                F.col("url_1").alias("dst"))))
    both = both.repartition("src").localCheckpoint()
    labels = (both.select(F.col("src").alias("url"))
              .distinct()
              .withColumn("rep", F.col("url"))
              .localCheckpoint())
    for _ in range(max_iter):
        nbr_min = (both.join(labels, both.dst == labels.url)
                   .groupBy("src")
                   .agg(F.min("rep").alias("nbr_rep")))
        new_labels = (labels.join(nbr_min, labels.url == nbr_min.src, "left")
                      .select(
                          "url",
                          F.least("rep", F.coalesce("nbr_rep", "rep"))
                          .alias("rep"),
                          (F.col("rep") != F.least(
                              "rep", F.coalesce("nbr_rep", "rep")))
                          .cast("int").alias("changed")))
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


def label_clusters(mentions: DataFrame, edges: DataFrame) -> DataFrame:
    """-> (url, cluster_id, is_noise). Non-linked mentions are noise with
    cluster_id 0 (ref clustering/dbscan.py:137-139); linked components get
    dense ids 1..K by sorted representative (deterministic; enumeration via
    sorted zipWithIndex, not a single-partition window, so it scales)."""
    spark = mentions.sparkSession
    labels = connected_components(edges)
    reps = labels.select("rep").distinct()
    rep_ids = (reps.orderBy("rep").rdd
               .map(lambda r: r[0])
               .zipWithIndex()
               .map(lambda t: Row(rep=t[0], cluster_id=t[1] + 1))
               .toDF("rep string, cluster_id long"))
    linked = (labels.join(rep_ids, "rep")
              .select("url", "cluster_id", F.lit(False).alias("is_noise")))
    noise = (mentions.select("url").join(labels.select("url"), "url",
                                         "left_anti")
             .select("url", F.lit(0).cast("long").alias("cluster_id"),
                     F.lit(True).alias("is_noise")))
    return linked.unionByName(noise)
