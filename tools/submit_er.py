"""spark-submit entrypoint for the full ER pipeline (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Unlike ``python -m webr run`` (which builds its own SparkSession via
webr.session.get_spark), this script attaches to the session spark-submit
already configured — master, executors, and --py-files come from the
submit command line, exactly as they would on a real cluster:

    ZIP=$(python -c 'from webr.session import _package_zip; print(_package_zip())')
    spark-submit --master local[8] --py-files "$ZIP" tools/submit_er.py \
        --input /path/pages_dir --warehouse /path/wh

Runtime-settable SQL confs (Arrow, AQE, shuffle partitions, UTC) are
applied via spark.conf.set; JVM-startup confs (driver memory) belong on
the submit command line (--driver-memory).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="submit_er.py")
    ap.add_argument("--input", required=True,
                    help="parquet path with pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--input-id", default=None)
    ap.add_argument("--shuffle-partitions", type=int,
                    default=int(os.environ.get("WEBR_SHUFFLE_PARTITIONS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("webr-submit-er").getOrCreate()
    # SQL confs are runtime-settable; everything JVM-level (master, memory,
    # py-files) is owned by the spark-submit command line.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(args.shuffle_partitions))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")

    # imported AFTER the session exists so the modules resolve from
    # --py-files on executors and from the local tree on the driver
    from webr.__main__ import _auto_input_id
    from webr.engine import Pipeline

    pages = spark.read.parquet(args.input)
    input_id = args.input_id or _auto_input_id(args.input)
    t0 = time.time()
    out = Pipeline(spark, args.warehouse, input_id=input_id).run(pages)
    n_pages = out["mentions"].count()
    n_clusters = out["entities"].count()
    n_noise = out["clusters"].where("is_noise").count()
    wall = time.time() - t0
    print(f"SUBMIT_ER_OK pages={n_pages} clusters={n_clusters} "
          f"noise={n_noise} wall_s={wall:.1f} "
          f"pages_per_sec={n_pages / wall:.0f} "
          f"master={spark.sparkContext.master} input_id={input_id}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
