"""A/B: pair_scores cogroup with url strings vs surrogate int64 keys.

VERDICT r4 watch item: after the distinct-pair kernel vectorization,
``pair_scores`` is data-movement-bound — url strings + member arrays
crossing the gk cogroup shuffle. The candidate rewrite dictionary-
encodes the pairs side (xxhash64 surrogate per url, 8-byte shuffle keys)
through the cogroup and re-attaches the url strings to the scored output
with two shuffle-hash joins afterwards. It was measured and DECLINED at
scale 15 (the two re-attach joins shuffle the full scored output and
cost more than the string bytes saved); this tool re-measures at scale
30 so the keep-or-reject decision is data at 4x the round-3 input.

Usage:
    python tools/ab_pair_scores.py [--scale 30] [--reps 2]

Prints one JSON line: per-rep walls for both variants (interleaved
A/B/A/B), medians, and an output-parity block (row count, edge count,
score checksum — the surrogate variant must be value-identical).
Prep stages (mentions/idf/mention_feats/pairs) are checkpointed in a
persistent /tmp warehouse and reused across invocations; only the
pair_scores stage build (cogroup + parquet write, the real stage shape)
is timed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pin_self(cpus: int) -> None:
    if shutil.which("taskset") and not os.environ.get("WEBR_BENCH_PINNED"):
        env = dict(os.environ, WEBR_BENCH_PINNED="1")
        os.execvpe("taskset",
                   ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
                    os.path.abspath(__file__)] + sys.argv[1:], env)


def build_pair_scores_surrogate(pairs, mention_feats, groups: int):
    """Surrogate-key twin of engine.build_pair_scores_grouped: the
    cogroup shuffles (u1, u2, block_key) with u* = xxhash64(url), and
    the url strings are joined back onto the scored output afterwards.
    Collision note: acceptable for an A/B measurement (p ~ n^2/2^64);
    production adoption would mint ids from the mentions stage."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from webr import schema
    from webr.engine import to_arrow_schema

    sur_type = StructType([
        StructField("u1", LongType(), False) if f.name == "url_1"
        else StructField("u2", LongType(), False) if f.name == "url_2"
        else f
        for f in schema.PAIR_SCORES.fields])
    sur_arrow = to_arrow_schema(sur_type)
    sur_names = [f.name for f in sur_type.fields]

    p = pairs.select(
        F.xxhash64("url_1").alias("u1"), F.xxhash64("url_2").alias("u2"),
        "block_key",
        F.pmod(F.xxhash64("block_key"), F.lit(groups)).alias("gk"))
    urls = (pairs.select(F.col("block_key").alias("bk"),
                         F.col("url_1").alias("url"))
            .unionByName(pairs.select(F.col("block_key").alias("bk"),
                                      F.col("url_2").alias("url")))
            .select(F.pmod(F.xxhash64("bk"), F.lit(groups)).alias("gk"),
                    "url")
            .distinct())
    side = (urls.join(mention_feats.hint("shuffle_hash"), "url")
            .withColumn("uid", F.xxhash64("url"))
            .drop("url"))

    def score_group(pairs_tbl, memb_tbl):
        from webr.features import (
            FEATURE_COLUMNS, MEMBER_COLUMNS, score_pairs_indexed_vec,
        )

        def list_col_views(name: str, np_dtype) -> list:
            arr = memb_tbl.column(name).combine_chunks()
            flat = arr.values.to_numpy(zero_copy_only=False).astype(
                np_dtype, copy=False)
            offs = arr.offsets.to_numpy(zero_copy_only=False)
            return [flat[offs[i]:offs[i + 1]] for i in range(len(arr))]

        memb = {}
        for c in MEMBER_COLUMNS:
            src = "uid" if c == "url" else c
            if c == "w_toks":
                memb[c] = list_col_views(src, np.int64)
            elif c == "w_vals":
                memb[c] = list_col_views(src, np.float64)
            else:
                # the kernel only len()s memb["url"]; uid ints suffice
                memb[c] = memb_tbl.column(src).to_pylist()
        pos = {u: i for i, u in enumerate(memb["url"])}

        def pair_index(col_name: str) -> list:
            enc = pairs_tbl.column(col_name).combine_chunks() \
                .dictionary_encode()
            lut = np.asarray([pos[u] for u in enc.dictionary.to_pylist()],
                             dtype=np.int64)
            return lut[enc.indices.to_numpy(zero_copy_only=False)].tolist()

        i1 = pair_index("u1")
        i2 = pair_index("u2")
        out = score_pairs_indexed_vec(memb, i1, i2)
        cols = {"u1": pairs_tbl.column("u1"),
                "u2": pairs_tbl.column("u2"),
                "block_key": pairs_tbl.column("block_key")}
        for c in FEATURE_COLUMNS:
            cols[c] = pa.array(out[c], type=sur_arrow.field(c).type)
        return pa.table({n: cols[n] for n in sur_names}).cast(sur_arrow)

    scored = (p.groupby("gk")
              .cogroup(side.groupby("gk"))
              .applyInArrow(score_group, schema=sur_type))
    # re-attach url strings: 8-byte-key shuffle-hash joins against the
    # distinct url map (NOT broadcast — the 100 TB url map is not
    # broadcastable, so measure the shuffle shape)
    umap = (mention_feats.select("url", F.xxhash64("url").alias("uid"))
            .distinct())
    out = (scored
           .join(umap.hint("shuffle_hash")
                 .select(F.col("uid").alias("u1"),
                         F.col("url").alias("url_1")), "u1")
           .join(umap.hint("shuffle_hash")
                 .select(F.col("uid").alias("u2"),
                         F.col("url").alias("url_2")), "u2"))
    names = [f.name for f in schema.PAIR_SCORES.fields]
    return out.select(*names)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=30.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    _pin_self(args.cpus)

    from webr import schema
    from webr.engine import (
        PAIR_SCORE_GROUPS, Pipeline, build_pair_scores_grouped,
    )
    from webr.session import get_spark
    from webr.synth import generate_pages, pages_to_pandas

    spark = get_spark(app="ab_pair_scores", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(2 * args.cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = os.path.join(tempfile.gettempdir(),
                             f"webr_ab_pages_{args.scale}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        pages_pd = pages_to_pandas(generate_pages(seed=42,
                                                  scale=args.scale))
        (spark.createDataFrame(
            pages_pd[["url", "warc_ts", "html", "text", "lang"]],
            schema=schema.PAGES)
         .repartition(64).write.mode("overwrite").parquet(pages_dir))

    # prep stages via the real pipeline, checkpointed + reused; run()
    # is lazy per stage, so touching only pairs/mention_feats builds
    # exactly the upstream prefix
    wh_dir = os.path.join(tempfile.gettempdir(),
                          f"webr_ab_wh_{args.scale}")
    pipe = Pipeline(spark, wh_dir, input_id=f"ab-{args.scale}")
    out = pipe.run(spark.read.parquet(pages_dir))
    pairs, mention_feats = out["pairs"], out["mention_feats"]
    n_pairs = pipe.wh.manifest("pairs")["rows"]
    groups = max(PAIR_SCORE_GROUPS, min(1 << 20, n_pairs // 100_000))

    def run_variant(build_fn) -> tuple[float, dict]:
        d = tempfile.mkdtemp(prefix="webr_ab_out_")
        try:
            t0 = time.monotonic()
            build_fn(pairs, mention_feats, groups).write.mode(
                "overwrite").parquet(d)
            wall = time.monotonic() - t0
            chk = spark.read.parquet(d).selectExpr(
                "count(*) AS rows",
                "sum(CASE WHEN is_edge THEN 1 ELSE 0 END) AS edges",
                "round(sum(score), 6) AS score_sum").first().asDict()
            return wall, chk
        finally:
            shutil.rmtree(d, ignore_errors=True)

    walls = {"baseline": [], "surrogate": []}
    checks = {}
    for _rep in range(args.reps):          # interleaved A/B/A/B
        for name, fn in (("baseline", build_pair_scores_grouped),
                         ("surrogate", build_pair_scores_surrogate)):
            w, chk = run_variant(fn)
            walls[name].append(round(w, 2))
            checks[name] = chk
    print(json.dumps({
        "scale": args.scale, "cpus": args.cpus, "n_pairs": n_pairs,
        "groups": groups,
        "walls": walls,
        "median": {k: round(statistics.median(v), 2)
                   for k, v in walls.items()},
        "parity": checks,
        "parity_ok": checks["baseline"] == checks["surrogate"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
