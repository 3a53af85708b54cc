"""Training-data-pipeline operators over ``documents`` / ``embeddings``:
deduplication (exact hash, MinHash-LSH banding, SimHash, n-gram Jaccard),
similarity search (brute-force cosine top-k; LSH-bucketed scale path in
webr.similarity), text analysis (lang-id heuristic, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Hashing is md5-hex based on BOTH engines (portable), and set arithmetic is
integer-only wherever possible so the DuckDB oracle is an exact check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from webr.queries.common import (
    duck_tokens, duck_tokens_nostop, read, spark_tokens, spark_tokens_nostop,
)
from webr.textproc import STOPWORDS

# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy). The driver corpus has no byte-identical texts,
# so we dedup on the content fingerprint of the *sorted distinct token set* —
# order/whitespace-invariant, the standard first rung of web dedup.

_SPARK_TSET_FP = ("md5(array_join(array_sort(array_distinct("
                  + spark_tokens_nostop("text") + ")), ' '))")
_DUCK_TSET_FP = ("md5(array_to_string(list_sort(list_distinct("
                 + duck_tokens_nostop("text") + ")), ' '))")


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    d = read(spark, sf, "documents").withColumn(
        "fp", F.expr(_SPARK_TSET_FP))
    return (d.groupBy("fp")
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keep_doc_id"))
            .where(F.col("n_dups") >= 2)
            .orderBy("fp"))


SQL_DEDUP_EXACT = f"""
SELECT fp, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM (SELECT doc_id, {_DUCK_TSET_FP} AS fp FROM documents) t
GROUP BY fp HAVING count(*) >= 2 ORDER BY fp
"""


# ---------------------------------------------------------------------------
# MinHash-LSH banding with portable string-min signatures:
# h_{band}(shingle) = md5('<band>:' || shingle); signature = min over
# shingles; docs sharing a (band, signature-prefix) land in one bucket.

_N_BANDS = 4

_SPARK_SHINGLES = ("transform(sequence(0, size(toks) - 3), "
                   "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")
_DUCK_SHINGLES = ("[toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] "
                  "for i in range(1, len(toks) - 1)]")


def _spark_band_sig(band: int) -> str:
    return (f"substring(array_min(transform(shingles, "
            f"s -> md5(concat('{band}:', s)))), 1, 12)")


def _duck_band_sig(band: int) -> str:
    return (f"substr(list_min(list_transform(shingles, "
            f"s -> md5('{band}:' || s))), 1, 12)")


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH buckets with >=2 docs: candidate near-duplicate groups.
    At 100TB this is the shuffle-friendly path: one explode to
    (band, sig) keys, one groupBy — never an all-pairs join."""
    d = (read(spark, sf, "documents")
         .withColumn("toks", F.expr(spark_tokens("text")))
         .where(F.size("toks") >= 3)
         .withColumn("shingles", F.expr(_SPARK_SHINGLES)))
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.expr(_spark_band_sig(b)).alias("sig"))
        for b in range(_N_BANDS)])
    return (d.select("doc_id", F.explode(bands).alias("bs"))
            .select("doc_id", F.col("bs.band").alias("band"),
                    F.col("bs.sig").alias("sig"))
            .groupBy("band", "sig")
            .agg(F.count("*").alias("n_docs"),
                 # scalar string, not array: the driver canonicalizer sorts
                 # cell values and cannot hash list-typed cells
                 F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
                 .alias("doc_ids"))
            .where(F.col("n_docs") >= 2)
            .orderBy("band", "sig"))


def _duck_band_rows() -> str:
    rows = [f"SELECT doc_id, {b} AS band, {_duck_band_sig(b)} AS sig FROM s"
            for b in range(_N_BANDS)]
    return " UNION ALL ".join(rows)


SQL_DEDUP_MINHASH_LSH = f"""
WITH s AS (
  SELECT doc_id, {_DUCK_SHINGLES.replace('toks', 'toks')} AS shingles
  FROM (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents)
  WHERE len(toks) >= 3),
b AS ({_duck_band_rows()})
SELECT band, sig, count(*) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM b GROUP BY band, sig HAVING count(*) >= 2 ORDER BY band, sig
"""


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-char-derived so both engines compute byte-identically)

_HEX = "0123456789abcdef"


def _spark_hvals() -> str:
    # per-token 16-bit int from first 4 hex chars of md5(token) — hoisted
    # into ONE transform so md5 runs once per token, not once per bit
    # (inlining it in all 16 bit expressions made the query ~16x heavier)
    v = "+".join(
        f"(instr('{_HEX}', substring(md5(t), {k+1}, 1)) - 1) * {16 ** (3-k)}"
        for k in range(4))
    return f"transform(tset, t -> CAST(({v}) AS INT))"


def _spark_simhash() -> str:
    bits = " + ".join(
        f"CAST(CASE WHEN aggregate(transform(hvals, h -> CASE WHEN "
        f"(h div {1 << j}) % 2 = 1 THEN 1 ELSE -1 END), "
        f"0, (a, x) -> a + x) > 0 THEN {1 << j} ELSE 0 END AS INT)"
        for j in range(16))
    return bits


def _duck_simhash() -> str:
    v = "+".join(
        f"(strpos('{_HEX}', substr(md5(t), {k+1}, 1)) - 1) * {16 ** (3-k)}"
        for k in range(4))
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(tset, t -> CASE WHEN "
        f"(({v}) // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16))
    return bits


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = (read(spark, sf, "documents")
         .withColumn("tset",
                     F.array_sort(F.array_distinct(
                         F.expr(spark_tokens_nostop("text")))))
         .where(F.size("tset") >= 1)
         .withColumn("hvals", F.expr(_spark_hvals())))
    return (d.select("doc_id",
                     F.expr(_spark_simhash()).cast("long").alias("simhash16"))
            .orderBy("doc_id"))


SQL_DEDUP_SIMHASH = f"""
SELECT doc_id, CAST({_duck_simhash()} AS BIGINT) AS simhash16
FROM (SELECT doc_id, list_sort(list_distinct({duck_tokens_nostop('text')}))
             AS tset
      FROM documents) t
WHERE len(tset) >= 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# n-gram (token 3-shingle) Jaccard near-dup pairs, blocked by source with
# the mega-block guard: one hot hostname at 100 TB must not turn the
# self-join into O(n^2) — blocks over MAX_BLOCK_SIZE switch to the
# sorted-neighborhood window (same rule as webr/engine.py build_pairs,
# shared helper in webr/queries/er_docs.py).

def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from webr.queries.er_docs import bounded_pair_ids
    d = (read(spark, sf, "documents")
         .withColumn("toks", F.expr(spark_tokens("text")))
         .where(F.size("toks") >= 3)
         .withColumn("sh", F.array_sort(F.array_distinct(
             F.expr(_SPARK_SHINGLES))))
         .select("doc_id", "source", "sh"))
    p = (bounded_pair_ids(d, key="source")
         .join(d.select(F.col("doc_id").alias("doc_id_1"),
                        F.col("sh").alias("sh_1")), "doc_id_1")
         .join(d.select(F.col("doc_id").alias("doc_id_2"),
                        F.col("sh").alias("sh_2")), "doc_id_2"))
    inter = F.size(F.array_intersect("sh_1", "sh_2"))
    uni = F.size("sh_1") + F.size("sh_2") - inter
    return (p.select("doc_id_1", "doc_id_2",
                     F.round(inter / uni, 6).alias("shingle_jaccard"))
            .where(F.col("shingle_jaccard") >= 0.05)
            .orderBy("doc_id_1", "doc_id_2"))


def _sql_dedup_ngram_jaccard() -> str:
    from webr.queries.er_docs import duck_bounded_pairs
    return f"""
WITH d AS (
  SELECT doc_id, source,
         list_sort(list_distinct({_DUCK_SHINGLES.replace('toks', 'toks')}))
         AS sh
  FROM (SELECT doc_id, source, {duck_tokens('text')} AS toks FROM documents)
  WHERE len(toks) >= 3),
{duck_bounded_pairs("SELECT doc_id, source FROM d", key="source")}
SELECT c.doc_id_1, c.doc_id_2,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
       AS shingle_jaccard
FROM cand c JOIN d a ON a.doc_id = c.doc_id_1
            JOIN d b ON b.doc_id = c.doc_id_2
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.05
ORDER BY doc_id_1, doc_id_2
"""


SQL_DEDUP_NGRAM_JACCARD = _sql_dedup_ngram_jaccard()


# ---------------------------------------------------------------------------
# similarity search: brute-force cosine top-k over embeddings

def q_ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Baseline ANN: query set = vec_id % 50 == 0, brute-force cosine via
    zip_with/aggregate (JVM-side), top-3 per query. The LSH-bucketed scale
    path lives in webr.similarity (rows-only check)."""
    e = read(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = (e.where(F.col("vec_id") % 50 == 0)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv")))
    dot = ("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, "
           "(acc, x) -> acc + x)")
    nrm = ("sqrt(aggregate({c}, 0D, (acc, x) -> acc + x * x))")
    cos = (f"({dot}) / ((" + nrm.format(c="qv") + ") * ("
           + nrm.format(c="v") + "))")
    pairs = (q.crossJoin(e)
             .where(F.col("vec_id") != F.col("q_id"))
             .select("q_id", "vec_id", F.expr(cos).alias("cos_raw")))
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.round("cos_raw", 6)), F.asc("vec_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("q_id", "vec_id", F.round("cos_raw", 4).alias("cosine"),
                    "rk")
            .orderBy("q_id", "rk"))


SQL_ANN_COSINE_TOPK = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q_id, vec_id,
         list_sum(list_transform(list_zip(qv, v),
                                 t -> t[1] * t[2]))
         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
            * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cos_raw
  FROM q, e WHERE vec_id <> q_id),
rk AS (SELECT q_id, vec_id, cos_raw,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY round(cos_raw, 6) DESC, vec_id)
              AS rk
       FROM pairs)
SELECT q_id, vec_id, round(cos_raw, 4) AS cosine, rk
FROM rk WHERE rk <= 3 ORDER BY q_id, rk
"""


# ---------------------------------------------------------------------------
# text analysis

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID: English-stopword ratio (n-gram-free variant
    suited to the integer-parity oracle). Reports prediction vs the lang
    column for accuracy accounting downstream."""
    d = (read(spark, sf, "documents")
         .withColumn("toks", F.expr(spark_tokens("text")))
         .withColumn("n_stop", F.size(F.expr(
             f"filter({spark_tokens('text')}, "
             f"x -> array_contains(array({_STOP_SQL}), x))"))))
    return (d.select(
        "doc_id", "lang",
        F.round(F.col("n_stop") / F.greatest(F.size("toks"), F.lit(1)), 6)
        .alias("stop_ratio"),
        F.when(F.col("n_stop") / F.greatest(F.size("toks"), F.lit(1))
               >= 0.03, "en").otherwise("other").alias("pred_lang"))
        .orderBy("doc_id"))


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id, lang, {duck_tokens('text')} AS toks,
         len(list_filter({duck_tokens('text')},
                         x -> list_contains([{_STOP_SQL}], x))) AS n_stop
  FROM documents)
SELECT doc_id, lang,
       round(n_stop::DOUBLE / greatest(len(toks), 1), 6) AS stop_ratio,
       CASE WHEN n_stop::DOUBLE / greatest(len(toks), 1) >= 0.03
            THEN 'en' ELSE 'other' END AS pred_lang
FROM t ORDER BY doc_id
"""


def q_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Web-text quality signals: length, token stats, type-token ratio,
    mean token length (integer/ratio arithmetic only)."""
    d = (read(spark, sf, "documents")
         .withColumn("toks", F.expr(spark_tokens("text"))))
    n_toks = F.greatest(F.size("toks"), F.lit(1))
    tok_chars = F.expr("aggregate(transform(" + spark_tokens("text")
                       + ", x -> length(x)), 0, (a, x) -> a + x)")
    return (d.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.size("toks").alias("n_tokens"),
        F.round(F.size(F.array_distinct("toks")) / n_toks, 6)
        .alias("type_token_ratio"),
        F.round(tok_chars / n_toks, 6).alias("mean_token_len"))
        .orderBy("doc_id"))


SQL_QUALITY_SCORE = f"""
WITH t AS (SELECT doc_id, text, {duck_tokens('text')} AS toks FROM documents)
SELECT doc_id, length(text) AS n_chars_raw, len(toks) AS n_tokens,
       round(len(list_distinct(toks))::DOUBLE
             / greatest(len(toks), 1), 6) AS type_token_ratio,
       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
             / greatest(len(toks), 1), 6) AS mean_token_len
FROM t ORDER BY doc_id
"""


def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting three ways: whitespace split, alnum-regex tokens,
    and a BPE-ish char/4 estimate (the standard cheap proxy)."""
    d = read(spark, sf, "documents")
    return (d.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' +'), x -> x != '')"))
        .alias("ws_tokens"),
        F.size(F.expr(spark_tokens("text"))).alias("re_tokens"),
        F.ceil(F.length("text") / 4).cast("long").alias("bpe_est"))
        .orderBy("doc_id"))


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, ' +'), x -> x <> ''))
       AS ws_tokens,
       len({duck_tokens('text')}) AS re_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
FROM documents ORDER BY doc_id
"""


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprints: raw-bytes md5, order-invariant content md5
    (sorted distinct tokens), and byte length."""
    d = read(spark, sf, "documents")
    return (d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("raw_md5"),
        F.expr(_SPARK_TSET_FP).alias("content_md5"),
        F.octet_length("text").alias("n_bytes"))
        .orderBy("doc_id"))


SQL_FINGERPRINT = f"""
SELECT doc_id, md5(text) AS raw_md5, {_DUCK_TSET_FP} AS content_md5,
       octet_length(encode(text)) AS n_bytes
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal plumbing: opaque binary payload + typed metadata. The decode
# step itself is stubbed (no image/audio libs in this container) in
# webr.multimodal; this query proves the binary-column path end-to-end.

def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    d = (read(spark, sf, "documents")
         .withColumn("payload", F.col("text").cast("binary")))
    return (d.select(
        "doc_id",
        F.octet_length("payload").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        (F.octet_length("payload") % 7).alias("stub_frames"))
        .orderBy("doc_id"))


SQL_MULTIMODAL_META = """
SELECT doc_id, octet_length(encode(text)) AS payload_bytes,
       sha256(text) AS payload_sha256,
       octet_length(encode(text)) % 7 AS stub_frames
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# ANN scale paths (webr.similarity): multi-table sign-LSH bucket join and
# IVF-flat probe join. Both replace the O(N·Q) cross join with equi-joins on
# deterministic bucket keys — the 100TB path. Not SQL-expressible compactly
# => rows-only driver check; recall vs the exact baseline is asserted in
# tests/test_modules.py.

# ---------------------------------------------------------------------------
# embedding-cosine near-dup (dedup family over the embeddings table)

_EMB_TAU = 0.30        # near-dup threshold (synthetic vectors are near-
                       # orthogonal; real near-dup corpora use ~0.95+)
_EMB_SIGN_BITS = 8     # sign-LSH bucket width


def _spark_sign_bucket() -> str:
    return " + ".join(
        f"CASE WHEN element_at(v, {i + 1}) > 0 THEN {1 << i} ELSE 0 END"
        for i in range(_EMB_SIGN_BITS))


def _duck_sign_bucket() -> str:
    return " + ".join(
        f"CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(_EMB_SIGN_BITS))


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup: bucket every vector by the sign pattern
    of its first 8 dims (near-identical vectors agree on signs), equi-join
    within bucket — a blocking join, never a cross join — and keep pairs
    with cosine >= tau. The bucket key makes this linear-ish at 100 TB:
    candidates = sum over buckets of n_b^2 with n_b ~ n/256; widen the
    sign bits (or add rotations as in webr.similarity's multi-table LSH)
    to cap bucket sizes as the corpus grows."""
    e = (read(spark, sf, "embeddings")
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v"))
         .withColumn("bkt", F.expr(_spark_sign_bucket())))
    a, b = e.alias("a"), e.alias("b")
    dot = ("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, "
           "(acc, x) -> acc + x)")
    nrm = "sqrt(aggregate({c}, 0D, (acc, x) -> acc + x * x))"
    cos = (f"({dot}) / ((" + nrm.format(c="a.v") + ") * ("
           + nrm.format(c="b.v") + "))")
    return (a.join(b, (F.col("a.bkt") == F.col("b.bkt"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_id_1"),
                    F.col("b.vec_id").alias("vec_id_2"),
                    F.expr(cos).alias("cos_raw"))
            .where(F.round("cos_raw", 6) >= _EMB_TAU)
            .select("vec_id_1", "vec_id_2",
                    F.round("cos_raw", 4).alias("cosine"))
            .orderBy("vec_id_1", "vec_id_2"))


SQL_DEDUP_EMBEDDING = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {_duck_sign_bucket()} AS bkt FROM e),
p AS (SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
             list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]))
             / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos_raw
      FROM b a JOIN b b ON a.bkt = b.bkt AND a.vec_id < b.vec_id)
SELECT vec_id_1, vec_id_2, round(cos_raw, 4) AS cosine
FROM p WHERE round(cos_raw, 6) >= {_EMB_TAU} ORDER BY vec_id_1, vec_id_2
"""


def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    from webr.similarity import lsh_topk
    e = read(spark, sf, "embeddings")
    q = (e.where(F.col("vec_id") % 100 == 0)
         .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (lsh_topk(e, q, dim=64, k=5)
            .select("q_id", "vec_id", F.round("cosine", 4).alias("cosine"),
                    "rk")
            .orderBy("q_id", "rk"))


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    from webr.similarity import ivf_topk
    e = read(spark, sf, "embeddings")
    q = (e.where(F.col("vec_id") % 100 == 0)
         .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (ivf_topk(e, q, dim=64, k=5)
            .select("q_id", "vec_id", F.round("cosine", 4).alias("cosine"),
                    "rk")
            .orderBy("q_id", "rk"))


QUERIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH_LSH),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM_JACCARD),
    "dedup_embedding": (q_dedup_embedding, SQL_DEDUP_EMBEDDING),
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "multimodal_meta": (q_multimodal_meta, SQL_MULTIMODAL_META),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
    "ann_ivf_topk": (q_ann_ivf_topk, None),
}
