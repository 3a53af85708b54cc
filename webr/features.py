"""Pairwise feature + scoring kernel, shared by oracle and engine.

``score_pairs(pairs_pdf, idf)`` is the batched kernel: one pandas DataFrame
of candidate pairs in, features + calibrated score out. The engine calls it
inside an Arrow-batched ``mapInPandas`` (analog of the reference's single
batched ``predict_proba`` over the per-block feature matrix,
dao/author_block.py:357-410); the NumPy oracle calls it directly. Floating
point is bitwise-identical on both sides because token accumulation is done
in sorted-key order.

Features (SURVEY §2.7): Jaro-Winkler on full names (F2), Soundex agreement
on last names (F4), Jaccard-with-eps on title tokens (F1), TF-IDF cosine on
body tokens (F5/F18), Levenshtein-normalized host similarity (F3).
Pre-filters applied as hard gates exactly like the reference: name
compatibility (P6, dao/author.py:75-110) and same-document exclusion
(P7, dao/author_block.py:386-389) force score 0.0.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from webr import spec
from webr.textproc import (
    jaccard, jaro_winkler, levenshtein, names_compatible, soundex,
)

FEATURE_COLUMNS = [
    "name_jw", "soundex_agree", "title_jac", "body_cos", "host_sim",
    "compat", "same_doc", "raw", "score", "is_edge",
]


_HASH_MEMO: dict[str, int] = {}


def token_hash(t: str) -> int:
    """Deterministic 60-bit token id: int(md5(t)[:15 hex], 16). Memoized
    (vocab-bounded). JVM twin (engine join fallback):
    ``conv(substring(md5(token), 1, 15), 16, 10)`` cast to long — identical
    values, so either side of the engine produces the same arrays. Weight
    arrays carry these int64 ids instead of token strings: ~2x less pair-
    join shuffle and faster sorted merges; a cross-token collision
    (2^-60-ish) merely merges two terms of a cosine."""
    v = _HASH_MEMO.get(t)
    if v is None:
        v = _HASH_MEMO[t] = int(
            hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
    return v


def weight_arrays(tokens: list[str],
                  idf: dict | None) -> tuple[list[int], list[float], float]:
    """-> (sorted token ids, tf*idf values aligned, L2 norm). Computed ONCE
    per mention (engine: mention_feats stage; oracle: attach step), so pair
    scoring never rebuilds dicts. Missing token -> 0.0 weight (ref F18
    util/utils.py:40 / classifier/feature_vector.py:36). Norm accumulates in
    sorted-id order on both sides -> bitwise-identical float64."""
    if idf is None:
        idf = {}
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    entries = sorted((token_hash(t), c * idf.get(t, 0.0))
                     for t, c in tf.items())
    # merge distinct tokens colliding under the 60-bit hash (weights sum
    # in sorted-(hash, weight) order) so the arrays are truly unique —
    # the cosine's searchsorted merge requires it, and the JVM twin
    # (engine join fallback) groups by hash the same way
    merged: list[tuple[int, float]] = []
    for h, v in entries:
        if merged and merged[-1][0] == h:
            merged[-1] = (h, merged[-1][1] + v)
        else:
            merged.append((h, v))
    vals = [v for _, v in merged]
    acc = 0.0
    for v in vals:
        acc += v * v
    return [h for h, _ in merged], vals, math.sqrt(acc)


def sparse_cosine_sorted(t1, v1, n1: float, t2, v2, n2: float) -> float:
    """L2-normalized dot over the intersection of two sorted UNIQUE
    token-id arrays (weight_arrays merges hash collisions, so uniqueness
    holds by construction); 0.0 if either norm is 0 (ref classifier/
    feature_vector_bow.py:23-60). The intersection runs in C via
    searchsorted on the sorted ids (cheaper than intersect1d's
    concat+argsort), and the dot is numpy's deterministic pairwise sum
    over ascending ids — oracle and engine call this exact function, so
    scores stay bit-identical across them."""
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    a1 = np.asarray(t1, dtype=np.int64)
    a2 = np.asarray(t2, dtype=np.int64)
    if len(a1) == 0 or len(a2) == 0:
        return 0.0
    idx = np.searchsorted(a1, a2)
    idx[idx == len(a1)] = 0  # out-of-range probes -> mask kills them
    mask = a1[idx] == a2
    if not mask.any():
        return 0.0
    prods = (np.asarray(v1, dtype=np.float64)[idx[mask]]
             * np.asarray(v2, dtype=np.float64)[mask])
    return float(np.sum(prods)) / (n1 * n2)


def host_similarity(ha: str, hb: str) -> float:
    if not ha and not hb:
        return 0.0
    m = max(len(ha), len(hb), 1)
    return 1.0 - levenshtein(ha, hb) / m


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def score_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Batched kernel. Input columns required (suffix _1/_2 per side):
    url, doc_id, name_norm, first, middle, last, title_toks, host, and the
    precomputed tf-idf arrays w_toks/w_vals/w_norm (built by weight_arrays
    via a distributed idf join in the engine — no driver-side global
    vocabulary is ever collected; SURVEY §4 broadcast-dict note, scaled up).
    Returns input + FEATURE_COLUMNS."""
    n = len(pairs)
    out = {c: [0.0] * n for c in
           ("name_jw", "soundex_agree", "title_jac", "body_cos", "host_sim",
            "raw", "score")}
    compat_l = [False] * n
    same_doc_l = [False] * n
    edge_l = [False] * n

    cols = {c: pairs[c].tolist() for c in (
        "url_1", "url_2", "doc_id_1", "doc_id_2",
        "name_norm_1", "name_norm_2",
        "first_1", "first_2", "middle_1", "middle_2", "last_1", "last_2",
        "title_toks_1", "title_toks_2", "host_1", "host_2",
        "w_toks_1", "w_toks_2", "w_vals_1", "w_vals_2",
        "w_norm_1", "w_norm_2")}
    # title tokens become plain lists for the set Jaccard
    for c in ("title_toks_1", "title_toks_2"):
        cols[c] = [x if isinstance(x, list) else x.tolist() for x in cols[c]]

    # weight arrays convert to int64/float64 numpy ONCE per distinct
    # mention per batch (keyed by url): with pair-degree ~25 the per-pair
    # asarray conversions were the cosine path's dominant cost
    arr_memo: dict = {}

    def arrs_of(u, t, v):
        r = arr_memo.get(u)
        if r is None:
            r = arr_memo[u] = (np.asarray(t, dtype=np.int64),
                               np.asarray(v, dtype=np.float64))
        return r

    # memo tables: names/hosts repeat heavily across a block's pairs, and
    # jaro_winkler / soundex / host_similarity are pure + symmetric, so
    # caching them changes nothing semantically (the oracle runs this same
    # kernel) while cutting the Python hot loop by the repeat factor.
    jw_memo: dict = {}
    sx_memo: dict = {}
    hs_memo: dict = {}

    def jw_of(a: str, b: str) -> float:
        k = (a, b) if a <= b else (b, a)
        v = jw_memo.get(k)
        if v is None:
            v = jw_memo[k] = jaro_winkler(k[0], k[1])
        return v

    def sx_of(s: str) -> str:
        v = sx_memo.get(s)
        if v is None:
            v = sx_memo[s] = soundex(s)
        return v

    def hs_of(a: str, b: str) -> float:
        k = (a, b) if a <= b else (b, a)
        v = hs_memo.get(k)
        if v is None:
            v = hs_memo[k] = host_similarity(k[0], k[1])
        return v

    for i in range(n):
        same_doc = cols["doc_id_1"][i] == cols["doc_id_2"][i]
        same_doc_l[i] = same_doc
        compat = (cols["last_1"][i] == cols["last_2"][i]) and names_compatible(
            cols["first_1"][i], cols["middle_1"][i],
            cols["first_2"][i], cols["middle_2"][i])
        compat_l[i] = compat
        if same_doc or not compat:
            continue  # hard gates BEFORE expensive features (ref §4 row 3)
        jw = jw_of(cols["name_norm_1"][i], cols["name_norm_2"][i])
        sxa, sxb = sx_of(cols["last_1"][i]), sx_of(cols["last_2"][i])
        sx = 1.0 if (sxa and sxa == sxb) else 0.0
        tj = jaccard(set(cols["title_toks_1"][i]), set(cols["title_toks_2"][i]))
        t1a, v1a = arrs_of(cols["url_1"][i],
                           cols["w_toks_1"][i], cols["w_vals_1"][i])
        t2a, v2a = arrs_of(cols["url_2"][i],
                           cols["w_toks_2"][i], cols["w_vals_2"][i])
        bc = sparse_cosine_sorted(t1a, v1a, cols["w_norm_1"][i],
                                  t2a, v2a, cols["w_norm_2"][i])
        hs = hs_of(cols["host_1"][i], cols["host_2"][i])
        raw = (spec.W_NAME_JW * jw + spec.W_SOUNDEX * sx
               + spec.W_TITLE_JAC * tj + spec.W_BODY_COS * bc
               + spec.W_HOST_SIM * hs)
        score = round(_sigmoid(spec.CAL_SLOPE * (raw - spec.CAL_CENTER)),
                      spec.SCORE_DECIMALS)
        out["name_jw"][i] = jw
        out["soundex_agree"][i] = sx
        out["title_jac"][i] = tj
        out["body_cos"][i] = bc
        out["host_sim"][i] = hs
        out["raw"][i] = raw
        out["score"][i] = score
        edge_l[i] = score >= spec.EPS and bc >= spec.COS_MIN

    res = pairs.copy()
    for c, v in out.items():
        res[c] = v
    res["compat"] = compat_l
    res["same_doc"] = same_doc_l
    res["is_edge"] = edge_l
    return res
