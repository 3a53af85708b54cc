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
    jaccard, jaro_winkler, levenshtein, name_part_match, names_compatible,
    soundex,
)

FEATURE_COLUMNS = [
    "name_jw", "soundex_agree", "title_jac", "body_cos", "host_sim",
    "first_match", "middle_match", "ts_day_diff", "era_match",
    "compat", "same_doc", "raw", "score", "is_edge",
]

_NS_PER_DAY = 86_400_000_000_000


def _ts_day_era(ts) -> tuple[int, int] | None:
    """(epoch-day, era bucket) of a crawl timestamp, or None when
    missing. Everything funnels through pd.Timestamp so engine
    (Arrow datetime64) and oracle (datetime/Timestamp) agree exactly."""
    if ts is None or pd.isna(ts):
        return None
    t = ts if isinstance(ts, pd.Timestamp) else pd.Timestamp(ts)
    return t.value // _NS_PER_DAY, t.year // spec.TS_ERA_YEARS


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
    a1 = t1 if isinstance(t1, np.ndarray) else np.asarray(t1, np.int64)
    a2 = t2 if isinstance(t2, np.ndarray) else np.asarray(t2, np.int64)
    if len(a1) == 0 or len(a2) == 0:
        return 0.0
    # probe the SMALLER side into the larger: cost min·log(max) instead of
    # len(t2)·log(len(t1)). Bitwise-neutral: the intersection is
    # enumerated in ascending token-id order either way (both inputs are
    # sorted), and the elementwise multiply commutes exactly.
    if len(a2) > len(a1):
        a1, a2 = a2, a1
        v1, v2 = v2, v1
    idx = a1.searchsorted(a2)
    idx[idx == len(a1)] = 0  # out-of-range probes -> mask kills them
    mask = a1[idx] == a2
    if not mask.any():
        return 0.0
    w1 = v1 if isinstance(v1, np.ndarray) else np.asarray(v1, np.float64)
    w2 = v2 if isinstance(v2, np.ndarray) else np.asarray(v2, np.float64)
    # .sum() IS np.sum (same pairwise reduction) minus the dispatch shim
    prods = w1[idx[mask]] * w2[mask]
    return float(prods.sum()) / (n1 * n2)


def host_similarity(ha: str, hb: str) -> float:
    if not ha and not hb:
        return 0.0
    m = max(len(ha), len(hb), 1)
    return 1.0 - levenshtein(ha, hb) / m


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


MEMBER_COLUMNS = ["url", "warc_ts", "doc_id", "name_norm", "first",
                  "middle", "last", "title_toks", "host",
                  "w_toks", "w_vals", "w_norm"]


def score_pairs_indexed(memb: dict, i1, i2) -> dict:
    """Core batched kernel over a MEMBER table + pair index arrays.

    ``memb``: column -> list over the batch's distinct mentions
    (MEMBER_COLUMNS). ``i1``/``i2``: per-pair integer indexes into the
    member table. Returns FEATURE_COLUMNS -> list.

    Working member-indexed (instead of on a pre-joined _1/_2 sided frame)
    means the fat weight arrays are touched once per MEMBER — numpy
    conversion, title-token set, soundex all amortize over the pair
    degree (~25x) — and the engine's cogroup path never materializes the
    43-column sided frame at all. The oracle reaches this same function
    through the ``score_pairs`` wrapper, so scores stay bit-identical."""
    m = len(memb["url"])
    n = len(i1)
    out = {c: [0.0] * n for c in
           ("name_jw", "soundex_agree", "title_jac", "body_cos", "host_sim",
            "raw", "score")}
    compat_l = [False] * n
    same_doc_l = [False] * n
    edge_l = [False] * n
    # F7/F8: categorical name-part match levels — emitted for EVERY pair
    # (gated ones included) since they are observational features, not
    # score inputs (the score's compat gate subsumes them)
    first_match_l = [""] * n
    middle_match_l = [""] * n
    # F10/F11 analogs on crawl time — observational like F7/F8.
    # ts_day_diff keeps -1 as its missing marker (documented, non-null
    # long); era_match is nullable, so missing-timestamp pairs stay NULL
    # instead of masquerading as a genuine era mismatch
    ts_diff_l = [-1] * n
    era_match_l: list = [None] * n

    doc_id = memb["doc_id"]
    name_norm = memb["name_norm"]
    first = memb["first"]
    middle = memb["middle"]
    last = memb["last"]
    host = memb["host"]
    w_norm = memb["w_norm"]

    # per-member precomputes (each amortizes over the pair degree)
    day_era = [_ts_day_era(t) for t in memb["warc_ts"]]
    tsets = [set(t) for t in memb["title_toks"]]
    arrs = [(np.asarray(t, dtype=np.int64),
             np.asarray(v, dtype=np.float64))
            for t, v in zip(memb["w_toks"], memb["w_vals"])]
    sx_memo: dict = {}

    def sx_of(s: str) -> str:
        v = sx_memo.get(s)
        if v is None:
            v = sx_memo[s] = soundex(s)
        return v

    sx_m = [sx_of(s) for s in last]

    # pair-level memos: names/hosts repeat heavily across a block's pairs,
    # and jaro_winkler / host_similarity are pure + symmetric, so caching
    # them changes nothing semantically while cutting the Python hot loop
    # by the repeat factor.
    jw_memo: dict = {}
    hs_memo: dict = {}

    def jw_of(a: str, b: str) -> float:
        k = (a, b) if a <= b else (b, a)
        v = jw_memo.get(k)
        if v is None:
            v = jw_memo[k] = jaro_winkler(k[0], k[1])
        return v

    def hs_of(a: str, b: str) -> float:
        k = (a, b) if a <= b else (b, a)
        v = hs_memo.get(k)
        if v is None:
            v = hs_memo[k] = host_similarity(k[0], k[1])
        return v

    pm_memo: dict = {}

    def pm_of(x: str, y: str) -> str:
        k = (x, y) if x <= y else (y, x)
        v = pm_memo.get(k)
        if v is None:
            v = pm_memo[k] = name_part_match(k[0], k[1])
        return v

    # (first, middle) signatures repeat across a block's pairs just like
    # names/hosts do, and names_compatible is symmetric under side swap —
    # same memo trick as jw_of/pm_of
    sig = list(zip(first, middle))
    nc_memo: dict = {}

    def nc_of(sa: tuple, sb: tuple) -> bool:
        k = (sa, sb) if sa <= sb else (sb, sa)
        v = nc_memo.get(k)
        if v is None:
            v = nc_memo[k] = names_compatible(
                k[0][0], k[0][1], k[1][0], k[1][1])
        return v

    for p in range(n):
        a = i1[p]
        b = i2[p]
        same_doc = doc_id[a] == doc_id[b]
        same_doc_l[p] = same_doc
        compat = (last[a] == last[b]) and nc_of(sig[a], sig[b])
        compat_l[p] = compat
        first_match_l[p] = pm_of(first[a], first[b])
        middle_match_l[p] = pm_of(middle[a], middle[b])
        de_a, de_b = day_era[a], day_era[b]
        if de_a is not None and de_b is not None:
            ts_diff_l[p] = min(spec.TS_DAY_DIFF_CAP,
                               abs(de_a[0] - de_b[0]))
            era_match_l[p] = de_a[1] == de_b[1]
        if same_doc or not compat:
            continue  # hard gates BEFORE expensive features (ref §4 row 3)
        jw = jw_of(name_norm[a], name_norm[b])
        sx = 1.0 if (sx_m[a] and sx_m[a] == sx_m[b]) else 0.0
        tj = jaccard(tsets[a], tsets[b])
        t1a, v1a = arrs[a]
        t2a, v2a = arrs[b]
        bc = sparse_cosine_sorted(t1a, v1a, w_norm[a],
                                  t2a, v2a, w_norm[b])
        hs = hs_of(host[a], host[b])
        raw = (spec.W_NAME_JW * jw + spec.W_SOUNDEX * sx
               + spec.W_TITLE_JAC * tj + spec.W_BODY_COS * bc
               + spec.W_HOST_SIM * hs)
        score = round(_sigmoid(spec.CAL_SLOPE * (raw - spec.CAL_CENTER)),
                      spec.SCORE_DECIMALS)
        out["name_jw"][p] = jw
        out["soundex_agree"][p] = sx
        out["title_jac"][p] = tj
        out["body_cos"][p] = bc
        out["host_sim"][p] = hs
        out["raw"][p] = raw
        out["score"][p] = score
        edge_l[p] = score >= spec.EPS and bc >= spec.COS_MIN

    out["first_match"] = first_match_l
    out["middle_match"] = middle_match_l
    out["ts_day_diff"] = ts_diff_l
    out["era_match"] = era_match_l
    out["compat"] = compat_l
    out["same_doc"] = same_doc_l
    out["is_edge"] = edge_l
    return out


def score_pairs(pairs: pd.DataFrame) -> pd.DataFrame:
    """Batched kernel over a pre-joined sided frame (the oracle path).
    Input columns required (suffix _1/_2 per side): url, doc_id,
    name_norm, first, middle, last, title_toks, host, and the precomputed
    tf-idf arrays w_toks/w_vals/w_norm (built by weight_arrays via a
    distributed idf join in the engine — no driver-side global vocabulary
    is ever collected; SURVEY §4 broadcast-dict note, scaled up).
    Returns input + FEATURE_COLUMNS. Internally de-duplicates the sides
    into a member table and runs ``score_pairs_indexed``."""
    n = len(pairs)
    memb: dict = {c: [] for c in MEMBER_COLUMNS}
    idx: dict = {}

    def intern(u, row_of):
        j = idx.get(u)
        if j is None:
            j = idx[u] = len(memb["url"])
            for c in MEMBER_COLUMNS:
                memb[c].append(row_of(c))
        return j

    side_lists = {}
    for s in ("1", "2"):
        side_lists[s] = {c: pairs[f"{c}_{s}"].tolist()
                         for c in MEMBER_COLUMNS}
    tt = side_lists
    for s in ("1", "2"):
        tl = tt[s]["title_toks"]
        tt[s]["title_toks"] = [x if isinstance(x, list) else list(x)
                               for x in tl]
    i1 = [0] * n
    i2 = [0] * n
    u1 = tt["1"]["url"]
    u2 = tt["2"]["url"]
    for p in range(n):
        i1[p] = intern(u1[p], lambda c: tt["1"][c][p])
        i2[p] = intern(u2[p], lambda c: tt["2"][c][p])

    out = score_pairs_indexed(memb, i1, i2)
    res = pairs.copy()
    for c in FEATURE_COLUMNS:
        res[c] = out[c]
    return res
