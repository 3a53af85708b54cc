"""Pure pandas/NumPy oracle: the executable spec of the whole pipeline.

Runs the exact reference-semantics pipeline in-process on a pandas frame of
pages (SURVEY.md §5 item 1): derive mentions (shared kernel) -> blocking
keys -> candidate pairs (all-pairs for blocks <= MAX_BLOCK_SIZE, J1;
sorted-neighborhood window for mega-blocks, the explicit skew rule of §4)
-> shared scoring kernel -> union-find connected components (minPts=2
DBSCAN == CC, SURVEY §2.8 C3) -> cluster labels + noise (C4).

The Spark engine must reproduce ``clusters`` exactly; tests assert pairwise
F1 >= 0.99 (BASELINE.json metric) and in practice equality.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import pandas as pd

from webr import spec
from webr.features import score_pairs
from webr.mentions import derive_mentions


@dataclass
class OracleResult:
    mentions: pd.DataFrame   # one row per page (mention)
    idf: dict                # token -> ln(N/df) over body tokens
    pairs: pd.DataFrame      # candidate pairs + features + score + is_edge
    clusters: pd.DataFrame   # url, cluster_id, is_noise
    golden_text: pd.DataFrame  # url, text_sha256, text_len


def build_idf(mentions: pd.DataFrame) -> dict:
    """idf = ln(N_mentions / df(token)) over body tokens
    (ref util/utils.py:24,40; A4)."""
    n = len(mentions)
    df_counts: dict[str, int] = {}
    for toks in mentions["body_toks"]:
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
    return {t: math.log(n / c) for t, c in df_counts.items()}


def enumerate_pairs(mentions: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs: explode block_keys; singleton blocks dropped (A2);
    all i<j pairs by url within small blocks (J1/P10); sorted-neighborhood
    (sort by name_norm,url; lookahead SN_WINDOW) within mega-blocks.
    Dedup across keys on (url_1,url_2), provenance = min block_key."""
    member_rows: list[tuple[str, str, str]] = []  # key, url, sort_key
    for url, name_norm, keys in zip(
            mentions["url"], mentions["name_norm"], mentions["block_keys"]):
        for k in keys:
            member_rows.append((k, url, name_norm + "\x00" + url))
    by_key: dict[str, list[tuple[str, str]]] = {}
    for k, url, sk in member_rows:
        by_key.setdefault(k, []).append((sk, url))

    best: dict[tuple[str, str], str] = {}
    for k, members in by_key.items():
        if len(members) < 2:
            continue
        if len(members) <= spec.MAX_BLOCK_SIZE:
            urls = sorted(u for _, u in members)
            gen = ((urls[i], urls[j])
                   for i in range(len(urls))
                   for j in range(i + 1, len(urls)))
        else:
            ms = sorted(members)
            gen = ((min(ms[i][1], ms[i + o][1]), max(ms[i][1], ms[i + o][1]))
                   for i in range(len(ms))
                   for o in range(1, spec.SN_WINDOW + 1)
                   if i + o < len(ms))
        for p in gen:
            cur = best.get(p)
            if cur is None or k < cur:
                best[p] = k
    if not best:
        return pd.DataFrame(columns=["url_1", "url_2", "block_key"])
    out = pd.DataFrame(
        [(a, b, k) for (a, b), k in sorted(best.items())],
        columns=["url_1", "url_2", "block_key"])
    return out


def attach_weight_arrays(mentions: pd.DataFrame, idf: dict) -> pd.DataFrame:
    """Per-mention sorted tf-idf arrays + norm (the oracle analog of the
    engine's distributed idf join + mention_feats stage — no global dict
    reaches the kernel)."""
    from webr.features import weight_arrays
    m = mentions.copy()
    arrays = [weight_arrays(list(toks), idf) for toks in m["body_toks"]]
    m["w_toks"] = [a[0] for a in arrays]
    m["w_vals"] = [a[1] for a in arrays]
    m["w_norm"] = [a[2] for a in arrays]
    return m


def attach_sides(pairs: pd.DataFrame, mentions: pd.DataFrame) -> pd.DataFrame:
    side_cols = ["url", "warc_ts", "doc_id", "name_norm", "first",
                 "middle", "last", "title_toks", "host",
                 "w_toks", "w_vals", "w_norm"]
    m = mentions[side_cols]
    p = pairs.merge(m.add_suffix("_1"), left_on="url_1", right_on="url_1")
    p = p.merge(m.add_suffix("_2"), left_on="url_2", right_on="url_2")
    return p


def connected_components(mentions: pd.DataFrame,
                         edges: list[tuple[str, str]]) -> pd.DataFrame:
    """Constrained transitive clustering: union-find over score-passed
    edges with the cannot-link replay (webr.constraints shared kernel,
    C2/W2 — ref dao/author_block.py:488-498, clustering/dbscan.py:49-60).
    A mention is clustered iff its constrained sub-cluster kept >= 2
    members (MIN_PTS); everything else is noise — a bridge mention whose
    every union was rejected reverts to noise exactly like a DBSCAN point
    without enough reachable neighbors."""
    from webr.constraints import constrained_components
    names = {u: (f, m) for u, f, m in zip(
        mentions["url"], mentions["first"], mentions["middle"])}
    rep = constrained_components(names, edges)
    sizes: dict[str, int] = {}
    for r in rep.values():
        sizes[r] = sizes.get(r, 0) + 1
    linked = {u for u, r in rep.items() if sizes[r] >= spec.MIN_PTS}
    reps = sorted({rep[u] for u in linked})
    rep_id = {r: i + 1 for i, r in enumerate(reps)}  # 0 reserved for noise
    rows = [(u, rep_id[rep[u]] if u in linked else 0, u not in linked)
            for u in sorted(names)]
    return pd.DataFrame(rows, columns=["url", "cluster_id", "is_noise"])


def run_oracle(pages: pd.DataFrame) -> OracleResult:
    mentions = derive_mentions(pages)
    idf = build_idf(mentions)
    pairs = enumerate_pairs(mentions)
    pairs = attach_sides(pairs, attach_weight_arrays(mentions, idf))
    scored = score_pairs(pairs) if len(pairs) else pairs.assign(
        score=[], is_edge=[])
    edges = list(zip(scored.loc[scored["is_edge"], "url_1"],
                     scored.loc[scored["is_edge"], "url_2"])) \
        if len(scored) else []
    clusters = connected_components(mentions, edges)
    golden_text = pd.DataFrame({
        "url": mentions["url"],
        "text_sha256": [hashlib.sha256(t.encode("utf-8")).hexdigest()
                        for t in mentions["text"]],
        "text_len": [len(t.encode("utf-8")) for t in mentions["text"]],
    })
    return OracleResult(mentions, idf, scored, clusters, golden_text)


def pairwise_f1(pred: pd.DataFrame, gold: pd.DataFrame,
                labeled_pairs: pd.DataFrame) -> float:
    """Pairwise F1 over labeled pairs sharing a blocking key
    (BASELINE.json metric). ``pred``/``gold``: url -> cluster_id,is_noise.
    Same-cluster iff same non-noise cluster_id."""
    def assign(df: pd.DataFrame) -> dict:
        return {u: (c if not n else None) for u, c, n in
                zip(df["url"], df["cluster_id"], df["is_noise"])}
    pa, ga = assign(pred), assign(gold)
    tp = fp = fn = 0
    for a, b in zip(labeled_pairs["url_1"], labeled_pairs["url_2"]):
        p = pa.get(a) is not None and pa.get(a) == pa.get(b)
        g = ga.get(a) is not None and ga.get(a) == ga.get(b)
        tp += p and g
        fp += p and not g
        fn += g and not p
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0
