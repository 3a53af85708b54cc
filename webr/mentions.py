"""pages -> mentions: per-row derivation shared by oracle and engine.

One pure function ``derive_mentions(pandas.DataFrame) -> pandas.DataFrame``
applied by the oracle directly and by the engine inside ``mapInPandas``
(Arrow-batched). This is the single source of truth for extraction,
normalization, name parsing and blocking-key assignment, so the
``input_hint`` byte-identity invariant holds by construction.

Reference lifecycle analog: dao/pubmed_doc.py:49-123 (load+normalize+BoW)
+ dao/pubmed_author.py:50-81 (name parse) + extract_blocks.py:34-48 (keys).
"""

from __future__ import annotations

import pandas as pd

from webr import spec
from webr.textproc import (
    decode_html, doc_id_of, extract_h1, extract_text, extract_title,
    host_of, minhash_band_keys, tokenize, try_parse_name,
)

MENTION_COLUMNS = [
    "url", "warc_ts", "doc_id", "host", "text", "title", "name_raw",
    "first", "middle", "last", "name_norm",
    "title_toks", "body_toks", "block_keys", "parse_ok",
]


def block_keys_for(host: str, first: str, last: str,
                   body_toks: list[str]) -> list[str]:
    """Blocking-key families (north_star):
    n: last-name + first-initial (global; ref extract_blocks.py:38-43)
    h: hostname + name initials  (host-local)
    m: MinHash-LSH band keys over body shingles (content near-dup)."""
    keys: list[str] = []
    if last and last[:1].isalpha():
        keys.append(f"n:{last}_{first[:1]}")
        if host:
            keys.append(f"h:{host}/{last[:1]}{first[:1]}")
    keys.extend(
        "m:" + k for k in minhash_band_keys(
            body_toks, n_bands=spec.MINHASH_BANDS,
            rows=spec.MINHASH_ROWS, shingle=spec.MINHASH_SHINGLE))
    return keys


def derive_mention_row(url: str, html, text: str | None,
                       warc_ts=None) -> dict:
    page = decode_html(html)  # one UTF-8 pass; extract_* share the str
    txt = text if text else extract_text(page)
    title = extract_title(page)
    name_raw = extract_h1(page)
    parsed = try_parse_name(name_raw)
    first, middle, last = parsed if parsed else ("", "", "")
    host = host_of(url)
    body_toks = tokenize(txt)
    name_norm = " ".join(p for p in (first, middle, last) if p)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "doc_id": doc_id_of(url),
        "host": host,
        "text": txt,
        "title": title,
        "name_raw": name_raw,
        "first": first,
        "middle": middle,
        "last": last,
        "name_norm": name_norm,
        "title_toks": tokenize(title),
        "body_toks": body_toks,
        "block_keys": block_keys_for(host, first, last, body_toks)
            if parsed else [],
        "parse_ok": parsed is not None,
    }


def derive_mentions(pages: pd.DataFrame) -> pd.DataFrame:
    """Vector entrypoint: pandas in / pandas out (Arrow batch shape).
    ``warc_ts`` (crawl time) passes through when present — the F10/F11
    analog pair features derive from it downstream."""
    ts = (pages["warc_ts"] if "warc_ts" in pages.columns
          else [None] * len(pages))
    rows = [
        derive_mention_row(u, h, t, w)
        for u, h, t, w in zip(pages["url"], pages["html"], pages["text"],
                              ts)
    ]
    out = pd.DataFrame(rows, columns=MENTION_COLUMNS)
    return out
