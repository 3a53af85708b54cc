"""Mega-block guard for the doc_* query family and dedup_ngram_jaccard:
a hot key (one mega source) must produce O(n*W) pairs, not O(n^2), and
the DuckDB oracle must mirror the rule bit-for-bit."""

import os
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

from webr import spec


@pytest.fixture(scope="module")
def mega_sf_dir(spark):
    """Synthetic documents.parquet with one mega source (200 docs sharing
    source + first-token initial => one block of 200 > MAX_BLOCK_SIZE=64)
    and a small source (10 docs)."""
    d = tempfile.mkdtemp(prefix="webr_mega_")
    rows = []
    for i in range(200):
        rows.append({
            "doc_id": i,
            "text": f"alpha shared tokens here doc{i} alpha beta gamma "
                    f"word{i % 7} word{i % 11} filler text body",
            "lang": "en",
            "source": "mega.example.com",
            "n_chars": 80 + i % 13,
        })
    for i in range(200, 210):
        rows.append({
            "doc_id": i,
            "text": f"alpha small host doc{i} delta epsilon word{i % 3}",
            "lang": "en",
            "source": "tiny.example.org",
            "n_chars": 40 + i % 5,
        })
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols).reset_index(drop=True)
            .astype({c: "float64" for c in cols
                     if df[c].dtype.kind in "if"}))


def test_doc_pairs_bounded_and_oracle_match(spark, mega_sf_dir):
    from webr.queries.er_docs import SQL_DOC_PAIRS, q_doc_pairs
    got = q_doc_pairs(spark, mega_sf_dir).toPandas()
    want = _duck(mega_sf_dir, SQL_DOC_PAIRS)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # the mega block (200 docs, all same source+initial) must be
    # sorted-neighborhood bounded: n*W pairs, nowhere near n*(n-1)/2
    mega = got[got.block_key.str.startswith("mega")]
    n, w = 200, spec.SN_WINDOW
    assert int(mega.n_pairs.sum()) == n * w - w * (w + 1) // 2
    tiny = got[got.block_key.str.startswith("tiny")]
    assert int(tiny.n_pairs.sum()) == 10 * 9 // 2  # small block: all pairs


def test_doc_pair_features_oracle_match_mega(spark, mega_sf_dir):
    from webr.queries.er_docs import (
        SQL_DOC_PAIR_FEATURES, q_doc_pair_features,
    )
    got = q_doc_pair_features(spark, mega_sf_dir).toPandas()
    want = _duck(mega_sf_dir, SQL_DOC_PAIR_FEATURES)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_dedup_ngram_jaccard_bounded(spark, mega_sf_dir):
    from webr.queries.dataops import (
        SQL_DEDUP_NGRAM_JACCARD, q_dedup_ngram_jaccard,
    )
    got = q_dedup_ngram_jaccard(spark, mega_sf_dir).toPandas()
    want = _duck(mega_sf_dir, SQL_DEDUP_NGRAM_JACCARD)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # pair universe is bounded by the window rule even though every doc in
    # the mega source shares shingle 'alpha ...' content
    n, w = 200, spec.SN_WINDOW
    assert len(got) <= n * w + 10 * 9 // 2


def test_doc_components_oracle_match_mega(spark, mega_sf_dir):
    from webr.queries.er_docs import SQL_DOC_COMPONENTS, q_doc_components
    got = q_doc_components(spark, mega_sf_dir).toPandas()
    want = _duck(mega_sf_dir, SQL_DOC_COMPONENTS)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


@pytest.fixture(scope="module")
def identical_sf_dir():
    """200 byte-identical texts: every simhash (band, word) bucket and
    every minhash (band, sig) bucket contains ALL 200 docs — the
    hot-bucket worst case."""
    d = tempfile.mkdtemp(prefix="webr_hotword_")
    rows = [{"doc_id": i,
             "text": "alpha beta gamma delta epsilon zeta shared body",
             "lang": "en", "source": "mega.example.com", "n_chars": 48}
            for i in range(200)]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_simhash64_hot_word_bounded(spark, identical_sf_dir):
    """One hot (band, word) bucket must produce O(n*W) candidate pairs via
    the sorted-neighborhood guard — never n*(n-1)/2 — and the DuckDB
    oracle must mirror the rule exactly."""
    from webr.queries.dataops import (
        _sql_simhash64_pairs, q_simhash64_pairs,
    )
    got = q_simhash64_pairs(spark, identical_sf_dir).toPandas()
    want = _duck(identical_sf_dir, _sql_simhash64_pairs())
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # all 4 bands yield the SAME bounded pair set (identical docs =>
    # identical words => identical doc_id ordering per bucket), so
    # after distinct: exactly the one-bucket sorted-neighborhood count
    n, w = 200, spec.SN_WINDOW
    assert len(got) == n * w - w * (w + 1) // 2


def test_minhash_lsh_doc_ids_cell_bounded(spark, identical_sf_dir):
    """A mega bucket reports its full n_docs but samples at most
    _LSH_IDS_CAP ids into the doc_ids cell (no unbounded reducer cell);
    oracle mirrors the cap."""
    from webr.queries.dataops import (
        _LSH_IDS_CAP, SQL_DEDUP_MINHASH_LSH, q_dedup_minhash_lsh,
    )
    got = q_dedup_minhash_lsh(spark, identical_sf_dir).toPandas()
    want = _duck(identical_sf_dir, SQL_DEDUP_MINHASH_LSH)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    assert (got.doc_ids.str.count(",") + 1 <= _LSH_IDS_CAP).all()
    # every bucket holds all 200 docs — far over the cap, so the sample
    # bound is exercised for real
    assert (got.n_docs == 200).all()


def test_null_block_keys_pair_with_nothing(spark):
    """Mega group of NULL block keys (empty/garbage text) must produce
    ZERO pairs on both engines — SQL join semantics, not a NULL window
    partition of lead-paired garbage."""
    import os
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="webr_nullblock_")
    rows = [{"doc_id": i, "text": "", "lang": "en",
             "source": "s.example.org", "n_chars": 0} for i in range(100)]
    rows += [{"doc_id": 100 + i, "text": f"alpha beta doc{i}",
              "lang": "en", "source": "s.example.org", "n_chars": 20}
             for i in range(4)]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    try:
        from webr.queries.er_docs import SQL_DOC_PAIRS, q_doc_pairs
        got = q_doc_pairs(spark, d).toPandas()
        want = _duck(d, SQL_DOC_PAIRS)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)
        # only the 4 real docs pair; the 100 NULL-key docs pair with nothing
        assert int(got.n_pairs.sum()) == 4 * 3 // 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def lines_sf_dir():
    """documents.parquet planted for dedup_lines: docs 0 and 1 share one
    exact 10-token chunk (0 is the keeper), doc 2 shares nothing, doc 3
    is a full copy of doc 0 (every chunk dropped)."""
    d = tempfile.mkdtemp(prefix="webr_lines_")
    shared = " ".join(f"tok{i}" for i in range(10))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    rows = [
        {"doc_id": 0, "text": shared + " " + uniq("a"), "lang": "en",
         "source": "s", "n_chars": 1},
        {"doc_id": 1, "text": shared + " " + uniq("b"), "lang": "en",
         "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": uniq("c") + " " + uniq("d"), "lang": "en",
         "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": shared + " " + uniq("a"), "lang": "en",
         "source": "s", "n_chars": 1},
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_dedup_lines_keeper_and_counts(spark, lines_sf_dir):
    """C4-style line dedup: the minimum doc keeps a duplicated chunk,
    every other occurrence drops; untouched docs don't appear; a doc
    whose every chunk is owned elsewhere drops to the empty text."""
    import hashlib

    from webr.queries.dataops import SQL_DEDUP_LINES, q_dedup_lines

    got = (q_dedup_lines(spark, lines_sf_dir).toPandas()
           .set_index("doc_id"))
    # doc 0 is keeper of both its chunks (min doc_id) -> not in output;
    # doc 2 shares nothing -> not in output
    assert sorted(got.index) == [1, 3]
    assert got.loc[1, "n_chunks"] == 2 and got.loc[1, "n_dropped"] == 1
    uniq_b = " ".join(f"b{i}" for i in range(10))
    assert got.loc[1, "clean_fp"] == hashlib.md5(
        uniq_b.encode()).hexdigest()
    # doc 3 duplicates doc 0 entirely -> all chunks dropped, empty text
    assert got.loc[3, "n_chunks"] == 2 and got.loc[3, "n_dropped"] == 2
    assert got.loc[3, "clean_fp"] == hashlib.md5(b"").hexdigest()
    # DuckDB oracle matches exactly
    want = _duck(lines_sf_dir, SQL_DEDUP_LINES)
    pd.testing.assert_frame_equal(
        _canon(got.reset_index()), _canon(want))


def test_pii_scan_planted_signals(spark):
    """The driver corpus carries no PII-shaped tokens (the oracle row is
    all-zeros there), so the operator's arithmetic is proven on planted
    data: exact email/url token counts, digit ratio, flag — and the
    DuckDB mirror must agree cell-for-cell."""
    from webr.queries.dataops import SQL_PII_SCAN, q_pii_scan

    d = tempfile.mkdtemp(prefix="webr_pii_")
    try:
        rows = [
            {"doc_id": 0,
             "text": "contact bob@example.com or https://a.io now",
             "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 1, "text": "no signals at all here",
             "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 2, "text": "call 555 1234 x99",
             "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 3, "text": "bare @ and trailing. http ok httpx",
             "lang": "en", "source": "s", "n_chars": 1},
        ]
        pd.DataFrame(rows).to_parquet(
            os.path.join(d, "documents.parquet"))
        got = q_pii_scan(spark, d).toPandas().set_index("doc_id")
        assert got.loc[0, "email_toks"] == 1      # bob@example.com
        assert got.loc[0, "url_toks"] == 1        # https://a.io
        assert bool(got.loc[0, "flagged"])
        assert got.loc[1, "email_toks"] == 0 and not got.loc[1, "flagged"]
        # '555', '1234', 'x99' -> 9 digit chars of len('call 555 1234 x99')
        assert got.loc[2, "digit_ratio"] == round(9 / 17, 6)
        # '@' token has no '.', 'http'/'httpx' DO prefix-match (by
        # design: prefix heuristic), 'trailing.' is not an email
        assert got.loc[3, "email_toks"] == 0
        assert got.loc[3, "url_toks"] == 2
        want = _duck(d, SQL_PII_SCAN)
        pd.testing.assert_frame_equal(
            _canon(got.reset_index()), _canon(want))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_canonical_url_rules():
    """Each URL-canonicalization rule pinned on a crafted literal: scheme
    fold, host lower-case, www. strip, default-port strip, duplicate-slash
    collapse, trailing-slash strip, fragment drop, tracking-param drop,
    param sort. Pure-expression check via DuckDB (the Spark twin is proven
    equal by the dedup_url oracle hash in check_queries / the driver
    gate — same expression builder, engine flag aside)."""
    from webr.queries.dataops import _canon_url

    cases = {
        "https://a.io/x": "https://a.io/x",
        "HTTP://WWW.A.IO:80//x//y/": "https://a.io/x/y",
        "https://a.io:443/x?b=2&a=1#frag": "https://a.io/x?a=1&b=2",
        "https://a.io/x?utm_source=f&id=3&gclid=g&fbclid=h":
            "https://a.io/x?id=3",
        "https://a.io/x?utm_source=f": "https://a.io/x",
        "https://wwwx.a.io/x": "https://wwwx.a.io/x",  # only 'www.' strips
        # valueless tracking params (bare '?fbclid' / '?gclid') drop too
        "https://a.io/x?fbclid&id=3": "https://a.io/x?id=3",
        "https://a.io/x?gclid": "https://a.io/x",
        # ...but a non-tracking key that merely PREFIXES one survives
        "https://a.io/x?fbclidx=1": "https://a.io/x?fbclidx=1",
    }
    con = duckdb.connect()
    for raw, want in cases.items():
        got = con.execute(
            f"SELECT {_canon_url(f'''{raw!r}''', 'duck')}").fetchone()[0]
        assert got == want, (raw, got, want)


def test_decontaminate_planted_overlap(spark):
    """Planted contamination: doc 30 (30 % 29 == 1, so genuinely NOT a
    benchmark id — the round-3 version used 32, which IS sampled since
    32 % 29 == 3) copies the 5-gram prefix of benchmark doc 3; doc 1
    shares nothing. Exactly docs {3, 30} are flagged — 3 because a
    benchmark item trivially contaminates its own source doc — each
    hitting exactly ONE distinct benchmark item, and the DuckDB mirror
    agrees cell-for-cell."""
    from webr.queries.dataops import SQL_DECONTAMINATE, q_decontaminate

    d = tempfile.mkdtemp(prefix="webr_decon_")
    try:
        rows = [
            {"doc_id": 3,
             "text": "alpha beta gamma delta epsilon zeta eta theta",
             "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 1, "text": "totally unrelated words in this one",
             "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 30,
             "text": "stolen prefix alpha beta gamma delta epsilon here",
             "lang": "en", "source": "s", "n_chars": 1},
        ]
        pd.DataFrame(rows).to_parquet(
            os.path.join(d, "documents.parquet"))
        got = q_decontaminate(spark, d).toPandas()
        assert sorted(got.doc_id) == [3, 30]
        by_id = got.set_index("doc_id")
        assert by_id.loc[30, "first_bench_id"] == 3
        assert by_id.loc[30, "n_bench_hits"] == 1
        assert by_id.loc[3, "n_bench_hits"] == 1
        want = _duck(d, SQL_DECONTAMINATE)
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_lang_id_multilang(spark):
    """Planted fixture per language: a doc written mostly in each
    language's function words must be classified as that language, a
    stopword-free doc as 'other', and the DuckDB twin must agree
    cell-for-cell (integer-count argmax, exact arithmetic)."""
    from webr.queries.dataops import SQL_LANG_ID, q_lang_id

    texts = {
        0: ("en", "the cat is on the mat and it was not there when we "
                  "came from the market with all of our things"),
        1: ("es", "la casa de el perro y la que se fue por un camino "
                  "con no una cosa para los amigos del pueblo"),
        2: ("de", "der hund und die katze sind in dem haus mit einem "
                  "ball und das ist nicht so wie es war"),
        3: ("fr", "le chien et la maison des amis qui sont dans un "
                  "jardin avec une fleur pour les enfants du village"),
        4: ("it", "il cane e la casa che sono in un giardino con le "
                  "cose di questo paese e anche della gente"),
        5: ("other", "zzz qqq www rrr kkk mmm nnn ppp"),
    }
    d = tempfile.mkdtemp(prefix="webr_langid_")
    try:
        rows = [{"doc_id": k, "text": t, "lang": lg, "source": "s",
                 "n_chars": len(t)} for k, (lg, t) in texts.items()]
        pd.DataFrame(rows).to_parquet(
            os.path.join(d, "documents.parquet"))
        got = q_lang_id(spark, d).toPandas()
        by_id = got.set_index("doc_id")
        for k, (lg, _t) in texts.items():
            assert by_id.loc[k, "pred_lang"] == lg, (k, lg, by_id.loc[k])
        assert (got.margin >= 0).all()
        assert (by_id.loc[5, "best_ratio"] == 0.0)
        want = _duck(d, SQL_LANG_ID)
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_lang_id_scripts(spark):
    """Planted fixture per non-Latin script: codepoint-range detection
    must classify CJK/Cyrillic/Arabic/Devanagari text (which the ASCII
    stopword sets are blind to — these all used to land in 'other'),
    mixed text must clear the 30% floor before the script claims it,
    and the DuckDB twin must agree cell-for-cell."""
    from webr.queries.dataops import SQL_LANG_ID, q_lang_id

    texts = {
        0: ("cjk", "日本語のページです。東京と京都の写真を掲載しています。"),
        1: ("cjk", "这是一个中文网页 关于北京和上海的新闻报道"),
        2: ("cyrl", "это страница на русском языке о москве и новостях"),
        3: ("arab", "هذه صفحة باللغة العربية عن الأخبار والثقافة"),
        4: ("deva", "यह हिंदी भाषा में एक पृष्ठ है जो समाचार के बारे में है"),
        # latin text with a couple of foreign chars: script must NOT
        # claim it (ratio below the 0.30 floor), stopwords pick 'en'
        5: ("en", "the cat is on the mat and the dog is in the house й 中"),
        # stopword-free ASCII stays 'other'
        6: ("other", "zzz qqq www rrr kkk mmm nnn ppp"),
    }
    d = tempfile.mkdtemp(prefix="webr_langscript_")
    try:
        rows = [{"doc_id": k, "text": t, "lang": lg, "source": "s",
                 "n_chars": len(t)} for k, (lg, t) in texts.items()]
        pd.DataFrame(rows).to_parquet(
            os.path.join(d, "documents.parquet"))
        got = q_lang_id(spark, d).toPandas()
        by_id = got.set_index("doc_id")
        for k, (lg, _t) in texts.items():
            assert by_id.loc[k, "pred_lang"] == lg, (k, lg, by_id.loc[k])
        assert by_id.loc[0, "ratio_cjk"] > 0.8
        assert by_id.loc[2, "ratio_cyrl"] > 0.8
        assert by_id.loc[3, "ratio_arab"] > 0.8
        assert by_id.loc[4, "ratio_deva"] > 0.6  # danda/matras mix in
        assert float(by_id.loc[5, ["ratio_cjk", "ratio_cyrl", "ratio_arab",
                                   "ratio_deva"]].max()) < 0.30
        want = _duck(d, SQL_LANG_ID)
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
    finally:
        shutil.rmtree(d, ignore_errors=True)
