"""Unit tests: scalar functions vs known values and vs Spark builtins
(SURVEY §5 item 3 — every branch point in §2.7 feature semantics)."""

import pyspark.sql.functions as F
import pytest

from webr import textproc as tp


# -- extraction -------------------------------------------------------------

def test_extract_text_basic():
    html = (b"<html><head><title>T</title><style>p{}</style></head>"
            b"<body><h1>Dr. Jo Xu</h1><p>a &amp; b</p>"
            b"<script>var x=1;</script></body></html>")
    assert tp.extract_text(html) == "T Dr. Jo Xu a & b"
    assert tp.extract_title(html) == "T"
    assert tp.extract_h1(html) == "Dr. Jo Xu"


def test_extract_empty_and_none():
    assert tp.extract_text(None) == ""
    assert tp.extract_text(b"") == ""
    assert tp.extract_h1(b"<html><body>no h1</body></html>") == ""


def test_extract_comments_and_case():
    html = b"<HTML><!-- hidden --><BODY><H1>Ana</H1>x</BODY></HTML>"
    assert tp.extract_text(html) == "Ana x"
    assert tp.extract_h1(html) == "Ana"


# -- normalization ----------------------------------------------------------

def test_nfkd_fold():
    assert tp.nfkd_ascii("José Müller") == "Jose Muller"


def test_strip_punct_matches_reference_semantics():
    # ref util/utils.py:129-130 deletes all string.punctuation
    assert tp.strip_punct("a.b,c;d!e?f(g)h") == "abcdefgh"


def test_tokenize_stopwords_and_punct():
    assert tp.tokenize("The quick, brown fox AND dog!") == \
        ["quick", "brown", "fox", "dog"]
    assert tp.tokenize("") == []
    assert tp.tokenize(None) == []


# -- name parsing (ref dao/pubmed_author.py:50-81) ---------------------------

@pytest.mark.parametrize("raw,expected", [
    ("John A Smith", ("john", "a", "smith")),
    ("Dr. John Smith", ("john", "", "smith")),
    ("John Smith, Ph.D", ("john", "", "smith")),
    ("Prof Maria Garcia (editor)", ("maria", "", "garcia")),
    ("José Müller", ("jose", "", "muller")),
    ("JR Smith", ("j", "r", "smith")),
    ("Smith", ("", "", "smith")),
    ("Maria de la Cruz", ("maria", "de la", "cruz")),
])
def test_parse_name(raw, expected):
    assert tp.parse_name(raw) == expected


@pytest.mark.parametrize("raw", ["", None, "...", "123 456"])
def test_parse_name_errors(raw):
    assert tp.try_parse_name(raw) is None


# -- compatibility predicate (ref dao/author.py:75-110) ----------------------

@pytest.mark.parametrize("a,b,ok", [
    (("john", "a"), ("john", "a"), True),
    (("john", "a"), ("j", "a"), True),       # initial vs full
    (("john", ""), ("john", "q"), True),     # empty matches all
    (("john", "a"), ("john", "b"), False),   # middle initial mismatch
    (("john", "a"), ("jane", "a"), False),   # full-vs-full mismatch
    (("j", ""), ("jane", ""), True),
    (("k", ""), ("jane", ""), False),
])
def test_names_compatible(a, b, ok):
    assert tp.names_compatible(a[0], a[1], b[0], b[1]) is ok


# -- similarity functions -----------------------------------------------------

def test_jaro_winkler_known_values():
    assert tp.jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-4)
    assert tp.jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133, abs=1e-3)
    assert tp.jaro_winkler("abc", "abc") == 1.0
    assert tp.jaro_winkler("", "abc") == 0.0
    assert tp.jaro_winkler("", "") == 1.0  # equal strings


def test_levenshtein():
    assert tp.levenshtein("kitten", "sitting") == 3
    assert tp.levenshtein("", "abc") == 3
    assert tp.levenshtein("abc", "abc") == 0


def test_jaccard_eps_semantics():
    # ref classifier/feature_vector.py:345-347 + :17
    assert tp.jaccard(set(), set()) == 0.0
    assert tp.jaccard({"a"}, set()) == 0.0
    assert tp.jaccard({"a", "b"}, {"b", "c"}) == pytest.approx(1 / 3)


def test_soundex_known():
    assert tp.soundex("Robert") == "R163"
    assert tp.soundex("Rupert") == "R163"
    assert tp.soundex("Tymczak") == "T522"
    assert tp.soundex("Pfister") == "P236"
    assert tp.soundex("Honeyman") == "H555"
    assert tp.soundex("") == ""


# -- parity with Spark builtins (engine may use either side) -----------------

def test_soundex_and_levenshtein_match_spark_builtins(spark):
    names = ["robert", "rupert", "tymczak", "pfister", "smith", "garcia",
             "zhang", "okafor", "muller", "walsh", "honeyman", "ashcraft"]
    df = spark.createDataFrame([(n,) for n in names], "s string")
    rows = df.select(
        "s", F.soundex("s").alias("sx"),
        F.levenshtein("s", F.lit("smith")).alias("lev")).collect()
    for r in rows:
        assert tp.soundex(r["s"]) == r["sx"], r["s"]
        assert tp.levenshtein(r["s"], "smith") == r["lev"], r["s"]


def test_host_and_doc_id():
    assert tp.host_of("https://www.Example.COM:8080/x?y#z") == "example.com"
    assert tp.host_of("https://mega.example.com/p/a-1") == "mega.example.com"
    assert tp.doc_id_of("https://a/b#dup1") == "https://a/b"
