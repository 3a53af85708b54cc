"""Hypothesis property tests for the shared pure-Python kernels.

These guard the invariants the distributed engine SILENTLY depends on:
determinism and total-function behavior over arbitrary unicode (a web
corpus sends everything), metric properties of the similarities, and
stability of the normalization chain. The kernels run verbatim on both
the oracle and the Arrow workers, so a property violation here is a
cross-engine divergence waiting to happen.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from webr.textproc import (
    jaccard, jaro, jaro_winkler, levenshtein, minhash_band_keys,
    names_compatible, nfkd_ascii, norm_text, soundex, strip_punct,
    tokenize, try_parse_name,
)

TEXT = st.text(max_size=60)
ASCII_WORD = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    max_size=12)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_normalization_idempotent_and_ascii(s):
    out = nfkd_ascii(s)
    assert nfkd_ascii(out) == out          # idempotent
    assert all(ord(c) < 128 for c in out)  # pure ASCII
    n = norm_text(s)
    assert norm_text(n) == n


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_tokenize_total_and_stable(s):
    toks = tokenize(s)
    assert toks == tokenize(s)                   # deterministic
    assert all(t == t.lower() and t for t in toks)
    assert tokenize(" ".join(toks)) == [t for t in toks]  # fixpoint-ish
    strip_punct(s)  # never raises


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT)
def test_jaro_winkler_metric_properties(a, b):
    j = jaro_winkler(a, b)
    assert 0.0 <= j <= 1.0
    assert jaro_winkler(b, a) == j           # symmetric
    assert jaro_winkler(a, a) == (1.0 if a else jaro(a, a))
    assert jaro(a, b) <= j + 1e-15           # winkler only boosts


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT)
def test_levenshtein_metric(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d >= abs(len(a) - len(b))
    assert d <= max(len(a), len(b))
    assert levenshtein(a, a) == 0


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT, TEXT)
def test_levenshtein_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@settings(max_examples=200, deadline=None)
@given(st.sets(ASCII_WORD, max_size=12), st.sets(ASCII_WORD, max_size=12))
def test_jaccard_bounds_and_symmetry(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert jaccard(b, a) == j
    if a:
        assert jaccard(a, a) > 0.999


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_soundex_total_and_shaped(s):
    code = soundex(s)
    assert code == soundex(s)
    if code:
        assert len(code) == 4
        assert code[0].isalpha() and code[0].isupper()
        assert all(c.isdigit() for c in code[1:])


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_parse_name_never_crashes(s):
    r = try_parse_name(s)  # garbage in -> None or a 3-tuple, never a raise
    if r is not None:
        f, m, last = r
        assert last  # a parsed name always has a last name


@settings(max_examples=300, deadline=None)
@given(ASCII_WORD, ASCII_WORD, ASCII_WORD, ASCII_WORD)
def test_names_compatible_symmetric_reflexive(fa, ma, fb, mb):
    assert (names_compatible(fa, ma, fb, mb)
            == names_compatible(fb, mb, fa, ma))
    assert names_compatible(fa, ma, fa, ma)


@settings(max_examples=100, deadline=None)
@given(st.lists(ASCII_WORD.filter(bool), min_size=1, max_size=30))
def test_minhash_band_keys_deterministic_and_shaped(tokens):
    """Shingle MinHash is order-SENSITIVE by design (it fingerprints
    sequences, not bags) — the invariants are determinism, band count,
    and key shape."""
    k1 = minhash_band_keys(tokens)
    assert k1 == minhash_band_keys(list(tokens))     # deterministic
    assert len(k1) == 4                              # one key per band
    for band, key in enumerate(k1):
        head, _, sig = key.partition(":")
        assert head == f"b{band}"
        assert all(len(p) == 16 for p in sig.split("|"))  # 2 hex rows
    # identical docs always collide in every band (dedup recall floor)
    assert minhash_band_keys(list(tokens)) == k1


# --- cannot-link constrained components (webr/constraints.py) ----------------

_NAME = st.tuples(ASCII_WORD, ASCII_WORD)
_GRAPH = st.integers(min_value=2, max_value=12).flatmap(
    lambda n: st.tuples(
        st.lists(_NAME, min_size=n, max_size=n),
        st.lists(st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                 max_size=24)))


@settings(max_examples=200, deadline=None)
@given(_GRAPH)
def test_constrained_components_invariants(g):
    from webr.constraints import constrained_components
    from webr.textproc import names_compatible
    names_list, raw_edges = g
    urls = [f"u{i:02d}" for i in range(len(names_list))]
    names = dict(zip(urls, names_list))
    edges = [(urls[a], urls[b]) for a, b in raw_edges if a != b]
    rep = constrained_components(names, edges)
    # total: every url labeled; rep is a member and the cluster min
    assert set(rep) == set(urls)
    for u, r in rep.items():
        assert r in rep and rep[r] == r
        assert r <= u
    # THE invariant: every final cluster is all-pairs name-compatible
    by_rep: dict = {}
    for u, r in rep.items():
        by_rep.setdefault(r, []).append(u)
    for members in by_rep.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                fa, ma = names[a]
                fb, mb = names[b]
                assert names_compatible(fa, ma, fb, mb)
    # determinism under edge-list permutation (kernel sorts internally)
    rep2 = constrained_components(names, list(reversed(edges)))
    assert rep2 == rep
    # never MORE merged than unconstrained CC: clusters refine components
    parent = {u: u for u in urls}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for u in urls:
        for v in urls:
            if rep[u] == rep[v]:
                assert find(u) == find(v)


# sorted unique int64 id array + matching positive weights, as produced
# by weight_arrays
_IDS = st.lists(st.integers(min_value=0, max_value=1 << 59),
                max_size=40, unique=True).map(sorted)


@settings(max_examples=300, deadline=None)
@given(_IDS, _IDS, st.randoms(use_true_random=False))
def test_sparse_cosine_probe_side_invariant(t1, t2, rnd):
    """The kernel probes the SMALLER array into the larger (perf); the
    result must be bitwise-identical both to the side-swapped call and
    to a straight dict-intersection np.sum reference — i.e. the
    optimization never perturbs a single ULP."""
    import numpy as np

    from webr.features import sparse_cosine_sorted

    v1 = [rnd.uniform(0.1, 5.0) for _ in t1]
    v2 = [rnd.uniform(0.1, 5.0) for _ in t2]
    a1, a2 = np.asarray(t1, np.int64), np.asarray(t2, np.int64)
    w1, w2 = np.asarray(v1, np.float64), np.asarray(v2, np.float64)
    n1 = float(np.sqrt(np.sum(w1 * w1))) if len(w1) else 0.0
    n2 = float(np.sqrt(np.sum(w2 * w2))) if len(w2) else 0.0

    got = sparse_cosine_sorted(a1, w1, n1, a2, w2, n2)
    swapped = sparse_cosine_sorted(a2, w2, n2, a1, w1, n1)
    assert got == swapped  # bitwise, not approx

    if n1 == 0.0 or n2 == 0.0:
        assert got == 0.0
        return
    m2 = dict(zip(t2, v2))
    acc = 0.0
    for t, v in zip(t1, v1):  # ascending ids, sequential fold (spec v9)
        if t in m2:
            acc += v * m2[t]
    ref = acc / (n1 * n2)
    assert got == ref  # same ascending-id order, same sequential fold
