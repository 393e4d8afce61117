"""Term-expansion queries (ES fuzzy / wildcard, operators/expand.py):
vectorized Levenshtein kernel vs a reference DP, expansion sets vs
brute force over the oracle vocabulary, and end-to-end scoring vs the
pure-python oracle on the tiny fixture index."""

import fnmatch
import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mongoesindexer_spark.operators.expand import (auto_fuzziness,
    fuzzy_expand, fuzzy_topk, levenshtein_batch, wildcard_expand,
    wildcard_match, wildcard_pattern_bounds)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.text(alphabet="abcde", max_size=8),
       st.lists(st.text(alphabet="abcdef", max_size=10), max_size=12))
@settings(max_examples=200, deadline=None)
def test_levenshtein_batch_matches_reference(q, cands):
    got = levenshtein_batch(q, cands)
    assert got.tolist() == [_lev_ref(q, c) for c in cands]


def test_auto_fuzziness():
    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1
    assert auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2


def test_wildcard_pattern_bounds():
    lo, hi = wildcard_pattern_bounds("sca*")
    assert lo == "sca" and hi.startswith("sca")
    assert wildcard_pattern_bounds("*ark")[0] == ""
    assert wildcard_pattern_bounds("s?ark")[0] == "s"


@pytest.fixture(scope="module")
def tiny_engine(spark, tiny_index):
    from mongoesindexer_spark.operators.topk import get_engine
    return get_engine(spark, tiny_index)


def test_fuzzy_expand_matches_bruteforce(tiny_engine, oracle_tiny):
    for qt, f in (("spark", 1), ("index", "AUTO"), ("the", 1)):
        got = fuzzy_expand(tiny_engine, qt, fuzziness=f, max_expansions=50)
        fi = auto_fuzziness(qt) if f == "AUTO" else f
        brute = [(t, len(ds)) for t, ds in oracle_tiny.postings.items()
                 if _lev_ref(qt, t) <= fi]
        brute.sort(key=lambda x: (_lev_ref(qt, x[0]), -x[1], x[0]))
        assert got == [t for t, _ in brute[:50]]


def test_fuzzy_expand_prefix_length(tiny_engine, oracle_tiny):
    full = fuzzy_expand(tiny_engine, "spark", 1)
    pref = fuzzy_expand(tiny_engine, "spark", 1, prefix_length=1)
    assert set(pref) == {t for t in full if t.startswith("s")}


def test_fuzzy_topk_matches_oracle(spark, tiny_index, tiny_engine,
                                   oracle_tiny):
    exp = fuzzy_expand(tiny_engine, "spark", 1)
    got = fuzzy_topk(spark, tiny_index, "spark", 10, fuzziness=1)
    # oracle: OR-BM25 over the same expansion set (own idf per term)
    cand = set()
    for t in exp:
        cand |= set(oracle_tiny.postings.get(t, {}))
    want = sorted(
        ((oracle_tiny.score(" ".join(exp), d), d) for d in cand),
        key=lambda x: (-x[0], x[1]))[:10]
    assert [int(d) for d in got["doc_id"]] == [d for _, d in want]
    for gs, (ws, _) in zip(got["score"], want):
        assert abs(gs - ws) < 1e-9


def test_wildcard_expand_and_match(spark, tiny_index, tiny_engine,
                                   oracle_tiny):
    for pat in ("s?ark", "ind*", "*tion"):
        got = wildcard_expand(tiny_engine, pat)
        rx = re.compile(fnmatch.translate(pat))
        want = sorted(t for t in oracle_tiny.postings if rx.match(t))
        assert got == want
        docs = wildcard_match(spark, tiny_index, pat)
        wdocs = sorted({d for t in want
                        for d in oracle_tiny.postings.get(t, {})})
        assert docs["doc_id"].tolist() == wdocs


def test_fuzzy_zero_distance_is_exact_term(tiny_engine):
    assert fuzzy_expand(tiny_engine, "xy", "AUTO") == []  # absent, f=0


def test_fuzzy_topk_composes_with_filter(spark, tmp_path):
    """Review fix: fuzzy plumbs filter context through to the serving
    path instead of silently ignoring it."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.expand import fuzzy_topk

    d = str(tmp_path / "idx")
    rows = [("u0", "alpha beta", "en"), ("u1", "alphb beta", "de"),
            ("u2", "alpha gamma", "en")]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    IndexBuilder(d, n_buckets=2, keyword_fields=("lang",)).build(spark, df)
    got = fuzzy_topk(spark, d, "alpha", 10, fuzziness=1,
                     filter_field="lang", filter_value="en")
    assert sorted(got["url"]) == ["u0", "u2"]
    allf = fuzzy_topk(spark, d, "alpha", 10, fuzziness=1)
    assert sorted(allf["url"]) == ["u0", "u1", "u2"]


def test_term_suggest_matches_bruteforce(spark, tiny_index, tiny_engine,
                                         oracle_tiny):
    from mongoesindexer_spark.operators.expand import term_suggest
    # a misspelling of a vocab term: take any vocab term, mutate a char
    vocab = {t: len(ds) for t, ds in oracle_tiny.postings.items()}
    base = sorted(t for t in vocab if len(t) >= 4)[0]
    misspelled = "x" + base[1:]
    assert misspelled not in vocab
    got = term_suggest(spark, tiny_index, misspelled, size=4,
                       prefix_length=0)
    brute = [(t, _lev_ref(misspelled, t), df)
             for t, df in vocab.items()
             if t != misspelled and _lev_ref(misspelled, t) <= 2]
    brute.sort(key=lambda x: (x[1], -x[2], x[0]))
    assert [tuple(r) for r in got[["suggestion", "dist", "df"]]
            .itertuples(index=False)] == brute[:4]
    assert (got["input_term"] == misspelled).all()


def test_term_suggest_modes(spark, tiny_index, tiny_engine, oracle_tiny):
    from mongoesindexer_spark.operators.expand import term_suggest
    present = sorted(oracle_tiny.postings)[0]
    # missing (default): a term already in the index gets no suggestions
    assert term_suggest(spark, tiny_index, present).empty
    # always: suggestions even for present terms, never itself
    alw = term_suggest(spark, tiny_index, present, suggest_mode="always",
                       prefix_length=0)
    assert (alw["suggestion"] != present).all()
    import pytest as _pt
    for kwargs in ({"suggest_mode": "phrase"}, {"max_edits": 3},
                   {"size": 0}):
        with _pt.raises(ValueError):
            term_suggest(spark, tiny_index, present, **kwargs)


def test_regexp_expand_and_match(spark, tiny_index, tiny_engine,
                                 oracle_tiny):
    from mongoesindexer_spark.operators.expand import (regexp_expand,
                                                       regexp_match)
    vocab = set(oracle_tiny.postings)
    pat = "th.*|.park"
    want_terms = sorted(t for t in vocab if re.fullmatch(pat, t))
    assert regexp_expand(tiny_engine, pat) == want_terms
    got = regexp_match(spark, tiny_index, pat)
    want_docs = sorted({d for t in want_terms
                        for d in oracle_tiny.postings[t]})
    assert [int(x) for x in got["doc_id"]] == want_docs
    # anchored full-match: a mid-string hit is NOT a match
    assert "the" not in regexp_expand(tiny_engine, "h")


def test_regexp_prefix_prune_soundness(tiny_engine, oracle_tiny):
    """Pruning must never drop matches: top-level alternation and a
    quantifier on the literal run both invalidate the naive prefix."""
    from mongoesindexer_spark.operators.expand import regexp_expand
    vocab = set(oracle_tiny.postings)
    for pat in ("th.*|.park", "sp?ark", "spar{0,1}k", "s(p|t)ark"):
        want = sorted(t for t in vocab if re.fullmatch(pat, t))
        assert regexp_expand(tiny_engine, pat) == want, pat


def test_regexp_prune_escapes_and_classes(tiny_engine, oracle_tiny):
    """Escaped parens and parens inside character classes must not mask
    a top-level '|' — the prune would keep a branch-local prefix and
    silently drop the other branch's matches."""
    from mongoesindexer_spark.operators.expand import regexp_expand
    vocab = set(oracle_tiny.postings)
    some = sorted(vocab)[0]          # a real vocab term for the branch
    for pat in (rf"foo\(x|{some}", rf"x[(ab]y|{some}",
                rf"a[^)]z|{some}", rf"q[\](]r|{some}"):
        want = sorted(t for t in vocab if re.fullmatch(pat, t))
        assert some in want          # the dropped-branch term exists
        assert regexp_expand(tiny_engine, pat) == want, pat
