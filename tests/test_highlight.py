"""ES highlight (operators/highlight.py): fragment window clamping,
first-occurrence selection, multi-term markup, and the NULL-on-no-match
contract — against hand-computed expectations."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three beta five six seven eight nine ten eleven"),
        (3, "no matches here at all"),
        (4, "beta starts this one and beta repeats beta often"),
        (5, "tail match comes very late in this long string beta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _frags(docs, ids, terms, window=2):
    from mongoesindexer_spark.operators.highlight import highlight_hits
    pdf = highlight_hits(docs, ids, terms, window=window).toPandas()
    return dict(zip(pdf["doc_id"], pdf["fragment"]))


def test_fragment_window_and_markup(docs):
    got = _frags(docs, [1, 2], ["gamma", "beta"], window=2)
    # doc 1: first match "beta" at pos 2 → window [1..6]... first match is
    # beta (pos 2) not gamma (pos 3); start=max(1,2-2)=1, 5 tokens
    assert got[1] == "alpha <em>beta</em> <em>gamma</em> delta epsilon"
    assert got[2] == "two three <em>beta</em> five six"


def test_no_match_is_null(docs):
    got = _frags(docs, [3], ["beta"], window=2)
    assert got[3] is None


def test_start_clamp_and_all_occurrences_marked(docs):
    got = _frags(docs, [4], ["beta"], window=3)
    # first beta at pos 1 → start clamped to 1, 7 tokens, all betas marked
    assert got[4] == ("<em>beta</em> starts this one and <em>beta</em> "
                      "repeats")


def test_end_clamp(docs):
    got = _frags(docs, [5], ["beta"], window=3)
    # match at the last token → window truncated at the end
    assert got[5] == "this long string <em>beta</em>"


def test_case_insensitive(spark):
    from mongoesindexer_spark.operators.highlight import highlight_hits
    d = spark.createDataFrame([(9, "Alpha BETA gamma")],
                              "doc_id long, text string")
    pdf = highlight_hits(d, [9], ["beta"], window=1).toPandas()
    assert pdf["fragment"][0] == "alpha <em>beta</em> gamma"
