"""ES prefix / lexicographic-range queries on keyword sub-fields
(SearchEngine.keyword_prefix / keyword_range): value-sorted sidecar
range reads with the keyword_term page contract."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def kr_index(spark, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-kwrange"))
    cats = ["alpha", "alphabet", "beta", "betamax", "Gamma", "delta",
            "alpine", None]
    rows = [(f"u{i:02d}", f"common w{i}", cats[i % len(cats)])
            for i in range(24)]
    df = spark.createDataFrame(rows,
                               "url string, text string, cat string")
    IndexBuilder(d, n_buckets=2, block_size=8,
                 keyword_fields=("cat",)).build(spark, df)
    return d, rows


def _want(rows, pred):
    return sorted(i for i, r in enumerate(rows)
                  if r[2] is not None and pred(r[2]))


def test_keyword_prefix(spark, kr_index):
    from mongoesindexer_spark.operators.topk import get_engine
    d, rows = kr_index
    eng = get_engine(spark, d)
    got = eng.keyword_prefix("cat", "alp", size=100)
    assert [int(x) for x in got["doc_id"]] \
        == _want(rows, lambda v: v.startswith("alp"))
    # normalized: folds the query prefix AND matches the folded values
    gn = eng.keyword_prefix("cat", "GAM", normalized=True, size=100)
    assert [int(x) for x in gn["doc_id"]] \
        == _want(rows, lambda v: v.lower().startswith("gam"))
    with pytest.raises(ValueError):
        eng.keyword_prefix("cat", "")
    with pytest.raises(KeyError):
        eng.keyword_prefix("nosuch", "a")


def test_keyword_range(spark, kr_index):
    from mongoesindexer_spark.operators.topk import get_engine
    d, rows = kr_index
    eng = get_engine(spark, d)
    # inclusive both ends, lexicographic
    got = eng.keyword_range("cat", gte="alpha", lte="beta", size=100)
    assert [int(x) for x in got["doc_id"]] \
        == _want(rows, lambda v: "alpha" <= v <= "beta")
    # value exactly equal to lte is included (successor-bound trick)
    assert any(rows[int(x)][2] == "beta" for x in got["doc_id"])
    # open ends
    lo = eng.keyword_range("cat", gte="delta", size=100)
    assert [int(x) for x in lo["doc_id"]] \
        == _want(rows, lambda v: v >= "delta")
    hi = eng.keyword_range("cat", lte="alpine", size=100)
    assert [int(x) for x in hi["doc_id"]] \
        == _want(rows, lambda v: v <= "alpine")


def test_keyword_range_paging_and_sync(spark, kr_index, tmp_path):
    from mongoesindexer_spark.operators.topk import get_engine
    d, rows = kr_index
    eng = get_engine(spark, d)
    want = _want(rows, lambda v: v.startswith("alp"))
    assert len(want) >= 4
    # after_doc_id paging walks the match set in doc_id order
    got, cursor = [], None
    while True:
        page = eng.keyword_prefix("cat", "alp", size=2,
                                  after_doc_id=cursor)
        if page.empty:
            break
        got.extend(int(x) for x in page["doc_id"])
        cursor = int(page["doc_id"].iloc[-1])
    assert got == want


def test_keyword_window_budget_guard(spark, kr_index, monkeypatch):
    """A value window overlapping more sidecar rows than
    max_result_window refuses the point-read path and names the
    analytics alternative."""
    import mongoesindexer_spark.operators.topk as tk
    from mongoesindexer_spark.operators.topk import get_engine
    d, _ = kr_index
    eng = get_engine(spark, d)
    monkeypatch.setattr(tk, "MAX_RESULT_WINDOW", 1)
    with pytest.raises(ValueError, match="keyword_match"):
        eng.keyword_prefix("cat", "a", size=1)
    with pytest.raises(ValueError, match="keyword_match"):
        eng.keyword_range("cat", gte="a", size=1)
