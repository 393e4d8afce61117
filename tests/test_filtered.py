"""ES bool-query filter context (``bool: {must: match, filter: term}``,
the canonical ES query shape; the reference's own resume-token lookup is
a bool.filter of term clauses, load.service.ts:151-166).

Contract under test: filtered top-k == the unfiltered ranking restricted
to filter-matching docs, truncated to k — identical through every
serving path (WAND / exhaustive / segment fan-out / DataFrame), under
normalized sub-fields, terms lists, AND mode, search_after paging, and
merge-on-read deltas.
"""

import os
import shutil

import pandas as pd
import pytest

# terms drawn from the tiny fixture's actual vocabulary (its text
# is synthetic) — a vacuous query would make every assertion pass
QUERIES = ["lda", "fiut atreq", "kni zfaj", "qalnbe vlnxwx pwf"]
K = 10


@pytest.fixture(scope="module")
def kw_index(spark, tiny_dir, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    d = str(tmp_path_factory.mktemp("idx-flt"))
    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    IndexBuilder(d, n_buckets=8, block_size=32,
                 keyword_fields=("lang",)).build(spark, pages)
    return d


def _engine(spark, idx):
    from mongoesindexer_spark.operators.topk import get_engine

    return get_engine(spark, idx)


def _pairs(pdf) -> list:
    return sorted(zip(pdf["score"].round(6), pdf["url"]))


def _expected(eng, q, k, match_urls):
    """Unfiltered ranking over the whole corpus, restricted to the
    matching urls, truncated — the semantic definition of filter
    context (scores are pinned against the independent oracle by
    test_queries/test_incremental; this pins the restriction)."""
    base = eng.topk_wand(q, 500)
    keep = base[base["url"].isin(match_urls)].head(k)
    return _pairs(keep)


def _all_paths(eng, spark, q, k, **flt):
    w = eng.topk_wand(q, k, **flt)
    e = eng.topk_wand(q, k, use_wand=False, **flt)
    s = eng.topk_wand(q, k, use_segments=True, **flt)
    d = eng.topk_df(q, k, **flt).toPandas()
    return w, e, s, d


def test_filtered_paths_agree_and_match_contract(spark, kw_index, tiny_pages):
    eng = _engine(spark, kw_index)
    for q in QUERIES:
        for lang in ("en", "fr"):
            urls = set(tiny_pages.loc[tiny_pages["lang"] == lang, "url"])
            want = _expected(eng, q, K, urls)
            assert want, (q, lang)   # vacuous query ⇒ broken test setup
            for got in _all_paths(eng, spark, q, K,
                                  filter_field="lang", filter_value=lang):
                assert _pairs(got) == want, (q, lang)
                assert set(got["url"]) <= urls


def test_filtered_terms_list_is_union(spark, kw_index, tiny_pages):
    """ES ``terms`` filter: docs matching ANY of the values."""
    eng = _engine(spark, kw_index)
    urls = set(tiny_pages.loc[tiny_pages["lang"].isin(["en", "fr"]), "url"])
    want = _expected(eng, "lda", K, urls)
    for got in _all_paths(eng, spark, "lda", K,
                          filter_field="lang", filter_value=["en", "fr"]):
        assert _pairs(got) == want


def test_filtered_normalized_folds_query_value(spark, kw_index, tiny_pages):
    """normalized sub-field: the query value folds through the same
    keyword→lowercase→asciifolding analyzer as the indexed value, so
    'EN' matches docs whose lang is 'en'."""
    eng = _engine(spark, kw_index)
    urls = set(tiny_pages.loc[tiny_pages["lang"] == "en", "url"])
    want = _expected(eng, "lda", K, urls)
    for got in _all_paths(eng, spark, "lda", K, filter_field="lang",
                          filter_value="EN", filter_normalized=True):
        assert _pairs(got) == want


def test_filtered_and_mode(spark, kw_index, tiny_pages):
    """filter context composes with conjunctive must (bool: filter +
    AND of term queries)."""
    eng = _engine(spark, kw_index)
    urls = set(tiny_pages.loc[tiny_pages["lang"] == "en", "url"])
    base = eng.topk_wand("fiut atreq", 500, mode="and")
    want = _pairs(base[base["url"].isin(urls)].head(K))
    for got in _all_paths(eng, spark, "fiut atreq", K, mode="and",
                          filter_field="lang", filter_value="en"):
        assert _pairs(got) == want
        assert set(got["url"]) <= urls


def test_filtered_search_after_pages(spark, kw_index, tiny_pages):
    """deep paging composes with the filter: successive filtered pages
    reconstruct the filtered ranking with no gap or overlap."""
    eng = _engine(spark, kw_index)
    urls = set(tiny_pages.loc[tiny_pages["lang"] == "en", "url"])
    full = eng.topk_wand("lda", 2 * K, filter_field="lang",
                         filter_value="en")
    p1 = eng.topk_wand("lda", K, filter_field="lang", filter_value="en")
    assert len(p1) == K   # the page must be full for the cursor to mean page 2
    cur = (float(p1.iloc[-1]["score"]), int(p1.iloc[-1]["doc_id"]))
    p2 = eng.topk_wand("lda", K, filter_field="lang", filter_value="en",
                       search_after=cur)
    got = pd.concat([p1, p2], ignore_index=True)
    assert got["doc_id"].tolist() == full["doc_id"].tolist()
    assert set(got["url"]) <= urls


def test_filtered_no_match_returns_empty(spark, kw_index):
    eng = _engine(spark, kw_index)
    for got in _all_paths(eng, spark, "lda", K,
                          filter_field="lang", filter_value="zz"):
        assert len(got) == 0
        assert list(got.columns)[:1] == ["doc_id"]


def test_filter_unknown_subfield_is_loud(spark, kw_index, tiny_index):
    eng = _engine(spark, kw_index)
    with pytest.raises(KeyError, match="url_keyword"):
        eng.topk_wand("lda", K, filter_field="url", filter_value="x")
    # index built without keyword_fields: no fields table at all
    eng0 = _engine(spark, tiny_index)
    with pytest.raises(KeyError, match="fields"):
        eng0.topk_wand("lda", K, filter_field="lang", filter_value="en")


def test_filtered_after_incremental_sync(spark, kw_index, tiny_dir,
                                         tiny_pages, tmp_path_factory):
    """merge-on-read: after a delta batch (inserts + updates changing
    lang + deletes), the filtered ranking matches the contract on the
    UPDATED corpus through both the driver kernel and the fan-out path —
    delta fields generations and tombstones must all be honored."""
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path_factory.mktemp("idx-flt-inc")) + "/idx"
    shutil.copytree(kw_index, d)
    upd = spark.read.parquet(os.path.join(tiny_dir, "pages_updates.parquet"))
    res = IncrementalIndexer(d).apply_updates(spark, upd, batch_id="b1")
    assert res["applied"]

    updf = pd.read_parquet(os.path.join(tiny_dir, "pages_updates.parquet"))
    pages = tiny_pages.set_index("url")
    for r in updf.itertuples():
        if r.op == "delete":
            pages = pages.drop(r.url)
        else:
            pages.loc[r.url] = {"warc_ts": r.warc_ts, "html": r.html,
                                "text": r.text, "lang": r.lang}
    pages = pages.reset_index()

    eng = _engine(spark, d)
    for lang in ("en", "fr"):
        urls = set(pages.loc[pages["lang"] == lang, "url"])
        want = _expected(eng, "lda", K, urls)
        for got in _all_paths(eng, spark, "lda", K,
                              filter_field="lang", filter_value=lang):
            assert _pairs(got) == want, lang
            assert set(got["url"]) <= urls


def test_must_not_after_incremental_sync(spark, kw_index, tiny_dir,
                                         tiny_pages, tmp_path_factory):
    """merge-on-read: bool.must_not honors delta fields generations and
    tombstones — updated docs that ENTER the excluded value disappear,
    deleted docs never resurface through the complement, and docs whose
    update LEAVES the excluded value come back."""
    from mongoesindexer_spark.operators.topk import MustNotClause
    from mongoesindexer_spark.streaming.incremental import \
        IncrementalIndexer

    d = str(tmp_path_factory.mktemp("idx-mn-inc")) + "/idx"
    shutil.copytree(kw_index, d)
    upd = spark.read.parquet(os.path.join(tiny_dir,
                                          "pages_updates.parquet"))
    res = IncrementalIndexer(d).apply_updates(spark, upd, batch_id="b1")
    assert res["applied"]

    updf = pd.read_parquet(os.path.join(tiny_dir,
                                        "pages_updates.parquet"))
    pages = tiny_pages.set_index("url")
    for r in updf.itertuples():
        if r.op == "delete":
            pages = pages.drop(r.url)
        else:
            pages.loc[r.url] = {"warc_ts": r.warc_ts, "html": r.html,
                                "text": r.text, "lang": r.lang}
    pages = pages.reset_index()

    eng = _engine(spark, d)
    for lang in ("en", "fr"):
        keep_urls = set(pages.loc[pages["lang"] != lang, "url"])
        want = _expected(eng, "lda", K, keep_urls)
        for got in _all_paths(eng, spark, "lda", K, filter_field="lang",
                              filter_value=MustNotClause(lang)):
            assert _pairs(got) == want, lang
            assert set(got["url"]) <= keep_urls
    # conjunction of a positive filter and a must_not on the updated
    # corpus (the filters-list path under merge-on-read)
    keep = set(pages.loc[(pages["lang"] != "en")
                         & (pages["lang"] != "fr"), "url"])
    want = _expected(eng, "lda", K, keep)
    got = eng.topk_wand("lda", K,
                        filters=[("lang", MustNotClause("en")),
                                 ("lang", MustNotClause("fr"))])
    assert _pairs(got) == want
