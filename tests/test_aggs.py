"""Search aggregations (ES query+aggs, operators/aggs.py): terms agg and
stats agg over the FULL hit set, vs pandas brute force on the tiny
fixture (keyword sub-field index)."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def agg_index(spark, tiny_dir, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-aggs"))
    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    IndexBuilder(d, n_buckets=8, block_size=32,
                 keyword_fields=("lang",)).build(spark, pages)
    return d


def _hit_set(oracle, query, mode="or", msm=None):
    from mongoesindexer_spark.functions.analysis import analyze_search
    terms = sorted(set(analyze_search(query, oracle.cfg)))
    counts = {}
    for t in terms:
        for d in oracle.postings.get(t, {}):
            counts[d] = counts.get(d, 0) + 1
    if mode == "and":
        return {d for d, c in counts.items() if c == len(terms)}
    if msm is not None:
        return {d for d, c in counts.items() if c >= msm}
    return set(counts)


def test_terms_agg_matches_bruteforce(spark, agg_index, tiny_pages,
                                      oracle_tiny):
    from mongoesindexer_spark.operators.aggs import search_terms_agg
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, agg_index)
    q = "udrndau atreq"
    got = search_terms_agg(eng, q, "lang", size=5).toPandas()

    hits = _hit_set(oracle_tiny, q)
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    langs = rows["lang"]
    vc = {}
    for d in hits:
        v = langs.iloc[d]
        if v is not None and not pd.isna(v):
            vc[v] = vc.get(v, 0) + 1
    want = sorted(vc.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert list(zip(got["value"], got["doc_count"])) == want


def test_terms_agg_modes(spark, agg_index, tiny_pages, oracle_tiny):
    from mongoesindexer_spark.operators.aggs import match_set
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, agg_index)
    q = "udrndau atreq kni"
    for mode, msm in (("and", None), ("or", 2)):
        got = {r["doc_id"] for r in
               match_set(eng, q, mode=mode,
                         min_should_match=msm).collect()}
        assert got == _hit_set(oracle_tiny, q, mode=mode, msm=msm)


def test_stats_agg_matches_bruteforce(spark, agg_index, tiny_pages,
                                      oracle_tiny):
    from mongoesindexer_spark.operators.aggs import search_stats_agg
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, agg_index)
    q = "udrndau atreq"
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "n_chars": rows["text"].map(
            lambda t: len(t) if isinstance(t, str) else 0).astype("int64"),
    }))
    got = search_stats_agg(eng, docs, q, "n_chars").toPandas().iloc[0]
    hits = sorted(_hit_set(oracle_tiny, q))
    vals = [len(rows["text"].iloc[d]) if isinstance(rows["text"].iloc[d], str)
            else 0 for d in hits]
    assert int(got["count"]) == len(vals)
    assert int(got["min"]) == min(vals) and int(got["max"]) == max(vals)
    assert int(got["sum"]) == sum(vals)
    assert abs(float(got["avg"]) - sum(vals) / len(vals)) < 1e-9


def test_histogram_agg_matches_bruteforce(spark, agg_index, tiny_pages,
                                          oracle_tiny):
    from mongoesindexer_spark.operators.aggs import search_histogram_agg
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, agg_index)
    q = "udrndau atreq"
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "n_chars": rows["text"].map(
            lambda t: len(t) if isinstance(t, str) else 0).astype("int64"),
    }))
    got = search_histogram_agg(eng, docs, q, "n_chars", 50).toPandas()
    hits = _hit_set(oracle_tiny, q)
    vc = {}
    for d in hits:
        t = rows["text"].iloc[d]
        b = (len(t) if isinstance(t, str) else 0) // 50 * 50
        vc[b] = vc.get(b, 0) + 1
    want = sorted(vc.items())
    assert list(zip(got["bucket"], got["doc_count"])) == want
    import pytest as _pt
    with _pt.raises(ValueError):
        search_histogram_agg(eng, docs, q, "n_chars", 0)


def test_sort_by_field_matches_bruteforce(spark, agg_index, tiny_pages,
                                          oracle_tiny):
    from mongoesindexer_spark.operators.aggs import search_sort_by_field
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, agg_index)
    q = "udrndau atreq"
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    nchars = rows["text"].map(
        lambda t: len(t) if isinstance(t, str) else 0).astype("int64")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "n_chars": nchars,
    }))
    hits = _hit_set(oracle_tiny, q)
    for asc in (True, False):
        got = search_sort_by_field(eng, docs, q, "n_chars", 7,
                                   ascending=asc).toPandas()
        want = sorted(((int(nchars.iloc[d]), d) for d in hits),
                      key=lambda x: (x[0] if asc else -x[0], x[1]))[:7]
        assert list(zip(got["n_chars"], got["doc_id"])) == want


def test_match_set_rejects_msm_with_and(spark, agg_index):
    from mongoesindexer_spark.operators.aggs import match_set
    from mongoesindexer_spark.operators.topk import get_engine
    with pytest.raises(ValueError):
        match_set(get_engine(spark, agg_index), "udrndau atreq",
                  mode="and", min_should_match=2)
