"""ES range-filter context (RangeClause over numeric_fields sub-fields):
all three serving paths agree with a pandas brute force; sync keeps the
numeric doc values fresh; loud error without the sub-field."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def num_index(spark, tiny_dir, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-range"))
    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    from pyspark.sql import functions as F
    pages = pages.withColumn(
        "n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))))
    IndexBuilder(d, n_buckets=4, block_size=32,
                 keyword_fields=("lang",),
                 numeric_fields=("n_chars",)).build(spark, pages)
    return d


def _brute(oracle, tiny_pages, query, lo, hi, k):
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    nchars = rows["text"].map(lambda t: len(t) if isinstance(t, str) else 0)
    hits = []
    from mongoesindexer_spark.functions.analysis import analyze_search
    terms = sorted(set(analyze_search(query, oracle.cfg)))
    cand = set()
    for t in terms:
        cand |= set(oracle.postings.get(t, {}))
    for d in cand:
        if lo <= nchars.iloc[d] <= hi:
            hits.append((oracle.score(query, d), d))
    hits.sort(key=lambda x: (-x[0], x[1]))
    return hits[:k]


def test_range_filter_paths_agree_and_match_bruteforce(
        spark, num_index, tiny_pages, oracle_tiny):
    from mongoesindexer_spark.operators.topk import RangeClause, get_engine
    eng = get_engine(spark, num_index)
    q = "udrndau atreq"
    lo, hi = 60, 220
    want = _brute(oracle_tiny, tiny_pages, q, lo, hi, 10)
    # doc_ids in the brute force are text-resolved docs only where text
    # is non-null; html-resolved docs have n_chars(text)=0 in the pages
    # column, matching the builder's fields_subfields cast of the SAME
    # column — both sides use the pages n_chars column
    kern = eng.topk_wand(q, 10, filter_field="n_chars",
                         filter_value=RangeClause(lo, hi))
    seg = eng.topk_wand(q, 10, filter_field="n_chars",
                        filter_value=RangeClause(lo, hi), use_segments=True)
    df = eng.topk_df(q, 10, filter_field="n_chars",
                     filter_value=RangeClause(lo, hi)).toPandas()
    for got in (kern, seg, df):
        assert [int(d) for d in got["doc_id"]] == [d for _, d in want]
    for gs, (ws, _) in zip(kern["score"], want):
        assert abs(gs - ws) < 1e-9


def test_range_filter_missing_subfield_raises(spark, num_index):
    from mongoesindexer_spark.operators.topk import RangeClause, get_engine
    eng = get_engine(spark, num_index)
    with pytest.raises(KeyError, match="warc_ts_num"):
        eng.topk_wand("udrndau", 5, filter_field="warc_ts",
                      filter_value=RangeClause(0, 10))


def test_range_filter_survives_sync(spark, tmp_path):
    from pyspark.sql import functions as F

    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import RangeClause, get_engine
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path / "idx")
    import datetime as _dt
    t0 = _dt.datetime(2025, 1, 1)
    base = spark.createDataFrame(
        [(f"u{i}", t0, None, f"common tok{i}", "en", 10 * i)
         for i in range(8)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, nval long")
    IndexBuilder(d, n_buckets=2, numeric_fields=("nval",)).build(spark, base)
    t1 = _dt.datetime(2025, 2, 1)
    upd = spark.createDataFrame(
        [("insert", "u8", t1, None, "common fresh", "en", 85),
         ("update", "u0", t1, None, "common changed", "en", 5)],
        "op string, url string, warc_ts timestamp, html binary, "
        "text string, lang string, nval long")
    IncrementalIndexer(d).apply_updates(spark, upd, batch_id="b1")
    eng = get_engine(spark, d)
    got = eng.topk_wand("common", 20, filter_field="nval",
                        filter_value=RangeClause(5, 40))
    # u0 re-ranked with nval=5 (in range), u1..u4 in range (10..40),
    # u8 (85) and u5..u7 (50..70) out
    urls = sorted(got["url"])
    assert urls == ["u0", "u1", "u2", "u3", "u4"]
