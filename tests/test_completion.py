"""Completion suggester (T7) + multi-field materialization (T8/T5)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_completion_table_matches_term_dict(spark, tiny_index):
    """completion(prefix, term, weight) must cover exactly the terms with
    that prefix, weighted by df."""
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    cat = ParquetCatalog(tiny_index)
    td = {r["term"]: r["df"] for r in cat.read(spark, "term_dict").collect()}
    comp = cat.read(spark, "completion").filter(F.col("prefix") == "th")
    got = {r["term"]: r["weight"] for r in comp.collect()}
    want = {t: df for t, df in td.items() if t.startswith("th")}
    assert got == want and len(want) > 0


def test_suggest_ordering_and_fallback(spark, tiny_index):
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, tiny_index)
    out = eng.suggest("t", k=5)
    assert len(out) == 5
    ws = out["weight"].tolist()
    assert ws == sorted(ws, reverse=True)
    assert all(t.startswith("t") for t in out["term"])
    # a prefix longer than MAX_PREFIX_LEN exercises the term_dict range
    # fallback; the two paths must agree where they overlap
    from mongoesindexer_spark.operators.build_index import MAX_PREFIX_LEN
    long_pref = "t" * (MAX_PREFIX_LEN + 2)
    fb = eng.suggest(long_pref, k=5)
    assert list(fb.columns) == ["term", "weight"]


def test_suggest_after_incremental_sync(spark, tiny_index, tmp_path):
    """Sync introduces a new vocab term; suggest must surface it."""
    import shutil

    import pandas as pd
    from mongoesindexer_spark.operators.topk import get_engine
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    idx = str(tmp_path / "idx")
    shutil.copytree(tiny_index, idx)
    pd.DataFrame({
        "op": ["insert"], "url": ["zq-upd-1"],
        "warc_ts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
        "html": [None], "text": ["zqwertyish zqwertyish zqwertyish"],
        "lang": ["en"],
    }).to_parquet(str(tmp_path / "upd.parquet"))
    IncrementalIndexer(idx).apply_updates(
        spark, spark.read.parquet(str(tmp_path / "upd.parquet")))
    out = get_engine(spark, idx).suggest("zqwert", k=3)
    assert "zqwertyish" in set(out["term"])


def test_keyword_fields_materialization(spark, tmp_path):
    """keyword_fields columns get _keyword (raw) and _normalized
    (lowercase + asciifold) sub-fields keyed by assigned doc_id."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    pages = spark.createDataFrame([
        Row(url="a", text="alpha beta", title="Éclair STUDY"),
        Row(url="b", text="beta gamma", title="café naïve"),
        Row(url="c", text="gamma delta", title=None),
    ])
    idx = str(tmp_path / "idx")
    builder = IndexBuilder(idx, n_buckets=2, keyword_fields=("title",))
    builder.build(spark, pages)
    rows = {r["doc_id"]: r for r in
            ParquetCatalog(idx).read(spark, "fields").collect()}
    assert len(rows) == 3
    assert rows[0]["title_keyword"] == "Éclair STUDY"
    assert rows[0]["title_normalized"] == "eclair study"
    assert rows[1]["title_normalized"] == "cafe naive"
    assert rows[2]["title_normalized"] is None
    # normalized keys sort accent-insensitively (the ES 'normalize' use)
    fields = ParquetCatalog(idx).read(spark, "fields")
    ordered = [r["doc_id"] for r in
               fields.orderBy("title_normalized").collect() if r["title_normalized"]]
    assert ordered == [1, 0]  # cafe < eclair


def test_fields_follow_incremental_sync(spark, tmp_path):
    """Incremental sync must keep the sub-field table fresh: new docs get
    rows (same kernel as the build), retired docs are masked by
    read_fields' tombstone anti-join, and compaction removes them
    physically (regression: fields went permanently stale after any
    sync)."""
    import datetime as dt

    from mongoesindexer_spark.operators.build_index import (IndexBuilder,
                                                            read_fields)
    from mongoesindexer_spark.operators.merge import compact
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    page_ddl = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")
    pages = spark.createDataFrame([
        ("a", dt.datetime(2026, 1, 1), None, "alpha beta", "EN"),
        ("b", dt.datetime(2026, 1, 1), None, "beta gamma", "DÉ"),
        ("c", dt.datetime(2026, 1, 1), None, "gamma delta", "fr"),
    ], page_ddl)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2, keyword_fields=("lang",)).build(spark, pages)

    upd = spark.createDataFrame([
        ("update", "b", dt.datetime(2026, 2, 1), None, "beta gamma two", "ja"),
        ("insert", "d", dt.datetime(2026, 2, 1), None, "delta epsilon", "PT"),
        ("delete", "c", dt.datetime(2026, 2, 1), None, None, None),
    ], "op string, " + page_ddl)
    IncrementalIndexer(idx).apply_updates(spark, upd, batch_id="f1")

    cat = ParquetCatalog(idx)
    ds = {r["url"]: r["doc_id"] for r in cat.read(spark, "doc_stats").join(
        cat.read(spark, "tombstones"), "doc_id", "left_anti").collect()}
    live = {r["doc_id"]: r for r in read_fields(cat, spark).collect()}
    # exactly the live docs, with the post-update values
    assert set(live) == {ds["a"], ds["b"], ds["d"]}
    assert live[ds["b"]]["lang_keyword"] == "ja"
    assert live[ds["d"]]["lang_keyword"] == "PT"
    assert live[ds["d"]]["lang_normalized"] == "pt"
    assert live[ds["a"]]["lang_normalized"] == "en"

    # compaction drops the masked rows physically
    compact(spark, idx)
    raw = {r["doc_id"] for r in cat.read(spark, "fields").collect()}
    assert raw == {ds["a"], ds["b"], ds["d"]}


def test_keyword_match_query(spark, tmp_path):
    """T8 query side (keyword_match): raw exact match on <field>_keyword;
    normalized match folds case+accents on BOTH sides; tombstoned docs
    are excluded (merge-on-read)."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.keyword import keyword_match
    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    pages = spark.createDataFrame([
        Row(url="a", text="alpha beta", title="Éclair STUDY"),
        Row(url="b", text="beta gamma", title="eclair study"),
        Row(url="c", text="gamma delta", title="other"),
    ])
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2, keyword_fields=("title",)).build(spark, pages)

    # raw keyword: byte-exact, accents/case distinguish
    raw = {r["doc_id"] for r in
           keyword_match(spark, idx, "title", "Éclair STUDY").collect()}
    assert raw == {0}
    # normalized: both docs fold to "eclair study", query value folds too
    norm = {r["doc_id"]: r["url"] for r in keyword_match(
        spark, idx, "title", "ÉCLAIR Study", normalized=True).collect()}
    assert set(norm) == {0, 1} and norm[0] == "a"

    # tombstoned doc disappears from matches
    import pandas as pd
    ParquetCatalog(idx).write_small_arrow(
        pd.DataFrame({"doc_id": pd.Series([0], dtype="int64")}), "tombstones")
    norm2 = {r["doc_id"] for r in keyword_match(
        spark, idx, "title", "eclair study", normalized=True).collect()}
    assert norm2 == {1}


def test_terms_agg(spark, tmp_path):
    """ES terms-aggregation analog: live-doc counts per keyword value,
    count desc / value asc, tombstones excluded."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.keyword import terms_agg
    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    pages = spark.createDataFrame([
        Row(url=f"u{i}", text="alpha beta", cat=c)
        for i, c in enumerate(["news", "news", "blog", "news", "blog", "doc"])
    ])
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2, keyword_fields=("cat",)).build(spark, pages)
    got = [(r["value"], r["doc_count"])
           for r in terms_agg(spark, idx, "cat").collect()]
    assert got == [("news", 3), ("blog", 2), ("doc", 1)]

    # tombstoning a 'news' doc (url=u0 -> doc_id 0) drops its count
    import pandas as pd
    ParquetCatalog(idx).write_small_arrow(
        pd.DataFrame({"doc_id": pd.Series([0], dtype="int64")}), "tombstones")
    got2 = [(r["value"], r["doc_count"])
            for r in terms_agg(spark, idx, "cat").collect()]
    assert got2 == [("blog", 2), ("news", 2), ("doc", 1)]


def test_keyword_sort(spark, tmp_path):
    """ES sort on the normalized sub-field: accent/case-insensitive
    ordering, nulls last, ties by doc_id asc."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.keyword import keyword_sort

    pages = spark.createDataFrame([
        Row(url="a", text="x", title="Émile"),
        Row(url="b", text="x", title="apple"),
        Row(url="c", text="x", title=None),
        Row(url="d", text="x", title="Banana"),
    ])
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2, keyword_fields=("title",)).build(spark, pages)
    got = [(r["doc_id"], r["sort_key"])
           for r in keyword_sort(spark, idx, "title", k=10).collect()]
    # apple < banana < emile (accent folded), null last; urls a..d -> ids 0..3
    assert got == [(1, "apple"), (3, "banana"), (0, "emile"), (2, None)]
    desc = [r["doc_id"] for r in
            keyword_sort(spark, idx, "title", k=10, ascending=False).collect()]
    assert desc == [0, 3, 1, 2]   # emile > banana > apple, null still last
