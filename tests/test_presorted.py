"""pre_sorted build mode: when the source parquet layout is already
globally url-ordered (SORTED BY url tables), the builder skips the
docs_sorted corpus rewrite — at 100 TB that stage is 100 TB of write I/O
spent only on determinism — and tokenizes the source files directly.
The contract: identical index to the normal build, and loud rejection of
layouts the parquet footers cannot prove range-partitioned.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sorted_src(spark, tiny_dir, tmp_path_factory):
    """The tiny corpus re-written range-partitioned + sorted by url."""
    out = str(tmp_path_factory.mktemp("presorted")) + "/pages_sorted.parquet"
    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    (pages.repartitionByRange(4, F.col("url")).sortWithinPartitions("url")
     .write.parquet(out))
    return out


@pytest.fixture(scope="module")
def presorted_index(spark, sorted_src, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    idx = str(tmp_path_factory.mktemp("idx-presorted"))
    IndexBuilder(idx, n_buckets=8, block_size=32,
                 pre_sorted=True).build(spark, spark.read.parquet(sorted_src))
    return idx


def test_presorted_skips_rewrite(presorted_index):
    assert not os.path.exists(os.path.join(presorted_index, "docs_sorted"))


def test_presorted_index_matches_normal_build(spark, presorted_index,
                                              tiny_index):
    """Same corpus, same analyzer ⇒ byte-equal term_dict/global_stats and
    identical (url, doc_len) doc stats; doc_ids may renumber only if the
    file layout ordered urls differently (it doesn't: both are url-ranked)."""
    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    a, b = ParquetCatalog(presorted_index), ParquetCatalog(tiny_index)
    for t in ("term_dict", "global_stats"):
        ra = sorted(map(tuple, a.read(spark, t).collect()))
        rb = sorted(map(tuple, b.read(spark, t).collect()))
        assert ra == rb, t
    da = sorted(map(tuple, a.read(spark, "doc_stats")
                    .select("doc_id", "url", "doc_len").collect()))
    db = sorted(map(tuple, b.read(spark, "doc_stats")
                    .select("doc_id", "url", "doc_len").collect()))
    assert da == db


def test_presorted_queries_match(spark, presorted_index, oracle_tiny,
                                 tiny_queries):
    from mongoesindexer_spark.operators.topk import bm25_topk_df, bm25_topk_wand

    nonempty = 0
    for q in tiny_queries["query_text"].head(8):
        want = sorted((round(s, 6), u) for _, u, s in oracle_tiny.topk(q, 10))
        nonempty += bool(want)
        got_df = sorted((round(r["score"], 6), r["url"]) for r in
                        bm25_topk_df(spark, presorted_index, q, 10).collect())
        pdf = bm25_topk_wand(spark, presorted_index, q, 10)
        got_wand = sorted(zip(pdf["score"].round(6), pdf["url"]))
        assert got_df == want, q
        assert got_wand == want, q
    assert nonempty >= 4, "query set must actually hit the corpus"


def test_presorted_rejects_unsorted_layout(spark, tiny_dir, tmp_path):
    """A hash-partitioned (url ranges overlapping across files) source must
    be rejected at validation time, not silently mis-numbered."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    shuffled = str(tmp_path / "pages_shuffled.parquet")
    (spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
     .repartition(4, F.col("url")).write.parquet(shuffled))
    with pytest.raises(ValueError, match="overlap|not globally"):
        IndexBuilder(str(tmp_path / "idx"), pre_sorted=True).build(
            spark, spark.read.parquet(shuffled))


def test_presorted_requires_standard_columns(tmp_path):
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    with pytest.raises(ValueError, match="pre_sorted requires"):
        IndexBuilder(str(tmp_path / "idx"), pre_sorted=True, key_col="id")
