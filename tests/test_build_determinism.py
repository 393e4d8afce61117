"""Build determinism across source layout (SURVEY §5.2-4b): the same
corpus written as ONE parquet file vs MANY shuffled small files must
produce identical index CONTENT — doc ids (url ranks), doc/term/global
stats, and query results.  The range-sort + footer-offset numbering is
what makes doc_id a pure function of the corpus, never of partitioning
or input order."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mongoesindexer_spark.operators.build_index import IndexBuilder
from mongoesindexer_spark.operators.topk import bm25_topk_wand
from mongoesindexer_spark.sources.catalog import ParquetCatalog


@pytest.fixture(scope="module")
def two_layouts(spark, tiny_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("layouts")
    pages = pd.read_parquet(os.path.join(tiny_dir, "pages.parquet"))
    one = str(root / "one")
    many = str(root / "many")
    os.makedirs(one)
    pages.to_parquet(os.path.join(one, "part-0.parquet"))
    # shuffled row order, 7 uneven files — nothing about the layout may
    # leak into the index
    shuffled = pages.sample(frac=1.0, random_state=7).reset_index(drop=True)
    os.makedirs(many)
    bounds = [0, 40, 55, 140, 300, 310, 420, len(shuffled)]
    for i, (a, b) in enumerate(zip(bounds, bounds[1:])):
        shuffled.iloc[a:b].to_parquet(
            os.path.join(many, f"part-{i}.parquet"))
    idx_one = str(root / "idx_one")
    idx_many = str(root / "idx_many")
    IndexBuilder(idx_one, n_buckets=2).build(spark, spark.read.parquet(one))
    IndexBuilder(idx_many, n_buckets=4).build(spark, spark.read.parquet(many))
    return idx_one, idx_many


def _table(spark, idx, name, cols):
    cat = ParquetCatalog(idx)
    df = cat.read(spark, name)
    if name == "postings_flat":      # drop doc-marker rows (term NULL)
        df = df.filter(F.col("term").isNotNull())
    return sorted(tuple(r[c] for c in cols)
                  for r in df.select(*cols).collect())


def test_tables_identical(spark, two_layouts):
    a, b = two_layouts
    for name, cols in (("doc_stats", ["doc_id", "url", "doc_len"]),
                       ("term_dict", ["term", "df", "cf"]),
                       ("postings_flat", ["term", "doc_id", "tf"])):
        assert _table(spark, a, name, cols) == _table(spark, b, name, cols), name
    ga = ParquetCatalog(a).read(spark, "global_stats").collect()[0]
    gb = ParquetCatalog(b).read(spark, "global_stats").collect()[0]
    assert (ga["n_docs"], ga["sum_dl"]) == (gb["n_docs"], gb["sum_dl"])


def test_queries_identical(spark, two_layouts, tiny_queries):
    a, b = two_layouts
    for r in tiny_queries.itertuples():
        pa_ = bm25_topk_wand(spark, a, r.query_text, r.k)
        pb_ = bm25_topk_wand(spark, b, r.query_text, r.k)
        assert list(pa_["doc_id"]) == list(pb_["doc_id"]), r.query_text
        assert [round(x, 9) for x in pa_["score"]] == \
            [round(x, 9) for x in pb_["score"]], r.query_text
