"""End-to-end build correctness vs the pure-Python oracle (SURVEY §5.2-2/4)."""

import os

import numpy as np
import pandas as pd
import pytest

from mongoesindexer_spark.functions.analysis import analyze_index
from mongoesindexer_spark.functions.encode import decode_block
from mongoesindexer_spark.sources.catalog import ParquetCatalog


def test_doc_ids_match_url_rank(spark, tiny_index, tiny_pages):
    cat = ParquetCatalog(tiny_index)
    stats = cat.read(spark, "doc_stats").toPandas().sort_values("doc_id")
    want_urls = sorted(tiny_pages["url"])
    assert list(stats["url"]) == want_urls
    assert list(stats["doc_id"]) == list(range(len(want_urls)))


def test_doc_lens_match_oracle(spark, tiny_index, oracle_tiny):
    cat = ParquetCatalog(tiny_index)
    stats = cat.read(spark, "doc_stats").toPandas()
    got = dict(zip(stats["doc_id"], stats["doc_len"]))
    assert got == oracle_tiny.doc_len


def test_global_stats_match_oracle(spark, tiny_index, oracle_tiny):
    cat = ParquetCatalog(tiny_index)
    g = cat.read(spark, "global_stats").collect()[0]
    assert g["n_docs"] == oracle_tiny.n_docs
    assert abs(g["avgdl"] - oracle_tiny.avgdl) < 1e-9


def test_term_dict_matches_oracle(spark, tiny_index, oracle_tiny):
    cat = ParquetCatalog(tiny_index)
    td = cat.read(spark, "term_dict").toPandas()
    got_df = dict(zip(td["term"], td["df"]))
    want_df = {t: len(p) for t, p in oracle_tiny.postings.items()}
    assert got_df == want_df
    got_cf = dict(zip(td["term"], td["cf"]))
    want_cf = {t: sum(p.values()) for t, p in oracle_tiny.postings.items()}
    assert got_cf == want_cf
    for t, idf in zip(td["term"], td["idf"]):
        assert abs(idf - oracle_tiny.idf(t)) < 1e-9, t


def test_postings_flat_matches_oracle(spark, tiny_index, oracle_tiny):
    from mongoesindexer_spark.operators.build_index import read_flat
    cat = ParquetCatalog(tiny_index)
    flat = read_flat(cat, spark).toPandas()
    got = {(r.term, r.doc_id): r.tf for r in flat.itertuples()}
    want = {
        (t, d): tf for t, plist in oracle_tiny.postings.items() for d, tf in plist.items()
    }
    assert got == want


def test_encoded_blocks_roundtrip_to_flat(spark, tiny_index):
    """Segment decode == flat postings: the compressed index is lossless,
    blocks are doc-ordered and disjoint per term (segment-merge invariant)."""
    from mongoesindexer_spark.operators.build_index import read_flat
    cat = ParquetCatalog(tiny_index)
    flat = read_flat(cat, spark).toPandas()
    blocks = cat.read(spark, "postings_blocks").toPandas()
    want = {
        t: g.sort_values("doc_id")[["doc_id", "tf"]].values
        for t, g in flat.groupby("term")
    }
    got: dict[str, list] = {}
    for t, g in blocks.sort_values(["term", "block_id"]).groupby("term", sort=False):
        docs_all, tfs_all = [], []
        prev_last = -1
        for r in g.itertuples():
            d, tf = decode_block(r.docs_vb, r.tfs_vb)
            assert r.first_doc == d[0] and r.last_doc == d[-1]
            assert d[0] > prev_last, f"blocks overlap for term {t}"
            prev_last = int(d[-1])
            docs_all.append(d)
            tfs_all.append(tf)
        got[t] = np.column_stack([np.concatenate(docs_all), np.concatenate(tfs_all)])
    assert set(got) == set(want)
    for t in want:
        assert np.array_equal(got[t], want[t]), t


def test_spark_tokens_equal_pure_function(spark, tiny_index, tiny_pages, oracle_tiny):
    """Per-row invariant under Spark: the Arrow-batched tokenize path emits
    exactly the tokens the pure function emits (byte-identical)."""
    from mongoesindexer_spark.operators.build_index import read_flat
    cat = ParquetCatalog(tiny_index)
    flat = read_flat(cat, spark).toPandas()
    got_terms_per_doc = {
        d: set(g["term"]) for d, g in flat.groupby("doc_id")
    }
    for doc_id, url in oracle_tiny.urls.items():
        want = {t for t, p in oracle_tiny.postings.items() if doc_id in p}
        assert got_terms_per_doc.get(doc_id, set()) == want


def test_extracted_text_byte_identical(spark, tiny_dir, tiny_pages):
    """input_hint invariant: rows with NULL text get html→text extraction
    that reproduces the pre-extracted text byte-identically."""
    from mongoesindexer_spark.functions.analysis import extract_text
    from mongoesindexer_spark.operators.build_index import resolve_text

    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    resolved = resolve_text(pages).select("url", "text").toPandas()
    got = dict(zip(resolved["url"], resolved["text"]))
    for r in tiny_pages.itertuples():
        # fixture: text NULL every 5th row; html always renders title\nbody
        want = r.text if r.text is not None else extract_text(r.html)
        assert got[r.url] == want
        if r.text is not None:
            assert extract_text(r.html) == r.text  # extraction == pre-extracted


def test_sorted_doc_files_skips_empty_parts(tmp_path):
    """Empty range partitions (n_parts > distinct keys) must not produce
    duplicate rank offsets: the kernel-direct flat writer names outputs
    part-{offset}, so a collision silently drops a file's postings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongoesindexer_spark.operators.build_index import sorted_doc_files

    pq.write_table(pa.table({"url": ["a", "b"]}),
                   str(tmp_path / "part-00000-x.parquet"))
    pq.write_table(pa.table({"url": pa.array([], pa.string())}),
                   str(tmp_path / "part-00001-x.parquet"))
    pq.write_table(pa.table({"url": ["c"]}),
                   str(tmp_path / "part-00002-x.parquet"))
    files = sorted_doc_files(str(tmp_path))
    assert [os.path.basename(p) for p, _ in files] == [
        "part-00000-x.parquet", "part-00002-x.parquet"]
    offs = [off for _, off in files]
    assert offs == [0, 2] and len(set(offs)) == len(offs)


def test_empty_corpus_builds_and_serves(spark, tmp_path):
    """A zero-row input must produce a valid, queryable (empty) index —
    not an UNABLE_TO_INFER_SCHEMA crash at the term_dict stage (the
    encode stage pins the blocks schema with an empty segment, same as
    compaction does for a fully-tombstoned corpus)."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import bm25_topk_df, bm25_topk_wand
    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, "
            "lang string")
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2).build(spark, pages)

    cat = ParquetCatalog(idx)
    assert cat.read(spark, "term_dict").count() == 0
    g = cat.read(spark, "global_stats").collect()[0]
    assert g["n_docs"] == 0
    assert bm25_topk_df(spark, idx, "data query", 5).count() == 0
    assert len(bm25_topk_wand(spark, idx, "data query", 5)) == 0
