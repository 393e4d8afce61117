"""Query-side exact-match over materialized keyword sub-fields (T8).

The reference's mappings give text columns ``<field>.keyword`` (raw) and
``<field>.normalized`` (keyword tokenizer → lowercase → asciifolding)
sub-fields for ES term queries and sort keys
(configs/ltd_doc.settings.json:278-310).  The build/sync stages
materialize those as the ``fields`` table (operators/build_index.py
fields_subfields); this module is the ES term-query analog over it.

Plan shape: one equality filter pushed into the parquet scan of the
vocab-thin ``fields`` table, tombstone anti-join for merge-on-read
freshness, then a doc_id equi-join to doc_stats for the url — no
corpus-wide shuffle (AQE broadcasts the filtered side when small).

This module is the ANALYTICS path (full match sets, aggregations,
sorts).  The SERVING path — bounded ES-style term queries at
point-read latency, no Spark job — is ``SearchEngine.keyword_term``
over the value-sorted ``fields_by_<subcol>`` sidecars the build/sync/
compact stages maintain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import normalize
from ..sources.catalog import ParquetCatalog


def keyword_match(spark: SparkSession, index_dir: str, field: str,
                  value: str, normalized: bool = False) -> DataFrame:
    """Docs whose ``field`` exactly matches ``value`` → (doc_id, url).

    ``normalized=False``: raw exact match (the ``<field>.keyword`` term
    query).  ``normalized=True``: match after the ``normalize`` analyzer
    on BOTH sides (the ``<field>.normalized`` term query) — the query
    value goes through the same keyword→lowercase→asciifolding chain the
    index side did, exactly as ES analyzes a term query against a
    normalizer-equipped field.
    """
    from .build_index import read_fields

    cat = ParquetCatalog(index_dir)
    col = f"{field}_normalized" if normalized else f"{field}_keyword"
    v = normalize(value) if normalized else value
    hits = read_fields(cat, spark).filter(F.col(col) == v).select("doc_id")
    urls = cat.read(spark, "doc_stats").select("doc_id", "url")
    return hits.join(urls, "doc_id", "left").select("doc_id", "url")


def keyword_sort(spark: SparkSession, index_dir: str, field: str,
                 k: int = 20, ascending: bool = True,
                 normalized: bool = True) -> DataFrame:
    """Top-``k`` docs ordered by a keyword sub-field — the ES ``sort``
    on ``<field>.normalized`` (accent/case-insensitive collation keys,
    what the reference's normalize analyzer exists for,
    ltd_doc.settings.json:278-310).  Nulls last either direction (ES
    missing-last default); ties by doc_id asc (determinism contract).
    TakeOrderedAndProject — no global sort at any corpus size."""
    from .build_index import read_fields

    cat = ParquetCatalog(index_dir)
    col = f"{field}_normalized" if normalized else f"{field}_keyword"
    key = F.col("sort_key")
    return (read_fields(cat, spark)
            .select("doc_id", F.col(col).alias("sort_key"))
            .orderBy(key.asc_nulls_last() if ascending
                     else key.desc_nulls_last(),
                     F.col("doc_id").asc())
            .limit(k))


def terms_agg(spark: SparkSession, index_dir: str, field: str,
              size: int = 10, normalized: bool = False) -> DataFrame:
    """ES ``terms`` aggregation on a keyword sub-field: top-``size``
    distinct values by live-doc count → (value, doc_count), count desc,
    ties by value asc (ES ties break by term order).

    The fielddata analog the reference's keyword mappings exist for
    (faceting / keyword sub-field aggregations).  One shuffled aggregate
    over the vocab-thin ``fields`` table (merge-on-read: tombstoned docs
    excluded), top-k via TakeOrderedAndProject — no global sort."""
    from .build_index import read_fields

    cat = ParquetCatalog(index_dir)
    col = f"{field}_normalized" if normalized else f"{field}_keyword"
    return (read_fields(cat, spark)
            .filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("value"))
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("value"))
            .limit(size))
