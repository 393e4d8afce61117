"""ES search aggregations: aggs computed over the FULL hit set.

An ES request body can carry ``query`` + ``aggs``; the aggregation runs
over every matching doc (not the top-k page), per shard, and the
coordinating node merges.  The Spark analog is the same shape Catalyst
already optimizes: the match set is a distinct-doc_id frame derived from
the term-filtered postings scan (predicate pushed to parquet), the agg a
shuffled partial aggregation over it — no driver materialization of the
hit set, which is what survives a head-term query at 10^12 docs.

Implemented aggs (the reference's ES usage surface — terms fielddata
aggs and numeric stats are what its keyword/integer mappings serve):

- :func:`search_terms_agg` — ``terms`` agg on a keyword sub-field over
  the hit set (bucket doc counts, count desc / value asc, size-capped).
- :func:`search_stats_agg` — ``stats`` agg (count/min/max/sum/avg) on a
  numeric source column over the hit set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import SearchEngine, _query_terms


def match_set(eng: SearchEngine, query_text: str, mode: str = "or",
              min_should_match: int | None = None) -> DataFrame:
    """Distinct doc_ids matching the analyzed query — the ES hit set as
    a DataFrame: one term-pushed postings scan, a doc_id aggregation
    (counts double as the conjunction/minimum_should_match filter), and
    the merge-on-read tombstone anti-join."""
    from .build_index import read_flat
    terms = _query_terms(query_text, eng.cfg)
    if not terms:
        return eng.spark.range(0).select(F.col("id").alias("doc_id"))
    flat = read_flat(eng.cat, eng.spark).filter(F.col("term").isin(terms))
    if min_should_match is not None and mode == "and":
        raise ValueError("min_should_match applies to mode='or' "
                         "(mode='and' is already all-clauses)")
    docs = flat.groupBy("doc_id").agg(F.count("*").alias("n_terms"))
    if mode == "and":
        docs = docs.filter(F.col("n_terms") == len(terms))
    elif min_should_match is not None:
        docs = docs.filter(F.col("n_terms") >= min_should_match)
    docs = docs.select("doc_id")
    if eng.tombstones:
        ts = eng.spark.createDataFrame(
            [(int(d),) for d in sorted(eng.tombstones)], "doc_id long")
        docs = docs.join(F.broadcast(ts), "doc_id", "left_anti")
    return docs


def search_count(eng: SearchEngine, query_text: str, mode: str = "or",
                 min_should_match: int | None = None) -> DataFrame:
    """ES ``_count``: the hit-set cardinality as a one-row frame — the
    same term-pushed scan + doc_id aggregation as every aggs entry, with
    a count instead of a bucket step."""
    return match_set(eng, query_text, mode, min_should_match) \
        .agg(F.count("*").alias("doc_count"))


def search_terms_agg(eng: SearchEngine, query_text: str, field: str,
                     size: int = 10, normalized: bool = False,
                     mode: str = "or",
                     min_should_match: int | None = None) -> DataFrame:
    """ES ``terms`` agg on ``<field>_keyword``/``_normalized`` over the
    query's hit set: per-value doc counts, ES bucket order (count desc,
    value asc), top ``size`` buckets.  One shuffle for the match set,
    one for the bucket counts — the same two-phase shape ES executes
    per shard + coordinator merge."""
    from .build_index import read_fields
    sub = f"{field}_{'normalized' if normalized else 'keyword'}"
    fields = read_fields(eng.cat, eng.spark).select("doc_id", sub)
    hits = match_set(eng, query_text, mode, min_should_match)
    return (fields.join(hits, "doc_id", "semi")
            .filter(F.col(sub).isNotNull())
            .groupBy(F.col(sub).alias("value"))
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("value"))
            .limit(size))


def search_histogram_agg(eng: SearchEngine, docs: DataFrame,
                         query_text: str, num_col: str, interval: int,
                         mode: str = "or",
                         min_should_match: int | None = None) -> DataFrame:
    """ES ``histogram`` agg (the fixed-interval core of date_histogram —
    dates being epoch millis, a calendar interval is just a different
    bucket function): bucket = floor(value / interval) × interval over
    the hit set, bucket-ascending like ES.  Empty buckets are omitted
    (ES min_doc_count=1 shape)."""
    if interval <= 0:
        raise ValueError("interval must be positive")
    hits = match_set(eng, query_text, mode, min_should_match)
    return (docs.select("doc_id", num_col).join(hits, "doc_id", "semi")
            .filter(F.col(num_col).isNotNull())
            .groupBy((F.floor(F.col(num_col) / interval)
                      * interval).cast("long").alias("bucket"))
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.asc("bucket")))


def search_sort_by_field(eng: SearchEngine, docs: DataFrame,
                         query_text: str, sort_col: str, k: int,
                         ascending: bool = True, mode: str = "or",
                         min_should_match: int | None = None) -> DataFrame:
    """ES ``sort`` by a doc-values field instead of _score: the hit set
    ordered by a source column (missing values last, like ES missing:
    "_last"), doc_id asc tiebreak, top ``k`` — compiles to
    TakeOrderedAndProject, never a global sort materialization."""
    hits = match_set(eng, query_text, mode, min_should_match)
    order = [F.asc_nulls_last(sort_col) if ascending
             else F.desc_nulls_last(sort_col), F.asc("doc_id")]
    return (docs.select("doc_id", sort_col).join(hits, "doc_id", "semi")
            .orderBy(*order).limit(k))


def search_stats_agg(eng: SearchEngine, docs: DataFrame, query_text: str,
                     num_col: str, mode: str = "or",
                     min_should_match: int | None = None) -> DataFrame:
    """ES ``stats`` agg on a numeric source column over the hit set.
    ``docs``: the source table carrying (doc_id, ``num_col``) — the
    engine stores no numeric doc values, so like highlighting this is
    the _source-side join, semi-filtered by the match set before the
    single global aggregate."""
    hits = match_set(eng, query_text, mode, min_should_match)
    return (docs.select("doc_id", num_col).join(hits, "doc_id", "semi")
            .agg(F.count("*").alias("count"),
                 F.min(num_col).alias("min"),
                 F.max(num_col).alias("max"),
                 F.sum(num_col).alias("sum"),
                 F.avg(num_col).alias("avg")))
