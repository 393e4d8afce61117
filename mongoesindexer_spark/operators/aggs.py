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
- :func:`search_cardinality_agg` — ``cardinality`` agg: exact distinct
  count (oracle twin) or HyperLogLog++ ``approx_count_distinct`` (the
  scale path — partial sketches merge map-side, the value space never
  shuffles).
- :func:`search_histogram_agg` / :func:`search_date_histogram_agg` —
  fixed-interval and calendar-interval (date_trunc) histograms.
- :func:`search_top_hits_agg` — ``terms`` + ``top_hits`` sub-agg: a
  rank window inside each bucket partition, no global sort.
- :func:`search_percentiles_agg` — ``percentiles``: exact
  linear-interpolation quantiles (swap in ``F.percentile_approx`` —
  t-digest-style — for hit sets too large for exact ranks).
- :func:`search_sort_by_field` — doc-values ``sort`` instead of _score.
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
                         min_should_match: int | None = None,
                         search_after: "tuple | None" = None) -> DataFrame:
    """ES ``sort`` by a doc-values field instead of _score: the hit set
    ordered by a source column (missing values last, like ES missing:
    "_last"), doc_id asc tiebreak, top ``k`` — compiles to
    TakeOrderedAndProject, never a global sort materialization.

    ``search_after=(sort_value, doc_id)``: ES deep paging on a
    doc-values sort — the cursor predicate filters BELOW the top-k, so
    page N costs the same as page 1 (the from+size alternative
    re-ranks N×k rows).  The NULL tail stays addressable, matching ES's
    missing-value sentinel: a non-null cursor also admits every NULL
    row (they sort after it under missing:"_last"), and a cursor of
    ``(None, doc_id)`` pages WITHIN the NULL tail by doc_id tiebreak."""
    hits = match_set(eng, query_text, mode, min_should_match)
    scoped = docs.select("doc_id", sort_col).join(hits, "doc_id", "semi")
    if search_after is not None:
        av, ad = search_after
        c, d = F.col(sort_col), F.col("doc_id")
        if av is None:
            # cursor already inside the NULL tail (ES's post-max
            # sentinel): only later NULL rows remain
            pred = c.isNull() & (d > F.lit(int(ad)))
        else:
            pred = ((c > F.lit(av)) if ascending else (c < F.lit(av))) \
                | ((c == F.lit(av)) & (d > F.lit(int(ad)))) \
                | c.isNull()
        scoped = scoped.filter(pred)
    order = [F.asc_nulls_last(sort_col) if ascending
             else F.desc_nulls_last(sort_col), F.asc("doc_id")]
    return scoped.orderBy(*order).limit(k)


def search_cardinality_agg(eng: SearchEngine, query_text: str, field: str,
                           normalized: bool = False, mode: str = "or",
                           min_should_match: int | None = None,
                           exact: bool = True,
                           rsd: float = 0.05) -> DataFrame:
    """ES ``cardinality`` agg on ``<field>_keyword``/``_normalized``
    over the hit set.

    ``exact=True`` is the oracle-checkable distinct count (one extra
    shuffle on the value).  ``exact=False`` is the scale path — Spark's
    HyperLogLog++ ``approx_count_distinct`` (``rsd`` = relative standard
    deviation), the same sketch family ES's cardinality agg runs, with
    partial sketches merged map-side so high-cardinality fields never
    shuffle their value space."""
    from .build_index import read_fields
    sub = f"{field}_{'normalized' if normalized else 'keyword'}"
    fields = read_fields(eng.cat, eng.spark).select("doc_id", sub)
    hits = match_set(eng, query_text, mode, min_should_match)
    vals = fields.join(hits, "doc_id", "semi").filter(F.col(sub).isNotNull())
    agg = (F.count_distinct(F.col(sub)) if exact
           else F.approx_count_distinct(sub, rsd))
    return vals.agg(agg.cast("long").alias("cardinality"))


def search_date_histogram_agg(eng: SearchEngine, docs: DataFrame,
                              query_text: str, ts_col: str,
                              interval: str = "month", mode: str = "or",
                              min_should_match: int | None = None
                              ) -> DataFrame:
    """ES ``date_histogram`` with a CALENDAR interval (month/week/day/
    year — the variable-width buckets :func:`search_histogram_agg`'s
    fixed arithmetic can't express): bucket = date_trunc(interval, ts)
    over the hit set, ascending, empty buckets omitted
    (min_doc_count=1).  The bucket key is formatted ``yyyy-MM-dd`` (ES
    ``key_as_string``) so page-level consumers never touch timezone
    arithmetic."""
    if interval not in ("year", "quarter", "month", "week", "day"):
        raise ValueError(f"unsupported calendar interval {interval!r}")
    hits = match_set(eng, query_text, mode, min_should_match)
    return (docs.select("doc_id", ts_col).join(hits, "doc_id", "semi")
            .filter(F.col(ts_col).isNotNull())
            .groupBy(F.date_format(F.date_trunc(interval, F.col(ts_col)),
                                   "yyyy-MM-dd").alias("bucket"))
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.asc("bucket")))


def search_top_hits_agg(eng: SearchEngine, docs: DataFrame,
                        query_text: str, group_field: str, sort_col: str,
                        hits_per_bucket: int = 3, ascending: bool = False,
                        normalized: bool = False, mode: str = "or",
                        min_should_match: int | None = None) -> DataFrame:
    """ES ``terms`` agg + ``top_hits`` sub-agg: per keyword-bucket, the
    top ``hits_per_bucket`` docs ordered by a doc-values column
    (doc_id-asc tiebreak).  One shuffle partitions the hit set by
    bucket; the per-bucket heads come from a rank window INSIDE each
    partition — no global sort, no driver materialization, the shape ES
    executes per shard before the coordinator merge."""
    from pyspark.sql import Window
    from .build_index import read_fields
    if hits_per_bucket <= 0:
        raise ValueError("hits_per_bucket must be positive")
    sub = f"{group_field}_{'normalized' if normalized else 'keyword'}"
    fields = read_fields(eng.cat, eng.spark).select("doc_id", sub)
    hits = match_set(eng, query_text, mode, min_should_match)
    scoped = (docs.select("doc_id", sort_col).join(hits, "doc_id", "semi")
              .join(fields, "doc_id")
              .filter(F.col(sub).isNotNull()))
    # nulls LAST either way (ES missing: "_last" — Spark's bare asc is
    # NULLS FIRST, which would hand every bucket's head ranks to docs
    # with no value)
    order = [F.asc_nulls_last(sort_col) if ascending
             else F.desc_nulls_last(sort_col), F.asc("doc_id")]
    w = Window.partitionBy(sub).orderBy(*order)
    return (scoped.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= hits_per_bucket)
            .select(F.col(sub).alias("bucket"), "rank", "doc_id", sort_col)
            .orderBy(F.asc("bucket"), F.asc("rank")))


def search_percentiles_agg(eng: SearchEngine, docs: DataFrame,
                           query_text: str, num_col: str,
                           percentiles: tuple[float, ...] = (
                               0.25, 0.5, 0.75, 0.95, 0.99),
                           mode: str = "or",
                           min_should_match: int | None = None
                           ) -> DataFrame:
    """ES ``percentiles`` agg on a numeric source column over the hit
    set — EXACT linear-interpolation quantiles (the oracle-checkable
    definition both Spark ``percentile`` and DuckDB ``quantile_cont``
    implement).  ES defaults to a t-digest sketch; at hit sets too big
    for exact ranks, swap ``F.percentile`` for ``F.percentile_approx``
    (same call shape) — documented rather than defaulted so the gate
    stays hash-exact."""
    for p in percentiles:
        if not 0.0 <= p <= 1.0:
            raise ValueError("percentiles must be in [0, 1]")
    hits = match_set(eng, query_text, mode, min_should_match)
    scoped = docs.select("doc_id", num_col).join(hits, "doc_id", "semi")
    return scoped.agg(*[
        F.percentile(F.col(num_col), F.lit(float(p)))
        .alias(f"p{str(p).replace('.', '_')}")
        for p in percentiles])


def search_filters_agg(eng: SearchEngine,
                       filters: dict[str, tuple[str, str]]) -> DataFrame:
    """ES ``filters`` agg: one named bucket per filter query, each
    bucket's doc_count = that query's hit-set cardinality, bucket name
    ascending.  Each named filter runs its own term-pushed scan (they
    are independent queries, exactly ES's per-filter bitset); the union
    of one-row counts is driver-trivial.

    ``filters``: ``{bucket_name: (query_text, mode)}``.
    """
    if not filters:
        raise ValueError("filters agg needs at least one named filter")
    parts = []
    for name in sorted(filters):
        q, mode = filters[name]
        parts.append(match_set(eng, q, mode)
                     .agg(F.count("*").alias("doc_count"))
                     .select(F.lit(name).alias("bucket"), "doc_count"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("bucket")


def _after_predicate(cols, after):
    """Lexicographic (col_0, …, col_n) > (after_0, …, after_n) — the
    composite/search_after cursor, written as the OR-of-ANDs Catalyst
    pushes down (the leading column's range predicate reaches the
    scan)."""
    pred = None
    for i, (c, a) in enumerate(zip(cols, after)):
        leg = c > F.lit(a)
        for pc, pa in zip(cols[:i], after[:i]):
            leg = (pc == F.lit(pa)) & leg
        pred = leg if pred is None else pred | leg
    return pred


def search_composite_agg(eng: SearchEngine, query_text: str,
                         field: "str | tuple[str, ...] | list[str]",
                         size: int = 10,
                         after: "str | tuple | None" = None,
                         normalized: bool = False, mode: str = "or",
                         min_should_match: int | None = None) -> DataFrame:
    """ES ``composite`` agg over one or MORE keyword sub-fields: the
    full bucket space (value tuples) streamed in deterministic
    lexicographic order with ``after``-key paging — the agg ES built
    because ``terms`` (size-capped, re-ranked per page) cannot
    paginate.  Spark shape: one shuffled count per page, the after-key
    predicate pushed below the aggregation (its leading-column range
    leg reaches the scan), sort + limit compiling to
    TakeOrderedAndProject.  Page cost is constant in page count; no
    state carries between pages — exactly why this shape survives a
    10^9-bucket field where a giant terms agg cannot.

    Single ``field`` → column ``bucket``; a list → one output column
    per source field (ES's composite key object), plus ``doc_count``.
    """
    from .build_index import read_fields
    if size <= 0:
        raise ValueError("size must be positive")
    multi = not isinstance(field, str)
    names = list(field) if multi else [field]
    subs = [f"{f}_{'normalized' if normalized else 'keyword'}"
            for f in names]
    fields = read_fields(eng.cat, eng.spark).select("doc_id", *subs)
    hits = match_set(eng, query_text, mode, min_should_match)
    vals = fields.join(hits, "doc_id", "semi")
    for s in subs:
        vals = vals.filter(F.col(s).isNotNull())
    if after is not None:
        ak = tuple(after) if multi else (after,)
        if len(ak) != len(subs):
            raise ValueError("after key arity must match the source "
                             f"fields ({len(subs)})")
        vals = vals.filter(_after_predicate(
            [F.col(s) for s in subs], ak))
    out_cols = ([F.col(s).alias(n) for s, n in zip(subs, names)]
                if multi else [F.col(subs[0]).alias("bucket")])
    keyed = vals.groupBy(*out_cols).agg(F.count("*").alias("doc_count"))
    order = [F.asc(n) for n in (names if multi else ["bucket"])]
    return keyed.orderBy(*order).limit(size)


def search_significant_terms_agg(eng: SearchEngine, query_text: str,
                                 size: int = 10, mode: str = "or",
                                 min_should_match: int | None = None
                                 ) -> DataFrame:
    """ES ``significant_terms`` on the text field: terms over-represented
    in the hit set vs the whole corpus, scored with the public JLH
    formula score = (fg% − bg%) × (fg%/bg%), positive-lift terms only,
    score desc / term asc, top ``size``.

    Foreground df comes from the postings scan semi-joined to the hit
    set (one shuffled count per term — partial-aggregated map-side);
    background df is the term_dict broadcast — NO second corpus pass,
    the same reuse the index build's stats assembly does.  n_docs /
    hit count are scalar aggregates."""
    from .build_index import read_flat
    if size <= 0:
        raise ValueError("size must be positive")
    hits = match_set(eng, query_text, mode, min_should_match)
    # the hit count rides the SAME plan as a broadcast one-row frame —
    # no eager driver job, the whole agg stays one lazy DataFrame
    nfg = hits.agg(F.count("*").cast("double").alias("nfg"))
    fg = (read_flat(eng.cat, eng.spark).select("term", "doc_id")
          .join(hits, "doc_id", "semi")
          .groupBy("term").agg(F.count("*").alias("fg_df")))
    bg = eng.cat.read(eng.spark, "term_dict").select(
        "term", F.col("df").alias("bg_df"))
    fg_pct = F.col("fg_df") / F.col("nfg")
    bg_pct = F.col("bg_df") / F.lit(float(eng.n_docs))
    # no broadcast hint on bg: the term dictionary is corpus-vocabulary-
    # sized (unbounded at 10^12 docs — a forced broadcast would hit
    # Spark's 8 GB limit); AQE broadcasts it when it IS small, and the
    # fg side (hit-set vocabulary) is the naturally bounded one
    return (fg.join(bg, "term")
            .crossJoin(F.broadcast(nfg))
            .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
            .filter(F.col("score") > 0)
            .select("term", "score", "fg_df", "bg_df")
            .orderBy(F.desc("score"), F.asc("term")).limit(size))


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
