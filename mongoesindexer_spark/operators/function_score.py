"""ES ``function_score`` with ``field_value_factor``.

ES rescales relevance by a per-doc numeric signal (recency, popularity,
length): ``score' = boost_mode(bm25_score, modifier(factor × value))``.
The factor changes the ORDER, so the top-k must be selected on the
combined score over the whole match set — a BM25 top-k page cannot just
be re-weighted.

Two paths, rank-identical (tested):

- ``locus="kernel"``: the vectorized score-all pass
  (:func:`..topk.match_scores_arrays`) gives (doc, bm25) for every
  candidate; the numeric doc values come from a CANDIDATE-BOUNDED point
  read of the doc-ordered ``fields`` table's ``<field>_num`` sub-field
  (the same read range-filter context uses — cost ∝ candidates, never
  corpus); combine + top-k in numpy.
- ``locus="spark"``: the ``topk_df``-shaped score frame joined to the
  ``fields`` numeric sub-field, combined in codegen arithmetic,
  TakeOrderedAndProject — the head-term-scale path.

Modifiers: ``none`` (factor×v), ``log1p`` (ln(1 + factor×v)), ``sqrt``;
boost_mode: ``multiply`` (ES default) or ``sum``.  Docs with a NULL
value take ``missing`` (default 1.0) as the raw value before the
modifier — ES's ``missing`` parameter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .topk import SearchEngine, _query_terms, get_engine, \
    match_scores_arrays

MODIFIERS = ("none", "log1p", "sqrt")
BOOST_MODES = ("multiply", "sum")


def _weight_np(v: np.ndarray, factor: float, modifier: str) -> np.ndarray:
    x = factor * v
    if modifier == "log1p":
        return np.log1p(x)
    if modifier == "sqrt":
        return np.sqrt(x)
    return x


def _weight_col(c, factor: float, modifier: str):
    x = c * F.lit(factor)
    if modifier == "log1p":
        return F.log1p(x)
    if modifier == "sqrt":
        return F.sqrt(x)
    return x


def function_score_topk(spark: SparkSession, index_dir: str,
                        query_text: str, k: int, field: str,
                        factor: float = 1.0, modifier: str = "log1p",
                        boost_mode: str = "multiply",
                        missing: float = 1.0,
                        locus: str = "kernel") -> pd.DataFrame:
    """Top-k by ``boost_mode(bm25, modifier(factor × <field>_num))``
    over the full match set (ties doc_id asc)."""
    if modifier not in MODIFIERS:
        raise ValueError(f"modifier must be one of {MODIFIERS}")
    if boost_mode not in BOOST_MODES:
        raise ValueError(f"boost_mode must be one of {BOOST_MODES}")
    eng = get_engine(spark, index_dir)
    sub = f"{field}_num"
    names = eng._rg_index("fields", "doc_id").files
    if names and sub not in names[0].schema_arrow.names:
        raise KeyError(
            f"fields table has no numeric sub-field {sub!r} — was the "
            f"index built with numeric_fields=({field!r},)?")
    if locus == "spark":
        return _function_score_df(eng, query_text, k, sub, factor,
                                  modifier, boost_mode, missing).toPandas()
    if locus != "kernel":
        raise ValueError("locus must be 'kernel' or 'spark'")
    terms = _query_terms(query_text, eng.cfg)
    meta = eng._term_meta(terms)
    td = {t: m[0] for t, m in meta.items() if m is not None}
    terms = [t for t in terms if t in td]
    by_term = eng._term_blocks(terms)
    from ..functions.encode import decode_blocks_into
    decode_blocks_into([b for bl in by_term.values() for b in bl
                        if "_arrs" not in b])
    uniq, bm25, _ = match_scores_arrays(
        {t: (td[t], by_term[t]) for t in terms if t in by_term},
        eng.avgdl, need_counts=False)
    if uniq.size and eng.tombstones:
        keep = ~np.isin(uniq, np.fromiter(eng.tombstones, dtype=np.int64))
        uniq, bm25 = uniq[keep], bm25[keep]
    if uniq.size == 0:
        return pd.DataFrame(columns=["doc_id", "url", "score"])
    vals = eng._rg_index("fields", "doc_id").read_isin(
        [int(d) for d in uniq], ["doc_id", sub])
    vmap = vals.set_index("doc_id")[sub]
    v = vmap.reindex(uniq).astype("float64").fillna(float(missing)).values
    w = _weight_np(v, factor, modifier)
    score = bm25 * w if boost_mode == "multiply" else bm25 + w
    order = np.lexsort((uniq, -score))[:k]
    hits = [(float(score[i]), int(uniq[i])) for i in order]
    urls = eng.fetch_urls([d for _, d in hits])
    return pd.DataFrame(
        [{"doc_id": d, "url": urls.get(d), "score": s} for s, d in hits],
        columns=["doc_id", "url", "score"])


def _function_score_df(eng: SearchEngine, query_text: str, k: int,
                       sub: str, factor: float, modifier: str,
                       boost_mode: str, missing: float) -> DataFrame:
    """Distributed twin: the topk_df scoring frame joined to the fields
    numeric sub-field; one extra broadcast-or-shuffle join over what
    topk_df already does, combined in whole-stage codegen."""
    from ..functions.encode import B, K1
    from .build_index import read_fields, read_flat
    terms = _query_terms(query_text, eng.cfg)
    flat = read_flat(eng.cat, eng.spark).filter(F.col("term").isin(terms))
    if eng.tombstones:
        ts = eng.spark.createDataFrame(
            [(int(d),) for d in sorted(eng.tombstones)], "doc_id long")
        flat = flat.join(F.broadcast(ts), "doc_id", "left_anti")
    td = eng.cat.read(eng.spark, "term_dict").filter(F.col("term").isin(terms))
    bm25 = (flat.join(F.broadcast(td.select("term", "idf")), "term")
            .withColumn("contrib",
                        F.col("idf") * F.col("tf") * (K1 + 1.0)
                        / (F.col("tf") + K1 * (1.0 - B + B * F.col("doc_len")
                                               / F.lit(eng.avgdl))))
            .groupBy("doc_id").agg(F.sum("contrib").alias("bm25")))
    vals = read_fields(eng.cat, eng.spark).select("doc_id", sub)
    w = _weight_col(F.coalesce(F.col(sub).cast("double"),
                               F.lit(float(missing))), factor, modifier)
    combined = (bm25.join(vals, "doc_id", "left")
                .withColumn("score",
                            F.col("bm25") * w if boost_mode == "multiply"
                            else F.col("bm25") + w))
    urls = eng.cat.read(eng.spark, "doc_stats").select("doc_id", "url")
    return (combined.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .join(urls, "doc_id", "left")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .select("doc_id", "url", "score"))
