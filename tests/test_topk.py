"""Top-k BM25 correctness: rank-identical docIDs, scores within 1e-6 vs the
pure-Python oracle, for the whole reference query set; WAND == exhaustive.
"""

import numpy as np
import pytest

from mongoesindexer_spark.operators.topk import bm25_topk_df, bm25_topk_wand


def _assert_matches_oracle(got, want, qtext):
    """got: list[(doc_id, url, score)] — must be rank-identical to oracle."""
    assert len(got) == len(want), f"{qtext}: {len(got)} vs {len(want)} hits"
    for i, ((gd, gu, gs), (wd, wu, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{qtext}: rank {i} doc {gd} != {wd}"
        assert gu == wu, f"{qtext}: rank {i} url"
        assert abs(gs - ws) < 1e-6, f"{qtext}: rank {i} score {gs} vs {ws}"


def test_bm25_df_matches_oracle_all_queries(spark, tiny_index, tiny_queries, oracle_tiny):
    for r in tiny_queries.itertuples():
        want = oracle_tiny.topk(r.query_text, r.k)
        got = [
            (row["doc_id"], row["url"], row["score"])
            for row in bm25_topk_df(spark, tiny_index, r.query_text, r.k).collect()
        ]
        _assert_matches_oracle(got, want, r.query_text)


def test_bm25_wand_matches_oracle_all_queries(spark, tiny_index, tiny_queries, oracle_tiny):
    for r in tiny_queries.itertuples():
        want = oracle_tiny.topk(r.query_text, r.k)
        pdf = bm25_topk_wand(spark, tiny_index, r.query_text, r.k)
        got = list(zip(pdf["doc_id"], pdf["url"], pdf["score"]))
        _assert_matches_oracle(got, want, r.query_text)


def test_empty_result_for_absent_term(spark, tiny_index, oracle_tiny):
    assert bm25_topk_df(spark, tiny_index, "zzzzmissingterm", 10).count() == 0
    assert len(bm25_topk_wand(spark, tiny_index, "zzzzmissingterm", 10)) == 0


def test_conjunctive_mode(spark, tiny_index, oracle_tiny):
    """AND semantics (J6): every hit contains every query term."""
    q = "the of"  # two head-ish terms
    hits = bm25_topk_df(spark, tiny_index, q, 1000, mode="and").collect()
    terms = set()
    from mongoesindexer_spark.functions.analysis import analyze_search
    terms = set(analyze_search(q))
    for h in hits:
        for t in terms:
            plist = oracle_tiny.postings.get(t, {})
            assert h["doc_id"] in plist, f"doc {h['doc_id']} missing term {t}"
