"""ES _count and _explain parity: hit-set cardinality vs brute force,
and the per-term score breakdown reconciling bit-for-bit with the
serving paths' BM25 score."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def eng(spark, tiny_index):
    from mongoesindexer_spark.operators.topk import get_engine
    return get_engine(spark, tiny_index)


def _hits(oracle, query, mode="or", msm=None):
    from mongoesindexer_spark.functions.analysis import analyze_search
    terms = sorted(set(analyze_search(query, oracle.cfg)))
    counts = {}
    for t in terms:
        for d in oracle.postings.get(t, {}):
            counts[d] = counts.get(d, 0) + 1
    if mode == "and":
        return {d for d, c in counts.items() if c == len(terms)}
    if msm is not None:
        return {d for d, c in counts.items() if c >= msm}
    return set(counts)


def test_search_count_matches_bruteforce(spark, eng, oracle_tiny):
    from mongoesindexer_spark.operators.aggs import search_count
    q = "udrndau atreq kni"
    for mode, msm in (("or", None), ("and", None), ("or", 2)):
        got = search_count(eng, q, mode=mode,
                           min_should_match=msm).collect()[0]["doc_count"]
        assert got == len(_hits(oracle_tiny, q, mode, msm))


def test_explain_reconciles_with_serving_score(spark, eng, oracle_tiny):
    q = "udrndau atreq kni"
    top = eng.topk_wand(q, 3)
    for _, row in top.iterrows():
        exp = eng.explain(q, int(row["doc_id"]))
        # per-term contributions match the python oracle
        for _, er in exp.iterrows():
            t = er["term"]
            assert oracle_tiny.postings[t][int(row["doc_id"])] == er["tf"]
            assert abs(er["idf"] - oracle_tiny.idf(t)) < 1e-9
        # term-ordered sum IS the serving score, bit-for-bit
        acc = 0.0
        for c in exp["contribution"]:
            acc += c
        assert acc == row["score"]


def test_explain_absent_and_tombstoned(spark, eng):
    assert eng.explain("udrndau", 10 ** 12).empty
    assert eng.explain("zzznotaterm", 0).empty
