"""Compound queries (operators/compound.py): dis_max per-field
sub-queries, boosting demotion, constant_score filter context — kernel
vs spark locus rank identity and brute-force correctness."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def cq_indexes(spark, tiny_pages, tmp_path_factory):
    """Body + title indexes over the tiny fixture (same construction as
    test_multi_match's fixture) plus the resolved source frame."""
    from mongoesindexer_spark.functions.analysis import extract_text
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    resolved = tiny_pages.copy()
    resolved["text"] = [
        t if t is not None else extract_text(h)
        for t, h in zip(resolved["text"], resolved["html"])]
    resolved["html"] = None

    body_dir = str(tmp_path_factory.mktemp("idx-cq-body"))
    IndexBuilder(body_dir, n_buckets=4, block_size=32).build(
        spark, spark.createDataFrame(resolved.drop(columns=["html"])))
    titles = resolved.drop(columns=["html"]).copy()
    titles["text"] = titles["text"].map(
        lambda t: " ".join(t.split()[:5]))
    title_dir = str(tmp_path_factory.mktemp("idx-cq-title"))
    IndexBuilder(title_dir, n_buckets=4, block_size=32).build(
        spark, spark.createDataFrame(titles))
    return resolved, {"body": body_dir, "title": title_dir}


def _oracles(resolved):
    from tests.oracle import OracleIndex
    body = OracleIndex.build(resolved)
    tdf = resolved.copy()
    tdf["text"] = tdf["text"].map(lambda t: " ".join(t.split()[:5]))
    return body, OracleIndex.build(tdf)


def test_dis_max_per_field_queries_vs_bruteforce(spark, cq_indexes):
    from mongoesindexer_spark.functions.analysis import analyze_search
    from mongoesindexer_spark.operators.compound import dis_max_topk

    resolved, dirs = cq_indexes
    body, title = _oracles(resolved)
    fq = {"body": "spark index", "title": "the"}
    tb, k = 0.4, 10

    cand = set()
    for oi, q in ((body, fq["body"]), (title, fq["title"])):
        for t in set(analyze_search(q, oi.cfg)):
            cand |= set(oi.postings.get(t, {}))
    want = []
    for d in cand:
        pf = [body.score(fq["body"], d), title.score(fq["title"], d)]
        best = max(pf)
        want.append((best + tb * (sum(pf) - best), d))
    want.sort(key=lambda x: (-x[0], x[1]))

    for locus in ("kernel", "spark"):
        got = dis_max_topk(spark, dirs, fq, k, tie_breaker=tb, locus=locus)
        assert [int(x) for x in got["doc_id"]] == [d for _, d
                                                   in want[:k]], locus
        for gs, (ws, _) in zip(got["score"], want):
            assert abs(gs - ws) < 1e-9


def test_dis_max_same_query_equals_multi_match(spark, cq_indexes):
    from mongoesindexer_spark.operators.compound import dis_max_topk
    from mongoesindexer_spark.operators.multi_match import multi_match_topk

    _, dirs = cq_indexes
    q = "the spark index"
    mm = multi_match_topk(spark, dirs, q, 8, "best_fields", 0.3)
    dm = dis_max_topk(spark, dirs, {"body": q, "title": q}, 8,
                      tie_breaker=0.3)
    assert list(mm["doc_id"]) == list(dm["doc_id"])
    assert np.allclose(mm["score"], dm["score"])


def test_dis_max_rejects_partial_mapping(spark, cq_indexes):
    from mongoesindexer_spark.operators.compound import dis_max_topk
    _, dirs = cq_indexes
    with pytest.raises(ValueError, match="cover exactly"):
        dis_max_topk(spark, dirs, {"body": "x"}, 5)


@pytest.fixture(scope="module")
def boost_index(spark, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-boosting"))
    rows = [(f"u{i:02d}",
             "common " + ("extra " * (i % 3)) + ("bad " if i % 4 == 0
                                                 else "") + f"w{i}")
            for i in range(16)]
    df = spark.createDataFrame(rows, "url string, text string")
    IndexBuilder(d, n_buckets=2).build(spark, df)
    return d, rows


def test_boosting_matches_bruteforce(spark, boost_index):
    from mongoesindexer_spark.operators.compound import boosting_topk
    from tests.oracle import OracleIndex

    d, rows = boost_index
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)
    pos, neg, nb, k = "common extra", "bad", 0.3, 12

    cand = set()
    for t in pos.split():
        cand |= set(oi.postings.get(t, {}))
    bad = set(oi.postings.get(neg, {}))
    want = sorted(((oi.score(pos, doc) * (nb if doc in bad else 1.0), doc)
                   for doc in cand), key=lambda x: (-x[0], x[1]))
    # the demotion must actually reorder, or this test proves nothing
    plain = sorted(((oi.score(pos, doc), doc) for doc in cand),
                   key=lambda x: (-x[0], x[1]))
    assert [d_ for _, d_ in want[:k]] != [d_ for _, d_ in plain[:k]]

    for locus in ("kernel", "spark"):
        got = boosting_topk(spark, d, pos, neg, k, negative_boost=nb,
                            locus=locus)
        assert [int(x) for x in got["doc_id"]] == [doc for _, doc
                                                   in want[:k]], locus
        for gs, (ws, _) in zip(got["score"], want):
            assert abs(gs - ws) < 1e-9


def test_boosting_validation(spark, boost_index):
    from mongoesindexer_spark.operators.compound import boosting_topk
    d, _ = boost_index
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_topk(spark, d, "common", "bad", 5, negative_boost=1.5)
    with pytest.raises(ValueError, match="locus"):
        boosting_topk(spark, d, "common", "bad", 5, locus="driver")


def test_constant_score_hits(spark, boost_index):
    from mongoesindexer_spark.operators.compound import constant_score_hits
    from mongoesindexer_spark.operators.topk import get_engine
    from tests.oracle import OracleIndex

    d, rows = boost_index
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)
    eng = get_engine(spark, d)

    got = constant_score_hits(eng, "extra bad", 6, boost=2.5).toPandas()
    cand = sorted(set(oi.postings.get("extra", {}))
                  | set(oi.postings.get("bad", {})))
    assert [int(x) for x in got["doc_id"]] == cand[:6]
    assert (got["score"] == 2.5).all()

    both = constant_score_hits(eng, "extra bad", 50, mode="and").toPandas()
    want = sorted(set(oi.postings.get("extra", {}))
                  & set(oi.postings.get("bad", {})))
    assert [int(x) for x in both["doc_id"]] == want
