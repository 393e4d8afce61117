"""ES rescore (operators/rescore.py): window re-ranking vs brute force
on a controlled positional corpus — every score_mode, the window cut,
the non-matching-doc passthrough, and validation."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rs_index(spark, tmp_path_factory):
    """Corpus where the phrase rescorer genuinely reorders the match
    page: every doc matches 'common'; some contain the phrase 'alpha
    beta', some contain the words separated, some lack them."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-rescore"))
    rows = []
    for i in range(18):
        if i % 3 == 0:
            body = f"common alpha beta w{i}"           # phrase match
        elif i % 3 == 1:
            body = f"common alpha w{i} beta"           # words, no phrase
        else:
            body = f"common w{i} filler extra"
        rows.append((f"u{i:02d}", body))
    df = spark.createDataFrame(rows, "url string, text string")
    IndexBuilder(d, n_buckets=2, block_size=8,
                 index_positions=True).build(spark, df)
    return d, rows


def _brute(rows, query, phrase, k, window, qw, rw, mode):
    import pandas as pd
    from tests.oracle import OracleIndex
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    pdf["html"] = None
    oi = OracleIndex.build(pdf)
    prim = oi.topk(query, window)
    pterms = phrase.split()
    idf_sum = sum(oi.idf(t) for t in pterms)
    out = []
    for d, _, p in prim:
        ptf = oi.phrase_freq(pterms, d)
        if ptf > 0:
            dl = oi.doc_len[d]
            tfn = ptf * 2.2 / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / oi.avgdl))
            s = idf_sum * tfn
            if mode == "total":
                f = qw * p + rw * s
            elif mode == "multiply":
                f = (qw * p) * (rw * s)
            elif mode == "max":
                f = max(qw * p, rw * s)
            elif mode == "min":
                f = min(qw * p, rw * s)
            else:
                f = (qw * p + rw * s) / 2.0
        else:
            f = qw * p if mode != "total" else qw * p + 0.0
        out.append((f, d))
    out.sort(key=lambda x: (-x[0], x[1]))
    return out[:k]


@pytest.mark.parametrize("mode", ["total", "multiply", "max", "min", "avg"])
def test_rescore_matches_bruteforce(spark, rs_index, mode):
    from mongoesindexer_spark.operators.rescore import rescore_topk
    d, rows = rs_index
    # qw != 1 so the weight's application (e.g. inside multiply) is
    # actually exercised, not multiplied away
    got = rescore_topk(spark, d, "common alpha", "alpha beta", 10,
                       window_size=18, query_weight=0.5,
                       rescore_query_weight=3.0, score_mode=mode)
    want = _brute(rows, "common alpha", "alpha beta", 10, 18, 0.5, 3.0,
                  mode)
    assert [int(x) for x in got["doc_id"]] == [d_ for _, d_ in want], mode
    for gs, (ws, _) in zip(got["score"], want):
        assert abs(gs - ws) < 1e-9


def test_rescore_reorders_and_window_cuts(spark, rs_index):
    from mongoesindexer_spark.operators.rescore import rescore_topk
    from mongoesindexer_spark.operators.topk import get_engine
    d, rows = rs_index
    eng = get_engine(spark, d)
    plain = eng.topk_wand("common alpha", 10)
    resc = rescore_topk(spark, d, "common alpha", "alpha beta", 10,
                        window_size=18, rescore_query_weight=3.0)
    assert list(plain["doc_id"]) != list(resc["doc_id"])
    # phrase docs (i % 3 == 0 among 'alpha' matchers) float to the top
    top = int(resc["doc_id"].iloc[0])
    assert "alpha beta" in rows[  # doc_id = rank of url asc = i
        top][1]
    # narrow window: only window docs are eligible for the page
    narrow = rescore_topk(spark, d, "common alpha", "alpha beta", 3,
                          window_size=3, rescore_query_weight=3.0)
    assert set(narrow["doc_id"]) <= set(plain["doc_id"].head(3))


def test_phrase_allowed_docs_segment_path_identical(spark, rs_index):
    """The rescore-window whitelist through the segment fan-out equals
    the driver kernel (group slices partition the global set)."""
    from mongoesindexer_spark.operators.topk import get_engine
    d, _ = rs_index
    eng = get_engine(spark, d)
    window = eng.topk_wand("common alpha", 12)["doc_id"] \
        .to_numpy("int64")
    kern = eng.phrase_topk("alpha beta", 12, allowed_docs=window,
                           use_segments=False)
    segs = eng.phrase_topk("alpha beta", 12, allowed_docs=window,
                           use_segments=True)
    assert list(kern["doc_id"]) == list(segs["doc_id"])
    assert np.allclose(kern["score"], segs["score"])
    assert len(kern) > 0
    assert set(kern["doc_id"]) <= set(window.tolist())


def test_rescore_validation(spark, rs_index):
    from mongoesindexer_spark.operators.rescore import rescore_topk
    d, _ = rs_index
    with pytest.raises(ValueError, match="score_mode"):
        rescore_topk(spark, d, "common", "alpha beta", 5,
                     score_mode="sum")


def test_rescore_window_smaller_than_k(spark, rs_index):
    """ES allows window_size < k: only the window is re-ranked; hits
    below it keep primary score and order after the rescored window."""
    from mongoesindexer_spark.operators.rescore import rescore_topk
    from mongoesindexer_spark.operators.topk import get_engine
    d, rows = rs_index
    eng = get_engine(spark, d)
    prim = eng.topk_wand("common alpha", 10)
    got = rescore_topk(spark, d, "common alpha", "alpha beta", 10,
                       window_size=4, rescore_query_weight=3.0)
    assert len(got) == 10
    # head = the 4 window docs (re-ranked); tail = primary order below
    assert set(got["doc_id"].head(4)) == set(prim["doc_id"].head(4))
    tail_got = got.iloc[4:]
    tail_prim = prim.iloc[4:10]
    assert list(tail_got["doc_id"]) == list(tail_prim["doc_id"])
    assert np.allclose(tail_got["score"], tail_prim["score"])
