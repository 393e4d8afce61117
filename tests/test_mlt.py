"""more_like_this (operators/mlt.py): term selection and end-to-end
similarity page vs the pure-Python oracle on the tiny fixture."""

import numpy as np
import pandas as pd
import pytest


def _resolved(tiny_pages):
    from mongoesindexer_spark.functions.analysis import extract_text
    rows = tiny_pages.sort_values("url").reset_index(drop=True)
    return [t if t is not None else extract_text(h)
            for t, h in zip(rows["text"], rows["html"])]


def _brute_mlt(oracle, text, max_terms, min_tf=1, min_df=1):
    from collections import Counter
    from mongoesindexer_spark.functions.analysis import analyze_index
    tf = Counter(analyze_index(text, oracle.cfg))
    scored = []
    for t, c in tf.items():
        df = len(oracle.postings.get(t, {}))
        if c < min_tf or df < min_df or df == 0:
            continue
        scored.append((c * oracle.idf(t), t))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:max_terms]]


def test_mlt_select_terms_matches_bruteforce(spark, tiny_index, tiny_pages,
                                             oracle_tiny):
    from mongoesindexer_spark.operators.mlt import mlt_select_terms
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, tiny_index)
    texts = _resolved(tiny_pages)
    for seed in (0, 3, 11):
        got = mlt_select_terms(eng, texts[seed], max_query_terms=8)
        assert got == _brute_mlt(oracle_tiny, texts[seed], 8)
    # min_doc_freq gate drops singleton-vocabulary terms (uncapped, so
    # the gate is the only difference)
    loose = mlt_select_terms(eng, texts[0], 10_000, min_doc_freq=1)
    tight = mlt_select_terms(eng, texts[0], 10_000, min_doc_freq=3)
    assert set(tight) <= set(loose)
    assert all(len(oracle_tiny.postings[t]) >= 3 for t in tight)


def test_mlt_topk_matches_bruteforce(spark, tiny_index, tiny_pages,
                                     oracle_tiny):
    from mongoesindexer_spark.operators.mlt import more_like_this_topk
    texts = _resolved(tiny_pages)
    seed, k, mqt = 5, 10, 6
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
    }))
    got = more_like_this_topk(spark, tiny_index, docs, seed, k,
                              max_query_terms=mqt)
    sel = _brute_mlt(oracle_tiny, texts[seed], mqt)
    want = [(d, s) for d, _, s in oracle_tiny.topk(" ".join(sel), k + 1)
            if d != seed][:k]
    assert [int(x) for x in got["doc_id"]] == [d for d, _ in want]
    for gs, (_, ws) in zip(got["score"], want):
        assert abs(gs - ws) < 1e-9
    # seed never in its own page
    assert seed not in set(got["doc_id"])


def test_mlt_validation(spark, tiny_index, tiny_pages):
    from mongoesindexer_spark.operators.mlt import more_like_this_topk
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        more_like_this_topk(spark, tiny_index, docs, 0, 5,
                            max_query_terms=0)
    with pytest.raises(KeyError, match="999"):
        more_like_this_topk(spark, tiny_index, docs, 999, 5)
