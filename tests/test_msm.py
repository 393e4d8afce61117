"""minimum_should_match (ES bool.should m-of-n): property test pinning
WAND == exhaustive == brute force under the clause floor, plus engine
path agreement (kernel / DataFrame / segment fan-out) on the tiny index."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mongoesindexer_spark.functions.encode import (bm25_idf, bm25_tf_norm,
                                                   encode_blocks)
from mongoesindexer_spark.operators.topk import (_TermCursor,
    exhaustive_topk_arrays, wand_topk_arrays)


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=100))
    n_terms = draw(st.integers(min_value=1, max_value=6))
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    doc_lens = rng.randint(1, 50, size=n_docs).astype(np.int64)
    postings = {}
    for t in range(n_terms):
        df = rng.randint(1, n_docs + 1)
        docs = np.sort(rng.choice(n_docs, size=df,
                                  replace=False)).astype(np.int64)
        tfs = rng.randint(1, 6, size=df).astype(np.int64)
        postings[f"t{t}"] = (docs, tfs)
    k = draw(st.integers(1, 20))
    m = draw(st.integers(1, n_terms))
    return doc_lens, postings, k, m


@given(corpus())
@settings(max_examples=150, deadline=None)
def test_msm_wand_equals_exhaustive(data):
    doc_lens, postings, k, m = data
    n_docs = doc_lens.size
    avgdl = float(doc_lens.mean())
    tomb = set(np.flatnonzero(np.arange(n_docs) % 8 == 2).tolist())

    scores = np.zeros(n_docs)
    matched = np.zeros(n_docs, dtype=np.int64)
    term_blocks = {}
    cursors = []
    for t, (docs, tfs) in postings.items():
        idf = float(bm25_idf(docs.size, n_docs))
        scores[docs] += idf * bm25_tf_norm(tfs, doc_lens[docs], avgdl)
        matched[docs] += 1
        blocks = encode_blocks(docs, tfs, doc_lens[docs], avgdl,
                               block_size=8)
        term_blocks[t] = (idf, blocks)
        cursors.append(_TermCursor(idf, blocks, avgdl))

    cand = [d for d in np.flatnonzero(matched >= m) if d not in tomb]
    want = sorted(((scores[d], int(d)) for d in cand),
                  key=lambda x: (-x[0], x[1]))[:k]

    got_w = wand_topk_arrays(cursors, avgdl, k, tombstones=tomb,
                             min_should=m)
    got_ex = exhaustive_topk_arrays(term_blocks, avgdl, k, tombstones=tomb,
                                    min_should=m)
    for got in (got_w, got_ex):
        assert len(got) == len(want)
        for (gs, gd), (ws, wd) in zip(got, want):
            assert gd == wd
            assert abs(gs - ws) < 1e-9


def test_msm_engine_paths_agree(spark, tiny_index):
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, tiny_index)
    q = "udrndau atreq kni"   # high-df tiny-fixture vocab, rich overlap
    kern = eng.topk_wand(q, 10, min_should_match=2)
    assert len(kern) == 10
    seg = eng.topk_wand(q, 10, min_should_match=2, use_segments=True)
    df = eng.topk_df(q, 10, min_should_match=2).toPandas()
    assert list(kern["doc_id"]) == list(seg["doc_id"]) == list(df["doc_id"])
    assert np.allclose(kern["score"], df["score"], atol=1e-9)
    # msm=1 is the plain OR query
    base = eng.topk_wand(q, 10)
    m1 = eng.topk_wand(q, 10, min_should_match=1)
    assert list(base["doc_id"]) == list(m1["doc_id"])
    # every msm=2 hit matches ≥2 terms; msm over n_terms yields nothing
    assert eng.topk_wand(q, 10, min_should_match=99).empty


def test_msm_rejects_and_mode(spark, tiny_index):
    from mongoesindexer_spark.operators.topk import get_engine
    eng = get_engine(spark, tiny_index)
    with pytest.raises(ValueError):
        eng.topk_wand("a b", 5, mode="and", min_should_match=2)
    with pytest.raises(ValueError):
        eng.topk_df("a b", 5, mode="and", min_should_match=2).toPandas()
