"""Property test (SURVEY §5.2-4a): block-max WAND top-k == exhaustive
scoring top-k on random corpora — pure numpy, no Spark, so hypothesis can
hammer it."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mongoesindexer_spark.functions.encode import (
    bm25_idf,
    bm25_tf_norm,
    encode_blocks,
)
from mongoesindexer_spark.operators.topk import (_TermCursor,
    exhaustive_topk_arrays, wand_topk_arrays)


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=120))
    n_terms = draw(st.integers(min_value=1, max_value=8))
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    doc_lens = rng.randint(1, 60, size=n_docs).astype(np.int64)
    postings = {}
    for t in range(n_terms):
        df = rng.randint(1, n_docs + 1)
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.randint(1, 6, size=df).astype(np.int64)
        postings[f"t{t}"] = (docs, tfs)
    q_size = draw(st.integers(1, n_terms))
    k = draw(st.integers(1, 30))
    return doc_lens, postings, [f"t{i}" for i in range(q_size)], k


@given(corpus())
@settings(max_examples=150, deadline=None)
def test_wand_equals_exhaustive(data):
    doc_lens, postings, terms, k = data
    n_docs = doc_lens.size
    avgdl = float(doc_lens.mean())
    tomb = set(np.flatnonzero(np.arange(n_docs) % 7 == 3).tolist())

    # exhaustive reference scorer
    scores = np.zeros(n_docs, dtype=np.float64)
    seen = np.zeros(n_docs, dtype=bool)
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        scores[docs] += idf * bm25_tf_norm(tfs, doc_lens[docs], avgdl)
        seen[docs] = True
    cand = [d for d in np.flatnonzero(seen) if d not in tomb]
    want = sorted(((scores[d], int(d)) for d in cand),
                  key=lambda x: (-x[0], x[1]))[:k]

    # WAND over encoded blocks (small blocks to force skipping)
    cursors = []
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        blocks = encode_blocks(docs, tfs, doc_lens[docs], avgdl, block_size=8)
        cursors.append(_TermCursor(idf, blocks, avgdl))
    got = wand_topk_arrays(cursors, avgdl, k, tombstones=tomb)

    assert len(got) == len(want)
    for (gs, gd), (ws, wd) in zip(got, want):
        assert gd == wd
        assert abs(gs - ws) < 1e-9

    # the vectorized exhaustive scorer (the sub-cutoff serving path) must
    # rank identically to WAND on the same encoded blocks
    term_blocks = {}
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        term_blocks[t] = (idf, encode_blocks(docs, tfs, doc_lens[docs],
                                             avgdl, block_size=8))
    got_ex = exhaustive_topk_arrays(term_blocks, avgdl, k, tombstones=tomb)
    assert len(got_ex) == len(want)
    for (gs, gd), (ws, wd) in zip(got_ex, want):
        assert gd == wd
        assert abs(gs - ws) < 1e-9


@given(corpus())
@settings(max_examples=150, deadline=None)
def test_conjunctive_equals_exhaustive_require_all(data):
    """Zig-zag conjunctive kernel == exhaustive scorer filtered to docs
    containing EVERY query term (J6), on random corpora with tombstones —
    including score equality and doc_id-asc tie ranking."""
    from mongoesindexer_spark.operators.topk import conjunctive_topk_arrays

    doc_lens, postings, terms, k = data
    n_docs = doc_lens.size
    avgdl = float(doc_lens.mean())
    tomb = set(np.flatnonzero(np.arange(n_docs) % 7 == 3).tolist())

    scores = np.zeros(n_docs, dtype=np.float64)
    n_matched = np.zeros(n_docs, dtype=np.int64)
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        scores[docs] += idf * bm25_tf_norm(tfs, doc_lens[docs], avgdl)
        n_matched[docs] += 1
    cand = [d for d in np.flatnonzero(n_matched == len(terms))
            if d not in tomb]
    want = sorted(((scores[d], int(d)) for d in cand),
                  key=lambda x: (-x[0], x[1]))[:k]

    cursors, term_blocks = [], {}
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        blocks = encode_blocks(docs, tfs, doc_lens[docs], avgdl, block_size=8)
        cursors.append(_TermCursor(idf, blocks, avgdl))
        term_blocks[t] = (idf, blocks)

    got = conjunctive_topk_arrays(cursors, avgdl, k, tombstones=tomb)
    assert [(d, round(s, 9)) for s, d in got] == \
        [(d, round(s, 9)) for s, d in want]

    got_ex = exhaustive_topk_arrays(term_blocks, avgdl, k, tombstones=tomb,
                                    require_all=True)
    assert [d for _, d in got_ex] == [d for _, d in want]


@given(corpus(), st.integers(0, 10_000))
@settings(max_examples=150, deadline=None)
def test_filter_context_equals_restricted_exhaustive(data, fseed):
    """ES filter context on the kernels: WAND / exhaustive / conjunctive
    with a random ``allowed`` set == the reference scorer restricted to
    that set, on random corpora with tombstones — including score
    equality, doc_id-asc ties, and the empty-filter edge."""
    from mongoesindexer_spark.operators.topk import conjunctive_topk_arrays

    doc_lens, postings, terms, k = data
    n_docs = doc_lens.size
    avgdl = float(doc_lens.mean())
    tomb = set(np.flatnonzero(np.arange(n_docs) % 7 == 3).tolist())
    frng = np.random.RandomState(fseed)
    allowed_mask = frng.rand(n_docs) < frng.choice([0.0, 0.2, 0.6, 1.0])
    allowed_arr = np.flatnonzero(allowed_mask).astype(np.int64)
    allowed_set = frozenset(allowed_arr.tolist())

    scores = np.zeros(n_docs, dtype=np.float64)
    n_matched = np.zeros(n_docs, dtype=np.int64)
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        scores[docs] += idf * bm25_tf_norm(tfs, doc_lens[docs], avgdl)
        n_matched[docs] += 1

    def ref(require_all: bool):
        need = len(terms) if require_all else 1
        cand = [d for d in np.flatnonzero(n_matched >= need)
                if d not in tomb and d in allowed_set]
        return sorted(((scores[d], int(d)) for d in cand),
                      key=lambda x: (-x[0], x[1]))[:k]

    cursors, cursors2, term_blocks = [], [], {}
    for t in terms:
        docs, tfs = postings[t]
        idf = float(bm25_idf(docs.size, n_docs))
        blocks = encode_blocks(docs, tfs, doc_lens[docs], avgdl, block_size=8)
        cursors.append(_TermCursor(idf, blocks, avgdl))
        cursors2.append(_TermCursor(idf, blocks, avgdl))
        term_blocks[t] = (idf, blocks)

    def check(got, want):
        assert len(got) == len(want)
        for (gs, gd), (ws, wd) in zip(got, want):
            assert gd == wd
            assert abs(gs - ws) < 1e-9

    check(wand_topk_arrays(cursors, avgdl, k, tombstones=tomb,
                           allowed=allowed_set), ref(False))
    check(exhaustive_topk_arrays(term_blocks, avgdl, k, tombstones=tomb,
                                 allowed=allowed_arr), ref(False))
    check(conjunctive_topk_arrays(cursors2, avgdl, k, tombstones=tomb,
                                  allowed=allowed_set), ref(True))
