"""multi_match (ES best_fields / most_fields over per-field indexes):

- property test: WAND kernel == exhaustive kernel == brute-force python
  combiner on random two-field corpora (rank + score, tombstones, boosts);
- engine test: two real indexes (body + title) over the tiny fixture,
  kernel locus vs a pure-python per-field oracle, spark locus vs kernel,
  boosts, and the tie_breaker soundness guard.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mongoesindexer_spark.functions.encode import bm25_idf, bm25_tf_norm, \
    encode_blocks
from mongoesindexer_spark.operators.multi_match import (
    combine_matrix, combine_scalar, multimatch_exhaustive_arrays,
    multimatch_wand_arrays)
from mongoesindexer_spark.operators.topk import _TermCursor


@st.composite
def two_field_corpus(draw):
    n_docs = draw(st.integers(min_value=1, max_value=100))
    rng = np.random.RandomState(draw(st.integers(0, 10_000)))
    fields = []
    for _f in range(2):
        n_terms = draw(st.integers(min_value=1, max_value=5))
        doc_lens = rng.randint(1, 50, size=n_docs).astype(np.int64)
        postings = {}
        for t in range(n_terms):
            df = rng.randint(1, n_docs + 1)
            docs = np.sort(rng.choice(n_docs, size=df,
                                      replace=False)).astype(np.int64)
            tfs = rng.randint(1, 6, size=df).astype(np.int64)
            postings[f"t{t}"] = (docs, tfs)
        fields.append((doc_lens, postings))
    k = draw(st.integers(1, 25))
    mtype = draw(st.sampled_from(["best_fields", "most_fields"]))
    tb = draw(st.sampled_from([0.0, 0.3, 1.0]))
    boost = draw(st.sampled_from([1.0, 2.0]))
    return n_docs, fields, k, mtype, tb, boost


@given(two_field_corpus())
@settings(max_examples=120, deadline=None)
def test_multimatch_wand_equals_exhaustive(data):
    n_docs, fields, k, mtype, tb, boost = data
    tomb = set(np.flatnonzero(np.arange(n_docs) % 9 == 4).tolist())
    boosts = [1.0, boost]

    field_blocks = []
    field_cursors = []
    per_field_maps = []       # brute reference: field -> {doc: score}
    for f, (doc_lens, postings) in enumerate(fields):
        avgdl = float(doc_lens.mean())
        tbks = {}
        cursors = []
        fmap: dict[int, float] = {}
        for t, (docs, tfs) in postings.items():
            idf = float(bm25_idf(docs.size, n_docs)) * boosts[f]
            blocks = encode_blocks(docs, tfs, doc_lens[docs], avgdl,
                                   block_size=8)
            tbks[t] = (idf, blocks)
            cursors.append(_TermCursor(idf, blocks, avgdl))
            contrib = idf * bm25_tf_norm(tfs, doc_lens[docs], avgdl)
            for d, c in zip(docs.tolist(), contrib.tolist()):
                fmap[d] = fmap.get(d, 0.0) + c
        field_blocks.append((tbks, avgdl))
        field_cursors.append((avgdl, cursors))
        per_field_maps.append(fmap)

    cand = (set(per_field_maps[0]) | set(per_field_maps[1])) - tomb
    want = sorted(
        ((combine_scalar([m.get(d, 0.0) for m in per_field_maps],
                         mtype, tb), d) for d in cand),
        key=lambda x: (-x[0], x[1]))[:k]

    got_ex = multimatch_exhaustive_arrays(field_blocks, k, mtype, tb, tomb)
    got_w = multimatch_wand_arrays(field_cursors, k, mtype, tb, tomb)

    for got in (got_ex, got_w):
        assert len(got) == len(want)
        for (gs, gd), (ws, wd) in zip(got, want):
            assert gd == wd
            assert abs(gs - ws) < 1e-9


def test_combine_matrix_matches_scalar():
    rng = np.random.RandomState(7)
    mat = rng.rand(50, 3) * rng.randint(0, 2, size=(50, 3))
    for mtype in ("best_fields", "most_fields"):
        for tb in (0.0, 0.4, 1.0):
            vec = combine_matrix(mat, mtype, tb)
            for i in range(mat.shape[0]):
                assert vec[i] == combine_scalar(list(mat[i]), mtype, tb)


def test_tie_breaker_guard():
    with pytest.raises(ValueError):
        multimatch_wand_arrays([], 5, "best_fields", 1.5)


# ---------------------------------------------------------------------------
# end-to-end over two real indexes sharing one doc_id space
# ---------------------------------------------------------------------------


def _title_of(text: str) -> str:
    return " ".join(text.split()[:5])


@pytest.fixture(scope="module")
def two_field_index(spark, tiny_pages, tmp_path_factory):
    from mongoesindexer_spark.functions.analysis import extract_text
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    resolved = tiny_pages.copy()
    resolved["text"] = [
        t if t is not None else extract_text(h)
        for t, h in zip(resolved["text"], resolved["html"])]
    resolved["html"] = None   # kept for OracleIndex.build's schema

    body_dir = str(tmp_path_factory.mktemp("idx-body"))
    IndexBuilder(body_dir, n_buckets=4, block_size=32).build(
        spark, spark.createDataFrame(resolved.drop(columns=["html"])))

    titles = resolved.drop(columns=["html"]).copy()
    titles["text"] = titles["text"].map(_title_of)
    title_dir = str(tmp_path_factory.mktemp("idx-title"))
    IndexBuilder(title_dir, n_buckets=4, block_size=32).build(
        spark, spark.createDataFrame(titles))
    return resolved, {"body": body_dir, "title": title_dir}


def _py_oracle(resolved: pd.DataFrame, query: str, k: int, mtype: str,
               tb: float, boosts: dict[str, float]) -> list[tuple[int, float]]:
    from tests.oracle import OracleIndex

    body = OracleIndex.build(resolved)
    tdf = resolved.copy()
    tdf["text"] = tdf["text"].map(_title_of)
    title = OracleIndex.build(tdf)
    cand = set()
    for oi in (body, title):
        from mongoesindexer_spark.functions.analysis import analyze_search
        for t in set(analyze_search(query, oi.cfg)):
            cand |= set(oi.postings.get(t, {}))
    rows = []
    for d in cand:
        pf = [boosts.get("body", 1.0) * body.score(query, d),
              boosts.get("title", 1.0) * title.score(query, d)]
        rows.append((combine_scalar(pf, mtype, tb), d))
    rows.sort(key=lambda x: (-x[0], x[1]))
    return [(d, s) for s, d in rows[:k]]


@pytest.mark.parametrize("mtype,tb,boosts", [
    ("best_fields", 0.3, {}),
    ("best_fields", 0.0, {"title": 2.0}),
    ("most_fields", 0.0, {}),
])
def test_multi_match_kernel_vs_oracle(spark, two_field_index, mtype, tb,
                                      boosts):
    from mongoesindexer_spark.operators.multi_match import multi_match_topk

    resolved, dirs = two_field_index
    query = "the spark index"
    k = 10
    want = _py_oracle(resolved, query, k, mtype, tb, boosts)
    for use_wand in (False, True):
        got = multi_match_topk(spark, dirs, query, k, mtype, tb, boosts,
                               locus="kernel", use_wand=use_wand)
        assert [int(d) for d in got["doc_id"]] == [d for d, _ in want]
        for gs, (_, ws) in zip(got["score"], want):
            # boost folds into idf engine-side but multiplies the field
            # score in this oracle — equal up to float distributivity
            assert abs(gs - ws) < 1e-9


def test_multi_match_spark_locus_matches_kernel(spark, two_field_index):
    from mongoesindexer_spark.operators.multi_match import multi_match_topk

    _, dirs = two_field_index
    for mtype, tb in (("best_fields", 0.4), ("most_fields", 0.0)):
        kern = multi_match_topk(spark, dirs, "the spark index", 8, mtype,
                                tb, {"title": 1.5}, locus="kernel")
        dist = multi_match_topk(spark, dirs, "the spark index", 8, mtype,
                                tb, {"title": 1.5}, locus="spark")
        assert list(kern["doc_id"]) == list(dist["doc_id"])
        assert list(kern["url"]) == list(dist["url"])
        assert np.allclose(kern["score"], dist["score"], atol=1e-9)


def test_multi_match_rejects_bad_args(spark, two_field_index):
    from mongoesindexer_spark.operators.multi_match import multi_match_topk

    _, dirs = two_field_index
    with pytest.raises(ValueError):
        multi_match_topk(spark, dirs, "x", 5, mtype="cross_fields")
    with pytest.raises(ValueError):
        multi_match_topk(spark, dirs, "x", 5, locus="driver")


def test_multi_match_alignment_survives_sync(spark, tmp_path):
    """Per-field indexes share a doc_id space only if every generation
    ingests the same (url → id) stream: build body+title from one
    corpus, apply the SAME change batch to both, and multi_match on the
    merged state must equal a brute force over the post-sync corpus
    (deterministic rank-offset ids keep the two indexes aligned)."""
    import datetime as _dt

    import numpy as np

    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.multi_match import (combine_scalar,
        multi_match_topk)
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer
    from tests.oracle import OracleIndex

    t0 = _dt.datetime(2025, 1, 1)
    t1 = _dt.datetime(2025, 2, 1)
    corpus = {f"u{i}": f"common w{i} title{i} body body{i} extra"
              for i in range(10)}

    def _pages(d):
        return spark.createDataFrame(
            [(u, t0, None, t, "en") for u, t in sorted(d.items())],
            "url string, warc_ts timestamp, html binary, text string, "
            "lang string")

    body_dir = str(tmp_path / "body")
    title_dir = str(tmp_path / "title")
    IndexBuilder(body_dir, n_buckets=2).build(spark, _pages(corpus))
    titles = {u: _title_of(t) for u, t in corpus.items()}
    IndexBuilder(title_dir, n_buckets=2).build(spark, _pages(titles))

    # one change batch, applied to BOTH field indexes (title derives)
    changes = [("insert", "u10", "common fresh doc title10 body"),
               ("update", "u3", "common changed w3new title3 body"),
               ("delete", "u7", None)]
    for d, derive in ((body_dir, lambda t: t),
                      (title_dir, lambda t: _title_of(t) if t else None)):
        upd = spark.createDataFrame(
            [(op, u, t1, None, derive(t), "en") for op, u, t in changes],
            "op string, url string, warc_ts timestamp, html binary, "
            "text string, lang string")
        IncrementalIndexer(d).apply_updates(spark, upd, batch_id="b1")

    after = dict(corpus)
    after["u10"] = "common fresh doc title10 body"
    after["u3"] = "common changed w3new title3 body"
    del after["u7"]

    # brute force over the post-sync corpus (scores per field from
    # oracle indexes REBUILT on the merged state; url-keyed compare —
    # doc_ids differ from the fresh-build oracle's by design)
    bdf = __import__("pandas").DataFrame(
        {"url": sorted(after), "text": [after[u] for u in sorted(after)],
         "html": None})
    body_o = OracleIndex.build(bdf)
    tdf = bdf.copy()
    tdf["text"] = tdf["text"].map(_title_of)
    title_o = OracleIndex.build(tdf)
    q = "common title3"
    cand = set()
    for oi in (body_o, title_o):
        from mongoesindexer_spark.functions.analysis import analyze_search
        for t in set(analyze_search(q, oi.cfg)):
            cand |= set(oi.postings.get(t, {}))
    want = sorted(
        ((combine_scalar([body_o.score(q, d), title_o.score(q, d)],
                         "best_fields", 0.3), body_o.urls[d])
         for d in cand), key=lambda x: (-x[0], x[1]))

    got = multi_match_topk(spark, {"body": body_dir, "title": title_dir},
                           q, 20, "best_fields", 0.3)
    assert list(got["url"]) == [u for _, u in want[:20]]
    for gs, (ws, _) in zip(got["score"], want):
        assert abs(gs - ws) < 1e-9


def test_multi_match_entry_validation(spark, two_field_index):
    """Review fix: tie_breaker and empty-engines validation at BOTH
    entry points, not just inside the WAND kernel."""
    from mongoesindexer_spark.operators.multi_match import (multi_match_df,
        multi_match_topk)
    _, dirs = two_field_index
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_topk(spark, dirs, "x", 5, tie_breaker=1.5)
    with pytest.raises(ValueError, match="at least one"):
        multi_match_topk(spark, {}, "x", 5)
    with pytest.raises(ValueError, match="at least one"):
        multi_match_df({}, "x", 5)
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_topk(spark, dirs, "x", 5, tie_breaker=-0.1,
                         locus="spark")
