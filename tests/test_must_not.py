"""ES ``bool.must_not`` in filter context (operators/topk.py
MustNotClause): exclude docs matching the inner clause — the complement
of the equivalent positive filter, non-scoring, with NULL/absent
sub-fields SURVIVING the exclusion (ES semantics; the reference's
mappings invite the shape, e.g. deleted:false exclusions,
configs/ltd_doc.settings.json:164).

Contract under test: must_not top-k == the unfiltered ranking minus the
inner clause's matching docs, truncated to k — identical through every
serving path (WAND / exhaustive / segment fan-out / DataFrame), for
term, terms-list, range, and exists inner clauses.
"""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def mn_index(spark, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-mustnot"))
    rows = []
    for i in range(24):
        tag = f"t{i % 3}" if i % 4 != 0 else None       # 6 docs lack tag
        pop = (i + 1) * 3 if i % 5 != 0 else None       # 5 docs lack pop
        rows.append((f"u{i:02d}", "common " + ("extra " * (i % 3))
                     + f"w{i}", tag, pop))
    df = spark.createDataFrame(
        rows, "url string, text string, tag string, pop long")
    IndexBuilder(d, n_buckets=2, block_size=8, keyword_fields=("tag",),
                 numeric_fields=("pop",)).build(spark, df)
    return d, rows


def _all_paths(eng, q, k, **flt):
    w = eng.topk_wand(q, k, **flt)
    e = eng.topk_wand(q, k, use_wand=False, **flt)
    s = eng.topk_wand(q, k, use_segments=True, **flt)
    d = eng.topk_df(q, k, **flt).toPandas()
    return w, e, s, d


def _assert_contract(eng, q, k, keep_ids, **flt):
    base = eng.topk_wand(q, 100)
    want = base[base["doc_id"].isin(keep_ids)].head(k)
    assert len(want) > 0
    for got in _all_paths(eng, q, k, **flt):
        assert [int(x) for x in got["doc_id"]] \
            == [int(x) for x in want["doc_id"]]
        assert [round(float(x), 9) for x in got["score"]] \
            == [round(float(x), 9) for x in want["score"]]


def test_must_not_term_null_survives(spark, mn_index):
    """must_not term: matching docs drop; NULL-sub-field docs stay."""
    from mongoesindexer_spark.operators.topk import MustNotClause, \
        get_engine
    d, rows = mn_index
    eng = get_engine(spark, d)
    keep = [i for i, r in enumerate(rows) if r[2] != "t1"]  # incl. NULLs
    assert any(rows[i][2] is None for i in keep)
    _assert_contract(eng, "common extra", 10, keep,
                     filter_field="tag", filter_value=MustNotClause("t1"))


def test_must_not_terms_list(spark, mn_index):
    """must_not terms: docs matching ANY listed value drop."""
    from mongoesindexer_spark.operators.topk import MustNotClause, \
        get_engine
    d, rows = mn_index
    eng = get_engine(spark, d)
    keep = [i for i, r in enumerate(rows) if r[2] not in ("t0", "t2")]
    _assert_contract(eng, "common extra", 10, keep,
                     filter_field="tag",
                     filter_value=MustNotClause(["t0", "t2"]))


def test_must_not_range(spark, mn_index):
    """must_not range: in-range docs drop; NULL numeric values stay."""
    from mongoesindexer_spark.operators.topk import MustNotClause, \
        RangeClause, get_engine
    d, rows = mn_index
    eng = get_engine(spark, d)
    keep = [i for i, r in enumerate(rows)
            if r[3] is None or not (12 <= r[3] <= 45)]
    assert any(rows[i][3] is None for i in keep)
    _assert_contract(eng, "common extra", 10, keep,
                     filter_field="pop",
                     filter_value=MustNotClause(RangeClause(12, 45)))


def test_must_not_exists_is_missing(spark, mn_index):
    """must_not exists == ES 'field is missing': only NULL-sub-field
    docs remain."""
    from mongoesindexer_spark.operators.topk import ExistsClause, \
        MustNotClause, get_engine
    d, rows = mn_index
    eng = get_engine(spark, d)
    keep = [i for i, r in enumerate(rows) if r[2] is None]
    _assert_contract(eng, "common extra", 10, keep,
                     filter_field="tag",
                     filter_value=MustNotClause(ExistsClause()))


def test_must_not_phrase_path(spark, mn_index):
    """must_not composes with the positional phrase serving path."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import MustNotClause, \
        get_engine
    import pyspark.sql.functions as F  # noqa: F401
    d, rows = mn_index
    # rebuild with positions for the phrase kernel
    import os
    d2 = d + "-pos"
    if not os.path.exists(d2):
        df = spark.createDataFrame(
            rows, "url string, text string, tag string, pop long")
        IndexBuilder(d2, n_buckets=2, block_size=8,
                     keyword_fields=("tag",), index_positions=True
                     ).build(spark, df)
    eng = get_engine(spark, d2)
    base = eng.phrase_topk("common extra", 20)
    keep = {i for i, r in enumerate(rows) if r[2] != "t1"}
    want = base[base["doc_id"].isin(keep)].head(10)
    for seg in (False, True):
        got = eng.phrase_topk("common extra", 10, use_segments=seg,
                              filter_field="tag",
                              filter_value=MustNotClause("t1"))
        assert [int(x) for x in got["doc_id"]] \
            == [int(x) for x in want["doc_id"]], seg
        assert [round(float(x), 9) for x in got["score"]] \
            == [round(float(x), 9) for x in want["score"]], seg


def test_must_not_normalized_folding(spark, mn_index):
    """filter_normalized folds the inner value through the analyzer,
    same as the positive filter."""
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import MustNotClause, \
        get_engine
    import os
    d, rows = mn_index
    d3 = d + "-norm"
    if not os.path.exists(d3):
        nrows = [(u, t, tag.upper() if tag else None, p)
                 for u, t, tag, p in rows]
        df = spark.createDataFrame(
            nrows, "url string, text string, tag string, pop long")
        IndexBuilder(d3, n_buckets=2, block_size=8,
                     keyword_fields=("tag",)).build(spark, df)
    eng = get_engine(spark, d3)
    keep = [i for i, r in enumerate(rows) if r[2] != "t1"]
    base = eng.topk_wand("common extra", 100)
    want = base[base["doc_id"].isin(keep)].head(10)
    got = eng.topk_wand("common extra", 10, filter_field="tag",
                        filter_value=MustNotClause("T1"),
                        filter_normalized=True)
    assert [int(x) for x in got["doc_id"]] \
        == [int(x) for x in want["doc_id"]]
