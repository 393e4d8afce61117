"""ES ``exists`` query in filter context (operators/topk.py
ExistsClause): docs carrying a non-null doc value for a sub-field,
rank-identical through every serving path on a corpus where some docs
genuinely lack the field (the driver gate's corpus is null-free, so
this surface is pinned here)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ex_index(spark, tmp_path_factory):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    d = str(tmp_path_factory.mktemp("idx-exists"))
    rows = []
    for i in range(20):
        tag = f"t{i % 3}" if i % 4 != 0 else None       # 5 docs lack tag
        pop = (i + 1) * 3 if i % 5 != 0 else None       # 4 docs lack pop
        rows.append((f"u{i:02d}", "common " + ("extra " * (i % 3))
                     + f"w{i}", tag, pop))
    df = spark.createDataFrame(
        rows, "url string, text string, tag string, pop long")
    IndexBuilder(d, n_buckets=2, block_size=8, keyword_fields=("tag",),
                 numeric_fields=("pop",)).build(spark, df)
    return d, rows


def test_exists_filter_all_paths(spark, ex_index):
    from mongoesindexer_spark.operators.topk import ExistsClause, \
        get_engine
    d, rows = ex_index
    eng = get_engine(spark, d)
    # doc_id = rank of url asc = insertion order here
    has_tag = [i for i, r in enumerate(rows) if r[2] is not None]
    base = eng.topk_wand("common extra", 50)
    want = base[base["doc_id"].isin(has_tag)].head(10)

    flt = dict(filter_field="tag", filter_value=ExistsClause())
    w = eng.topk_wand("common extra", 10, **flt)
    e = eng.topk_wand("common extra", 10, use_wand=False, **flt)
    s = eng.topk_wand("common extra", 10, use_segments=True, **flt)
    df_ = eng.topk_df("common extra", 10, **flt).toPandas()
    for got in (w, e, s, df_):
        assert [int(x) for x in got["doc_id"]] \
            == [int(x) for x in want["doc_id"]]
        assert [round(float(x), 9) for x in got["score"]] \
            == [round(float(x), 9) for x in want["score"]]


def test_exists_numeric_kind(spark, ex_index):
    from mongoesindexer_spark.operators.topk import ExistsClause, \
        get_engine
    d, rows = ex_index
    eng = get_engine(spark, d)
    has_pop = {i for i, r in enumerate(rows) if r[3] is not None}
    got = eng.topk_wand("common", 50, filter_field="pop",
                        filter_value=ExistsClause(kind="num"))
    assert set(int(x) for x in got["doc_id"]) <= has_pop
    assert len(got) == len(has_pop)   # every pop-carrying doc matches


def test_exists_validation(spark, ex_index):
    from mongoesindexer_spark.operators.topk import ExistsClause, \
        get_engine
    d, _ = ex_index
    eng = get_engine(spark, d)
    with pytest.raises(ValueError, match="kind"):
        eng.topk_wand("common", 5, filter_field="tag",
                      filter_value=ExistsClause(kind="text"))
    with pytest.raises(KeyError, match="nope"):
        eng.topk_wand("common", 5, filter_field="nope",
                      filter_value=ExistsClause())


def test_missing_agg(spark, ex_index):
    """ES missing agg == |hits| − |exists bucket| on the null-bearing
    fixture (the gate corpus is null-free, so this pins the surface)."""
    from mongoesindexer_spark.operators.aggs import (match_set,
                                                     search_missing_agg)
    from mongoesindexer_spark.operators.topk import get_engine
    import pytest as _pt
    d, rows = ex_index
    eng = get_engine(spark, d)
    hits = {i for i, r in enumerate(rows)
            if "common" in r[1].split() or "extra" in r[1].split()}
    want_tag = sum(1 for i in hits if rows[i][2] is None)
    got = search_missing_agg(eng, "common extra", "tag").toPandas()
    assert int(got["doc_count"].iloc[0]) == want_tag
    want_pop = sum(1 for i in hits if rows[i][3] is None)
    gp = search_missing_agg(eng, "common extra", "pop",
                            kind="num").toPandas()
    assert int(gp["doc_count"].iloc[0]) == want_pop
    # empty hit set counts 0, not NULL
    ge = search_missing_agg(eng, "zzznope", "tag").toPandas()
    assert int(ge["doc_count"].iloc[0]) == 0
    with _pt.raises(ValueError):
        search_missing_agg(eng, "common", "tag", kind="text")
