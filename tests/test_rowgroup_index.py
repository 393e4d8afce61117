"""Unit coverage for the serving path's resident row-group directory
(`operators/topk._RowGroupIndex`): stats-pruned point reads must be exact
(never miss a present key), tolerate missing stats, and normalize column
order across files written by different writers."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongoesindexer_spark.operators.topk import _RowGroupIndex


def _write(path, df, row_group_size=4, column_order=None):
    if column_order:
        df = df[column_order]
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                   row_group_size=row_group_size)


@pytest.fixture()
def str_files(tmp_path):
    """Two key-sorted files with small row groups over disjoint ranges."""
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    _write(p1, pd.DataFrame({"term": [f"t{i:03d}" for i in range(20)],
                             "df": np.arange(20, dtype=np.int64),
                             "idf": np.linspace(0.1, 2.0, 20)}))
    _write(p2, pd.DataFrame({"term": [f"t{i:03d}" for i in range(20, 40)],
                             "df": np.arange(20, 40, dtype=np.int64),
                             "idf": np.linspace(2.1, 4.0, 20)}),
           column_order=["idf", "term", "df"])  # different physical order
    return [p1, p2]


def test_read_isin_exact_across_files(str_files):
    idx = _RowGroupIndex(str_files, "term")
    got = idx.read_isin(["t003", "t025", "zzz"], ["term", "df"])
    assert sorted(got["term"]) == ["t003", "t025"]
    assert sorted(got["df"]) == [3, 25]
    # row-group pruning actually happened: only 2 of the 10 row groups
    # can contain the two present keys
    hit_rgs = sum(1 for fi, rg, lo, hi in idx.entries
                  if lo is not None and (lo <= "t003" <= hi or lo <= "t025" <= hi))
    assert hit_rgs == 2


def test_read_isin_all_columns_mixed_order(str_files):
    """columns=None must concat files whose physical column order differs
    (base segments are pyarrow-written, delta segments Spark-written)."""
    idx = _RowGroupIndex(str_files, "term")
    got = idx.read_isin(["t001", "t030"])
    assert len(got) == 2
    assert set(got.columns) == {"term", "df", "idf"}


def test_read_range_prefix_scan(str_files):
    idx = _RowGroupIndex(str_files, "term")
    got = idx.read_isin([f"t{i:03d}" for i in range(40)], ["term"])
    assert len(got) == 40
    rng = idx.read_range("t01", "t02", ["term", "df"])
    assert sorted(rng["term"]) == [f"t{i:03d}" for i in range(10, 20)]


def test_read_isin_empty_result(str_files):
    idx = _RowGroupIndex(str_files, "term")
    got = idx.read_isin(["absent"], ["term", "df"])
    assert len(got) == 0
    assert list(got.columns) == ["term", "df"]


def test_int_keys(tmp_path):
    p = str(tmp_path / "ds.parquet")
    _write(p, pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                            "url": [f"u{i}" for i in range(100)]}),
           row_group_size=16)
    idx = _RowGroupIndex([p], "doc_id")
    got = idx.read_isin([0, 55, 99, 1000], ["doc_id", "url"])
    assert sorted(got["doc_id"]) == [0, 55, 99]


def test_missing_stats_row_groups_always_scanned(tmp_path, monkeypatch):
    """Entries without min/max stats must be read (conservative), never
    silently pruned."""
    p = str(tmp_path / "x.parquet")
    _write(p, pd.DataFrame({"term": ["a", "b", "c", "d"],
                            "df": [1, 2, 3, 4]}), row_group_size=2)
    idx = _RowGroupIndex([p], "term")
    idx.entries = [(fi, rg, None, None) for fi, rg, _, _ in idx.entries]
    got = idx.read_isin(["c"], ["term", "df"])
    assert list(got["term"]) == ["c"]


def test_engine_close_releases_resources(spark, tiny_index):
    """get_engine must close the stale engine on snapshot advance: each
    sync otherwise leaks 8 non-daemon threads + one fd per segment file."""
    from mongoesindexer_spark.operators import topk as topk_mod
    from mongoesindexer_spark.operators.topk import get_engine

    eng = get_engine(spark, tiny_index)
    eng.topk_wand("data", 5)
    idxs = list(eng._rg_cache.values())
    assert any(i.files for i in idxs)
    # simulate a snapshot advance: poison the cached version
    eng._version = ("stale",)
    eng2 = get_engine(spark, tiny_index)
    assert eng2 is not eng
    assert eng._rg_cache == {}  # closed
    for i in idxs:
        assert i.files == [] and i._pool is None
    assert len(eng2.topk_wand("data", 5).columns) == 3  # replacement serves
    eng2.close()
    eng2.close()  # idempotent
    topk_mod._ENGINES.pop(tiny_index, None)
