"""Filesystem-seam proof (VERDICT missing #2): the per-file build kernels
(sorted_doc_files, source_files_presorted, rank_and_tokenize_files,
encode_flat_file, Lineage) must run entirely through an EXPLICIT pyarrow
FileSystem — the shape a cluster needs for S3/HDFS index paths — with
output identical to the local-os default."""

import os

import pyarrow.fs as pafs
import pytest


def test_build_through_explicit_local_filesystem(spark, tiny_dir, tmp_path):
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import get_engine

    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))
    fs_idx = str(tmp_path / "idx_fs")
    IndexBuilder(fs_idx, n_buckets=8, block_size=32,
                 filesystem=pafs.LocalFileSystem()).build(spark, pages)
    os_idx = str(tmp_path / "idx_os")
    IndexBuilder(os_idx, n_buckets=8, block_size=32).build(spark, pages)

    e_fs = get_engine(spark, fs_idx)
    e_os = get_engine(spark, os_idx)
    assert e_fs.n_docs == e_os.n_docs and e_fs.avgdl == e_os.avgdl
    for q in ("data", "merge join", "the fast", "zzzzmissing"):
        a = e_fs.topk_wand(q, 10)
        b = e_os.topk_wand(q, 10)
        assert list(a["doc_id"]) == list(b["doc_id"]), q
        assert list(a["score"]) == list(b["score"]), q


def test_lineage_through_explicit_filesystem(tmp_path):
    from mongoesindexer_spark.plans.lineage import Lineage

    fs = pafs.LocalFileSystem()
    lin = Lineage(str(tmp_path / "idx"), fs)
    lin.mark_partition("encode", "f000001", rows=10, blocks=2)
    lin.mark_stage("encode", n_files=1)
    assert lin.done_partitions("encode") == {"f000001"}
    assert lin.stage_complete("encode")
    rows = lin.rows()
    assert any(r.get("partition") == "f000001" and r["rows"] == 10
               for r in rows)
    # a plain-os Lineage over the same dir sees identical state
    lin2 = Lineage(str(tmp_path / "idx"))
    assert lin2.done_partitions("encode") == {"f000001"}
    lin.reset("encode")
    assert lin2.done_partitions("encode") == set()


def test_fsio_atomic_write_hidden_tmp(tmp_path):
    """Rename-safe filesystems must never expose a readable partial: the
    tmp name is dot-prefixed (skipped by Spark and pyarrow discovery)."""
    import pyarrow as pa
    from mongoesindexer_spark.sources import fsio

    t = pa.table({"x": [1, 2, 3]})
    p = str(tmp_path / "out.parquet")
    fsio.write_parquet_atomic(t, p, pafs.LocalFileSystem())
    import pyarrow.parquet as pq
    assert pq.read_table(p).num_rows == 3
    leftovers = [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")]
    assert leftovers == []


def test_fsio_listing_and_size(tmp_path):
    from mongoesindexer_spark.sources import fsio

    (tmp_path / "a.parquet").write_bytes(b"xx")
    (tmp_path / "sub").mkdir()
    fs = pafs.LocalFileSystem()
    assert fsio.listdir(str(tmp_path), fs) == ["a.parquet"]
    assert fsio.listdir(str(tmp_path)) == ["a.parquet"]
    assert fsio.file_size(str(tmp_path / "a.parquet"), fs) == 2


def test_format_version_through_explicit_filesystem(tmp_path):
    """The format marker (control plane) also routes through the seam so a
    remote index root can still refuse stale-format resumes."""
    from mongoesindexer_spark.operators.build_index import (
        INDEX_FORMAT_VERSION, check_format_version, read_format_version,
        write_format_version)

    d = str(tmp_path / "idx")
    fs = pafs.LocalFileSystem()
    assert read_format_version(d, fs) is None
    write_format_version(d, fs)
    assert read_format_version(d, fs) == INDEX_FORMAT_VERSION
    assert read_format_version(d) == INDEX_FORMAT_VERSION  # same bytes
    check_format_version(d, filesystem=fs)
    with pytest.raises(ValueError):
        check_format_version(str(tmp_path / "nope"), filesystem=fs)


def test_lineage_listdir_tolerates_stray_file(tmp_path):
    """A stray regular file where a stage dir should be must read as 'no
    completed partitions', not abort the resume scan."""
    from mongoesindexer_spark.plans.lineage import Lineage

    lin = Lineage(str(tmp_path))
    (tmp_path / "_lineage" / "encode").write_text("junk")
    assert lin.done_partitions("encode") == set()
    assert lin.rows() == []
    for fs in (None, pafs.LocalFileSystem()):
        from mongoesindexer_spark.sources import fsio
        assert fsio.is_dir(str(tmp_path), fs)
        assert not fsio.is_dir(str(tmp_path / "_lineage" / "encode"), fs)
        assert not fsio.is_dir(str(tmp_path / "nope"), fs)


def test_parquet_catalog_rollback(spark, tmp_path):
    """rollback truncates history atomically: later snapshots become
    unreachable, table_exists reverts for snap_id=0, and a rollback of a
    never-created table is a no-op (no stray dirs)."""
    import os

    from mongoesindexer_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path / "cat"))
    df1 = spark.createDataFrame([(1,)], "x long")
    df2 = spark.createDataFrame([(2,)], "x long")
    s1 = cat.append(df1, "t")
    cat.append(df2, "t")
    assert cat.read(spark, "t").count() == 2
    cat.rollback("t", s1)
    assert [r["x"] for r in cat.read(spark, "t").collect()] == [1]
    assert cat.current_snapshot("t") == s1
    # to-zero reverts to nonexistence
    cat.rollback("t", 0)
    assert not cat.table_exists("t")
    # never-created table: no-op, no directory materialized
    cat.rollback("ghost", 0)
    assert not os.path.isdir(str(tmp_path / "cat" / "ghost"))
