"""IcebergCatalog surface pinning (mock-based — no Iceberg jar ships in
this sandbox): every catalog-seam method must emit exactly the Iceberg
public API / SQL a real cluster would need, so swapping ParquetCatalog →
IcebergCatalog is a constructor change, not a port."""

from unittest import mock

from mongoesindexer_spark.sources.catalog import IcebergCatalog


def _cat():
    spark = mock.MagicMock(name="spark")
    return IcebergCatalog(spark, "lake.idx"), spark


def test_table_exists_and_drop():
    cat, spark = _cat()
    spark.catalog.tableExists.return_value = True
    assert cat.table_exists("term_dict")
    spark.catalog.tableExists.assert_called_once_with("lake.idx.term_dict")
    cat.drop_table("term_dict")
    spark.sql.assert_called_with("DROP TABLE IF EXISTS lake.idx.term_dict")


def test_append_existing_uses_writeTo_append():
    cat, spark = _cat()
    spark.catalog.tableExists.return_value = True
    spark.sql.return_value.collect.return_value = [(77,)]
    df = mock.MagicMock(name="df")
    assert cat.append(df, "postings_flat") == 77
    df.writeTo.assert_called_once_with("lake.idx.postings_flat")
    df.writeTo.return_value.append.assert_called_once_with()


def test_append_missing_creates_iceberg_table():
    cat, spark = _cat()
    spark.catalog.tableExists.return_value = False
    spark.sql.return_value.collect.return_value = [(1,)]
    df = mock.MagicMock(name="df")
    cat.append(df, "doc_stats")
    df.writeTo.return_value.using.assert_called_once_with("iceberg")
    df.writeTo.return_value.using.return_value.create.assert_called_once_with()


def test_overwrite_is_createOrReplace():
    cat, spark = _cat()
    spark.sql.return_value.collect.return_value = [(9,)]
    df = mock.MagicMock(name="df")
    assert cat.overwrite(df, "term_dict") == 9
    df.writeTo.return_value.using.return_value.createOrReplace \
        .assert_called_once_with()


def test_register_external_calls_add_files():
    """Executor-written segments are ADOPTED (add_files), never rewritten
    — committing a 100 TB index must not copy it."""
    cat, spark = _cat()
    spark.catalog.tableExists.return_value = False
    spark.sql.return_value.collect.return_value = [(3,)]
    cat.register_external("/idx/segments/base", "postings_blocks")
    calls = [c.args[0] for c in spark.sql.call_args_list]
    assert any("CALL lake.system.add_files(" in c
               and "table => 'lake.idx.postings_blocks'" in c
               and "`parquet`.`/idx/segments/base`" in c for c in calls)


def test_time_travel_read_sets_snapshot_option():
    cat, spark = _cat()
    rd = mock.MagicMock(name="reader")
    spark.read = rd
    cat.read(spark, "postings_flat", as_of=123)
    rd.option.assert_called_once_with("snapshot-id", "123")
    rd.option.return_value.table.assert_called_once_with(
        "lake.idx.postings_flat")


def test_incremental_scan_uses_start_snapshot_id():
    """The Iceberg incremental scan IS the change-stream resume token."""
    cat, spark = _cat()
    cat.read_incremental(spark, "postings_flat", since=41)
    fmt = spark.read.format
    fmt.assert_called_once_with("iceberg")
    fmt.return_value.option.assert_called_once_with(
        "start-snapshot-id", "41")
    fmt.return_value.option.return_value.load.assert_called_once_with(
        "lake.idx.postings_flat")


def test_data_files_lists_files_metadata_table():
    cat, spark = _cat()
    spark.sql.return_value.collect.return_value = [("/a.parquet",),
                                                   ("/b.parquet",)]
    assert cat.data_files("postings_blocks") == ["/a.parquet", "/b.parquet"]
    spark.sql.assert_called_with(
        "SELECT file_path FROM lake.idx.postings_blocks.files")


def test_rollback_calls_rollback_to_snapshot():
    cat, spark = _cat()
    cat.rollback("doc_stats", 42)
    spark.sql.assert_called_with(
        "CALL lake.system.rollback_to_snapshot(table => "
        "'lake.idx.doc_stats', snapshot_id => 42)")


def test_rollback_to_zero_drops_table():
    cat, spark = _cat()
    cat.rollback("sync_log", 0)
    spark.sql.assert_called_with("DROP TABLE IF EXISTS lake.idx.sync_log")


def test_current_snapshot_zero_for_missing_table():
    """The sync journal snapshots tables a fresh index lacks; a missing
    table must read as snapshot 0 (ParquetCatalog parity), not raise."""
    cat, spark = _cat()
    spark.catalog.tableExists.return_value = False
    assert cat.current_snapshot("tombstones") == 0
    spark.sql.assert_not_called()
