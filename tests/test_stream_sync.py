"""Structured Streaming sync (ST1-ST4): draining a file stream of change
batches through foreachBatch must equal the direct incremental apply, and
restarting the stream from the checkpoint must not re-apply batches."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.slow
def test_stream_sync_equals_batch_apply(spark, tiny_index, tiny_dir,
                                        tmp_path_factory):
    from mongoesindexer_spark.operators.topk import bm25_topk_wand
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    from mongoesindexer_spark.streaming.stream_sync import stream_sync

    base = tmp_path_factory.mktemp("stream")
    idx = str(base / "idx")
    shutil.copytree(tiny_index, idx)
    updates_dir = str(base / "updates")
    ckpt = str(base / "ckpt")
    os.makedirs(updates_dir)

    upd = pd.read_parquet(os.path.join(tiny_dir, "pages_updates.parquet"))
    pq.write_table(pa.Table.from_pandas(upd, preserve_index=False),
                   os.path.join(updates_dir, "batch-0.parquet"))

    q = stream_sync(spark, idx, updates_dir, ckpt)
    q.awaitTermination(120)

    cat = ParquetCatalog(idx)
    assert cat.table_exists("sync_log")
    n_docs = cat.read(spark, "global_stats").collect()[0]["n_docs"]
    assert n_docs == 500 + 20 - 10  # inserts minus deletes

    res1 = bm25_topk_wand(spark, idx, "data", 10)

    # restart from checkpoint: no files pending → nothing re-applied
    q2 = stream_sync(spark, idx, updates_dir, ckpt)
    q2.awaitTermination(60)
    assert cat.read(spark, "global_stats").collect()[0]["n_docs"] == n_docs
    res2 = bm25_topk_wand(spark, idx, "data", 10)
    assert list(res1["url"]) == list(res2["url"])


@pytest.mark.slow
def test_stream_sync_processing_time_trigger(spark, tiny_index, tiny_dir,
                                             tmp_path_factory):
    """ST4: the processingTime trigger (the reference's 1-minute cron-poll
    analog) must pick up a batch on a tick and apply it exactly once."""
    import time

    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    from mongoesindexer_spark.streaming.stream_sync import stream_sync

    base = tmp_path_factory.mktemp("stream-pt")
    idx = str(base / "idx")
    shutil.copytree(tiny_index, idx)
    updates_dir = str(base / "updates")
    ckpt = str(base / "ckpt")
    os.makedirs(updates_dir)

    upd = pd.read_parquet(os.path.join(tiny_dir, "pages_updates.parquet"))
    pq.write_table(pa.Table.from_pandas(upd, preserve_index=False),
                   os.path.join(updates_dir, "batch-0.parquet"))

    q = stream_sync(spark, idx, updates_dir, ckpt,
                    trigger_available_now=False, processing_time="1 seconds")
    try:
        cat = ParquetCatalog(idx)
        deadline = time.time() + 120
        while time.time() < deadline:
            if cat.table_exists("sync_log") and \
                    cat.read(spark, "global_stats").collect()[0]["n_docs"] == 510:
                break
            time.sleep(2)
        assert cat.table_exists("sync_log")
        assert cat.read(spark, "global_stats").collect()[0]["n_docs"] == 510
        batches = {r["batch_id"] for r in cat.read(spark, "sync_log").collect()}
        assert len(batches) == 1   # applied exactly once across ticks
    finally:
        q.stop()
