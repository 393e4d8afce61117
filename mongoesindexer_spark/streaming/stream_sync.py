"""Structured Streaming front-end for incremental index sync (ST1–ST4).

Reference: the change-stream consume loop dispatches insert/update/delete
per event and persists a resume token after each (load.service.ts:457-491,
430-440).  Spark-native equivalent: a streaming source of change rows →
``foreachBatch`` applying each micro-batch through
:class:`IncrementalIndexer` — exactly-once because the sink is idempotent
(batch ids are recorded in the index's sync_log) AND Structured Streaming
checkpoints source offsets (``checkpointLocation`` = the resume token).

The default source here is a file/parquet stream (new files under a
directory = new change batches); on a cluster the same code runs against
Kafka or an Iceberg CDC stream — only ``readStream`` options change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.analysis import LTD_DOC, AnalyzerConfig
from .incremental import IncrementalIndexer

UPDATES_DDL = ("op string, url string, warc_ts timestamp, html binary, "
               "text string, lang string")


def stream_sync(spark: SparkSession, index_dir: str, updates_dir: str,
                checkpoint_dir: str, cfg: AnalyzerConfig = LTD_DOC,
                trigger_available_now: bool = True,
                processing_time: str | None = None):
    """Start (or drain, with availableNow) the streaming sync.

    Returns the StreamingQuery; callers own awaitTermination/stop.
    """
    indexer = IncrementalIndexer(index_dir, cfg=cfg)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        indexer.apply_updates(batch_df.sparkSession, batch_df,
                              batch_id=f"stream-{batch_id}")

    stream = (
        spark.readStream.schema(UPDATES_DDL)
        .option("maxFilesPerTrigger", "8")
        .parquet(updates_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        # the reference's 1-minute cron poll (load.service.ts:88-93)
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
