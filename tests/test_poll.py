"""Config-driven cron-poll parity (EP3) + self-update loop-breaker (ST5).

The reference's 1-minute cron tick indexes up to 20 never-indexed docs
(no lastESIndexedAt, load.service.ts:501-535) and up to 50 stale docs
(update_field >= lastESIndexedAt, :537-573), skipping docs indexed within
skip_after_seconds (extract.service.ts:233-243); its change-stream skips
update events whose changed fields are all bookkeeping/excluded
(array-utils.ts:6-13).  These tests pin both behaviors as the engine
implements them (streaming/incremental.py).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

NOW = dt.datetime(2026, 1, 10, 12, 0, 0)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, ts, None, f"text {u}", "en") for u, ts in rows], PAGES_DDL)


def _indexed(spark, rows):
    return spark.createDataFrame(rows, "url string, last_indexed_at timestamp")


def test_poll_new_docs_limit_and_order(spark):
    from mongoesindexer_spark.streaming.incremental import poll_updates

    src = _pages(spark, [(f"https://x/{i:03d}", NOW) for i in range(30)])
    batch = poll_updates(src, _indexed(spark, []), now=F.lit(NOW),
                         new_limit=20, updated_limit=50)
    rows = batch.collect()
    assert all(r["op"] == "insert" for r in rows)
    # ordered by key, first 20 (reference: sort _id, limit 20)
    assert sorted(r["url"] for r in rows) == \
        [f"https://x/{i:03d}" for i in range(20)]


def test_poll_stale_and_skip_after(spark):
    from mongoesindexer_spark.streaming.incremental import poll_updates

    h = dt.timedelta(hours=1)
    src = _pages(spark, [
        ("https://x/fresh", NOW - 2 * h),     # updated before last index → ok
        ("https://x/stale", NOW - 1 * h),     # updated after last index → poll
        ("https://x/recent", NOW - 1 * h),    # stale BUT indexed 30min ago → skip
    ])
    idx = _indexed(spark, [
        ("https://x/fresh", NOW - 1 * h),
        ("https://x/stale", NOW - 26 * h),
        ("https://x/recent", NOW - dt.timedelta(minutes=30)),
    ])
    batch = poll_updates(src, idx, now=F.lit(NOW),
                         skip_after_seconds=86_400).collect()
    assert [(r["op"], r["url"]) for r in batch] == \
        [("update", "https://x/stale")]


def test_poll_updated_limit(spark):
    from mongoesindexer_spark.streaming.incremental import poll_updates

    h = dt.timedelta(hours=1)
    src = _pages(spark, [(f"https://x/{i:03d}", NOW) for i in range(60)])
    idx = _indexed(spark, [(f"https://x/{i:03d}", NOW - 48 * h)
                           for i in range(60)])
    batch = poll_updates(src, idx, now=F.lit(NOW), updated_limit=50).collect()
    assert len(batch) == 50
    assert all(r["op"] == "update" for r in batch)


def test_filter_self_updates(spark):
    from mongoesindexer_spark.streaming.incremental import filter_self_updates

    rows = [
        # own writeback: changed ⊆ bookkeeping ∪ excluded → dropped
        ("update", "https://x/a", ["last_indexed_at", "views"]),
        # real change → kept
        ("update", "https://x/b", ["text", "last_indexed_at"]),
        # inserts/deletes always pass, even with bookkeeping-only fields
        ("insert", "https://x/c", ["last_indexed_at"]),
        ("delete", "https://x/d", None),
    ]
    df = spark.createDataFrame(
        rows, "op string, url string, changed_fields array<string>")
    kept = filter_self_updates(df, exclude_fields=("views",))
    assert sorted(r["url"] for r in kept.collect()) == \
        ["https://x/b", "https://x/c", "https://x/d"]


def test_filter_self_updates_no_changed_col(spark):
    from mongoesindexer_spark.streaming.incremental import filter_self_updates

    df = spark.createDataFrame([("update", "u")], "op string, url string")
    assert filter_self_updates(df).count() == 1


def test_poll_plan_is_topk_not_global_sort(spark):
    """The per-tick sort+limit must compile to TakeOrderedAndProject —
    a global sort of the corpus per poll tick would not survive scale."""
    from mongoesindexer_spark.streaming.incremental import poll_updates

    src = _pages(spark, [(f"https://x/{i}", NOW) for i in range(10)])
    batch = poll_updates(src, _indexed(spark, []), now=F.lit(NOW))
    import re
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # any Sort nodes must be partition-local (join requirement), never a
    # global sort of the source table ("true" = global flag)
    assert not re.search(r"Sort \[[^\]]*\], true,", plan)


def test_writeback_indexed_upserts(spark, tmp_path):
    """lastESIndexedAt writeback parity: applied keys are upserted into
    the poll bookkeeping table so the next tick advances past them."""
    from mongoesindexer_spark.streaming.incremental import (poll_updates,
                                                            writeback_indexed)

    path = str(tmp_path / "indexed.parquet")
    # first write: table does not exist yet
    assert writeback_indexed(spark, path, ["https://x/a", "https://x/b"],
                             now=F.lit(NOW)) == 2
    got = {r["url"]: r["last_indexed_at"]
           for r in spark.read.parquet(path).collect()}
    assert got == {"https://x/a": NOW, "https://x/b": NOW}

    # upsert: existing key refreshed, new key added, untouched key kept
    later = NOW + dt.timedelta(hours=1)
    writeback_indexed(spark, path, ["https://x/b", "https://x/c"],
                      now=F.lit(later))
    got = {r["url"]: r["last_indexed_at"]
           for r in spark.read.parquet(path).collect()}
    assert got == {"https://x/a": NOW, "https://x/b": later,
                   "https://x/c": later}

    # the cron loop advances: a poll tick against the written table no
    # longer re-selects the written keys as new
    src = _pages(spark, [("https://x/a", NOW - dt.timedelta(days=2)),
                         ("https://x/d", NOW)])
    batch = poll_updates(src, spark.read.parquet(path),
                         now=F.lit(later)).collect()
    assert [(r["op"], r["url"]) for r in batch] == [("insert", "https://x/d")]


def test_writeback_indexed_over_single_file_table(spark, tmp_path):
    """The read branch supports a single parquet FILE as the bookkeeping
    table; the swap must replace it too (regression: os.rename onto a
    leftover file raised ENOTDIR and left the table stale)."""
    import pandas as pd

    from mongoesindexer_spark.streaming.incremental import writeback_indexed

    path = str(tmp_path / "indexed.parquet")
    pd.DataFrame({"url": ["https://x/a"],
                  "last_indexed_at": [NOW]}).to_parquet(
        path, coerce_timestamps="us")  # Spark cannot read NANOS
    later = NOW + dt.timedelta(hours=1)
    assert writeback_indexed(spark, path, ["https://x/b"],
                             now=F.lit(later)) == 1
    got = {r["url"]: r["last_indexed_at"]
           for r in spark.read.parquet(path).collect()}
    assert got == {"https://x/a": NOW, "https://x/b": later}
