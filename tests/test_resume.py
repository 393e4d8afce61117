"""Lineage/resume semantics (SURVEY §5.2-5, FIXTURES.md §5): kill the build
mid-encode via fault injection, re-run, assert (a) completion, (b) already-
finished partitions are NOT recomputed, (c) the final index equals an
uninterrupted build (decoded postings match the oracle exactly).
"""

import glob
import os

import numpy as np
import pytest

from mongoesindexer_spark.functions.encode import decode_block
from mongoesindexer_spark.operators.build_index import IndexBuilder
from mongoesindexer_spark.plans.lineage import Lineage
from mongoesindexer_spark.sources.catalog import ParquetCatalog


def test_fault_injection_then_resume(spark, tiny_dir, oracle_tiny, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("idx-resume"))
    pages = spark.read.parquet(os.path.join(tiny_dir, "pages.parquet"))

    fail_at = frozenset({"f000002"})
    builder = IndexBuilder(index_dir, n_buckets=4, block_size=32)
    with pytest.raises(Exception):
        builder.build(spark, pages, fail_partitions=fail_at)

    lin = Lineage(index_dir)
    done_before = lin.done_partitions("encode")
    assert "f000002" not in done_before
    # flat/stats stages completed; encode partially done
    assert lin.stage_complete("flat") and lin.stage_complete("stats")
    seg_dir = os.path.join(index_dir, "segments", "base")
    mtimes_before = {
        p: os.path.getmtime(p) for p in glob.glob(os.path.join(seg_dir, "*.parquet"))
    }
    assert mtimes_before, "some segments must have completed before the failure"

    # resume: clean run completes and skips completed partitions
    builder2 = IndexBuilder(index_dir, n_buckets=4, block_size=32)
    builder2.build(spark, pages)
    done_after = Lineage(index_dir).done_partitions("encode")
    assert done_before < done_after and "f000002" in done_after
    for p, mt in mtimes_before.items():
        assert os.path.getmtime(p) == mt, f"completed segment {p} was recomputed"

    # final index postings == oracle postings, byte-exact after decode
    cat = ParquetCatalog(index_dir)
    blocks = cat.read(spark, "postings_blocks").toPandas()
    got: dict[str, dict[int, int]] = {}
    for t, g in blocks.sort_values(["term", "first_doc"]).groupby("term", sort=False):
        plist: dict[int, int] = {}
        for r in g.itertuples():
            d, tf = decode_block(r.docs_vb, r.tfs_vb)
            plist.update(zip(d.tolist(), tf.tolist()))
        got[t] = plist
    want = {t: dict(p) for t, p in oracle_tiny.postings.items()}
    assert got == want


def test_lineage_metrics_reported(spark, tiny_index):
    rows = Lineage(tiny_index).rows()
    enc = [r for r in rows if r.get("partition") and r["stage"] == "encode"]
    assert enc, "per-partition encode lineage rows must exist"
    assert all("rows" in r and "blocks" in r for r in enc)
    # the tokenize kernel reports per-file doc metrics (stats derives from
    # these driver-side, no corpus aggregate job)
    ff = [r for r in rows if r.get("partition") and r["stage"] == "flat_files"]
    assert ff, "per-file flat_files lineage rows must exist"
    assert all("n_docs" in r and "sum_dl" in r for r in ff)
    stages = {r["stage"] for r in rows}
    assert {"flat", "stats", "encode"} <= stages
