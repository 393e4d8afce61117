"""Time the flat stage's two substages (extract/sort artifact write vs
per-file tokenize) separately at one parallelism level.

Usage: python tools/flat_split_probe.py 'local-cluster[2,1,10240]' [pages]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    master = sys.argv[1]
    pages_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".fixtures", "scale32x", "pages.parquet")
    spec = master.split("[")[1].rstrip("]").split(",")
    cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
    from pyspark.sql import functions as F
    from mongoesindexer_spark.session import get_spark, warm_python_workers
    from mongoesindexer_spark.operators.build_index import (
        IndexBuilder, rank_and_tokenize_files, sorted_doc_files)

    spark = get_spark(f"flatsplit-{cores}", master=master,
                      shuffle_partitions=max(cores, 64))
    pages = spark.read.parquet(pages_path)
    idx = tempfile.mkdtemp(prefix="mei_flatsplit_")
    warm = tempfile.mkdtemp(prefix="mei_flatsplit_warm_")
    t = {}
    try:
        t0 = time.perf_counter()
        warm_python_workers(spark)
        IndexBuilder(warm).build(spark, pages.limit(2000))
        t["warmup"] = time.perf_counter() - t0

        b = IndexBuilder(idx)
        b._ensure_format()
        art_dir = os.path.join(idx, "docs_sorted")
        src_files = pages.inputFiles()
        total = sum(os.path.getsize(f[len("file:"):]) for f in src_files)
        n_parts = max(spark.sparkContext.defaultParallelism,
                      total // (32 << 20))
        t0 = time.perf_counter()
        ranged = pages.select("url", "text", "html") \
            .repartitionByRange(n_parts, F.col("url")) \
            .sortWithinPartitions("url")
        ranged.write.mode("overwrite").parquet(art_dir)
        t["extract_sort_write"] = time.perf_counter() - t0

        ds_dir = os.path.join(idx, "doc_stats_files")
        os.makedirs(ds_dir, exist_ok=True)
        t0 = time.perf_counter()
        files = sorted_doc_files(art_dir)
        flat = rank_and_tokenize_files(spark, files, b.cfg,
                                       doc_stats_dir=ds_dir)
        b.catalog.overwrite(flat, "postings_flat")
        t["tokenize_write"] = time.perf_counter() - t0
        print(json.dumps({"master": master, "n_parts": int(n_parts),
                          "t": {k: round(v, 2) for k, v in t.items()}}))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(warm, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
