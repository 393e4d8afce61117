"""Time the flat stage's two substages (extract/sort artifact write vs
per-file tokenize) separately, mirroring the real _stage_flat path and
the bench's warm-leg protocol (1 GiB heap warm, tmpfs shuffle dirs).
Also dumps the tokenize kernel's per-task lineage timings so per-task
inflation vs scheduling tail can be told apart.

Usage: python tools/flat_split_probe.py 'local-cluster[2,1,10240]' [pages]
"""
from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_MALLOC = {"MALLOC_MMAP_MAX_": "0", "MALLOC_TRIM_THRESHOLD_": "-1"}
if any(os.environ.get(k) is None for k in _MALLOC):
    os.execve(sys.executable, [sys.executable] + sys.argv,
              {**os.environ, **_MALLOC})


def main() -> None:
    master = sys.argv[1]
    pages_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".fixtures", "scale32x", "pages.parquet")
    warm_path = os.path.join(REPO, ".fixtures", "bench", "pages.parquet")
    spec = master.split("[")[1].rstrip("]").split(",")
    cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
    from pyspark.sql import functions as F
    from mongoesindexer_spark.session import get_spark, warm_python_workers
    from mongoesindexer_spark.operators.build_index import (
        IndexBuilder, rank_and_tokenize_files, sorted_doc_files)
    from mongoesindexer_spark.plans.lineage import Lineage

    spark = get_spark(f"flatsplit-{cores}", master=master,
                      shuffle_partitions=max(cores, 64))
    pages = spark.read.parquet(pages_path)
    idx = tempfile.mkdtemp(prefix="mei_flatsplit_", dir="/dev/shm")
    warm = tempfile.mkdtemp(prefix="mei_flatsplit_warm_", dir="/dev/shm")
    t = {}
    try:
        t0 = time.perf_counter()
        warm_python_workers(spark, heap_mb=1024)
        IndexBuilder(warm).build(spark, spark.read.parquet(warm_path))
        t["warmup"] = time.perf_counter() - t0

        b = IndexBuilder(idx)
        b._ensure_format()
        art_dir = os.path.join(idx, "docs_sorted")
        src_files = pages.inputFiles()
        total = sum(os.path.getsize(f[len("file:"):]) for f in src_files)
        raw = int(total // (32 << 20))
        n_parts = max(32 * (round(raw / 32) or 1),
                      32 * math.ceil(spark.sparkContext.defaultParallelism / 32))
        t0 = time.perf_counter()
        ranged = pages.select("url", "text", "html") \
            .repartitionByRange(n_parts, F.col("url")) \
            .sortWithinPartitions("url")
        ranged.write.mode("overwrite").parquet(art_dir)
        t["extract_sort_write"] = time.perf_counter() - t0

        ds_dir = os.path.join(idx, "doc_stats_files")
        flat_dir = os.path.join(idx, "postings_flat_files")
        os.makedirs(ds_dir, exist_ok=True)
        os.makedirs(flat_dir, exist_ok=True)
        t0 = time.perf_counter()
        files = sorted_doc_files(art_dir)
        metrics = rank_and_tokenize_files(spark, files, b.cfg,
                                          doc_stats_dir=ds_dir,
                                          lineage_root=idx,
                                          flat_dir=flat_dir)
        metrics.collect()
        b.catalog.register_external(flat_dir, "postings_flat")
        t["tokenize_write"] = time.perf_counter() - t0

        rows = [r for r in Lineage(idx).rows()
                if r.get("stage") == "flat_files" and "secs" in r]
        secs = sorted(r["secs"] for r in rows)
        per_task = {"n": len(secs)}
        if secs:
            per_task.update({
                "sum": round(sum(secs), 1),
                "mean": round(statistics.mean(secs), 2),
                "p50": round(statistics.median(secs), 2),
                "max": round(max(secs), 2)})
        print(json.dumps({"master": master, "n_parts": int(n_parts),
                          "t": {k: round(v, 2) for k, v in t.items()},
                          "tokenize_tasks": per_task,
                          "task_secs": [round(s, 2) for s in secs]}))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(warm, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
