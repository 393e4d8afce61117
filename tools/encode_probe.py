"""Isolate encode-kernel scaling from Spark: encode the 1.6M-page build's
postings_flat files under plain multiprocessing at 2 vs 8 workers.

Usage: python tools/encode_probe.py [rounds]
Builds (or reuses) an index at /dev/shm/mei_encode_probe_idx, then times
`encode_flat_file` over all flat part files with mp.Pool(2) and mp.Pool(8),
alternated.  Compares against the Spark-measured stage times.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IDX = "/dev/shm/mei_encode_probe_idx"
PAGES = os.path.join(REPO, ".fixtures", "scale32x", "pages.parquet")


def _one(args):
    path, off, out_path = args
    if os.environ.get("PIN_ARROW_THREADS"):
        import pyarrow as pa
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    from mongoesindexer_spark.operators.build_index import encode_flat_file
    t0 = time.perf_counter()
    c0 = time.process_time()
    n_rows, n_blocks = encode_flat_file(path, out_path, 350.0, 128, int(off))
    return path, time.perf_counter() - t0, n_rows, time.process_time() - c0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if not os.path.isdir(os.path.join(IDX, "postings_flat")):
        shutil.rmtree(IDX, ignore_errors=True)
        from mongoesindexer_spark.session import get_spark
        from mongoesindexer_spark.operators.build_index import IndexBuilder
        os.makedirs("/dev/shm/sparktmp", exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
        spark = get_spark("encode-probe-build", master="local[8]",
                          shuffle_partitions=64)
        IndexBuilder(IDX).build(spark, spark.read.parquet(PAGES))
        spark.stop()

    from mongoesindexer_spark.operators.build_index import (
        source_files_presorted)
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    cat = ParquetCatalog(IDX)
    paths = []
    for d in cat._live_dirs("postings_flat"):
        paths.extend(os.path.join(d, f) for f in os.listdir(d)
                     if f.startswith("part-") and f.endswith(".parquet"))
    files = source_files_presorted(paths, key="doc_id")
    print(f"{len(files)} flat files", flush=True)

    results: dict[int, list[float]] = {2: [], 8: []}
    per_task: dict[int, list[float]] = {2: [], 8: []}
    for r in range(rounds):
        for n in (2, 8):
            out = tempfile.mkdtemp(prefix="mei_eprobe_", dir="/dev/shm")
            jobs = [(p, off, os.path.join(out, f"seg-{i:06d}.parquet"))
                    for i, (p, off) in enumerate(files)]
            t0 = time.perf_counter()
            with mp.Pool(n) as pool:
                stats = pool.map(_one, jobs)
            wall = time.perf_counter() - t0
            shutil.rmtree(out, ignore_errors=True)
            results[n].append(round(wall, 2))
            per_task[n] = sorted(round(s[1], 2) for s in stats)
            slow = [(round(s[1], 1), round(s[3], 1)) for s in stats if s[1] > 5]
            if slow:
                print(f"  slow tasks (wall, cpu): {slow}", flush=True)
            print(f"round {r} pool={n}: wall {wall:.1f}s", flush=True)
    best2, best8 = min(results[2]), min(results[8])
    print(json.dumps({
        "wall_2": results[2], "wall_8": results[8],
        "task_seconds_2": per_task[2], "task_seconds_8": per_task[8],
        "efficiency_best": round(best2 / best8 / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
