"""Probe: per-task encode timing distribution at 2 vs 8 one-core executors.

Builds the full index on the scaling input at each master (warm JVM +
warm workers + untimed warm-up build, same as bench.scaling_leg), keeps
the index dir, and prints the encode stage's per-task lineage timings
(read / kernel / write sub-spans) plus the stage wall — isolating
whether encode's poor 2->8 scaling is per-task inflation (shared-resource
contention) or a scheduling/straggler tail.

Usage: python tools/encode_scale_probe.py ['local-cluster[2,1,10240]' ...]
"""
import json
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

from mongoesindexer_spark.session import get_spark, warm_python_workers
from mongoesindexer_spark.operators.build_index import IndexBuilder
from mongoesindexer_spark.plans.lineage import Lineage

pages_path = os.path.join(REPO, ".fixtures", "scale32x", "pages.parquet")
warm_path = os.path.join(REPO, ".fixtures", "bench", "pages.parquet")
os.makedirs("/dev/shm/sparktmp", exist_ok=True)
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"

masters = sys.argv[1:] or ["local-cluster[2,1,10240]",
                           "local-cluster[8,1,10240]"]

for master in masters:
    spec = master.split("[")[1].rstrip("]").split(",")
    cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
    spark = get_spark(f"probe-{cores}", master=master,
                      shuffle_partitions=max(cores, 64))
    warm_python_workers(spark, heap_mb=1024)
    warm = tempfile.mkdtemp(prefix="mei_probe_warm_", dir="/dev/shm")
    IndexBuilder(warm).build(spark, spark.read.parquet(warm_path))
    shutil.rmtree(warm, ignore_errors=True)

    out = tempfile.mkdtemp(prefix="mei_probe_idx_", dir="/dev/shm")
    pages = spark.read.parquet(pages_path)

    import mongoesindexer_spark.operators.build_index as bi
    stage_wall = {}
    for name in ("_stage_flat", "_stage_encode"):
        orig = getattr(bi.IndexBuilder, name)
        def timed(self, *a, _o=orig, _n=name, **kw):
            t0 = time.perf_counter()
            r = _o(self, *a, **kw)
            stage_wall[_n] = round(time.perf_counter() - t0, 2)
            return r
        setattr(bi.IndexBuilder, name, timed)

    t0 = time.perf_counter()
    bi.IndexBuilder(out).build(spark, pages)
    total = time.perf_counter() - t0

    rows = [r for r in Lineage(out).rows()
            if r.get("stage") == "encode" and "secs" in r]
    secs = sorted(r["secs"] for r in rows)
    agg = {}
    for k in ("read", "kernel", "write", "secs"):
        vals = [r[k] for r in rows if k in r]
        if vals:
            agg[k] = {"sum": round(sum(vals), 1),
                      "mean": round(statistics.mean(vals), 2),
                      "p50": round(statistics.median(vals), 2),
                      "max": round(max(vals), 2)}
    print(json.dumps({
        "master": master, "total_s": round(total, 2),
        "stage_wall": stage_wall, "n_encode_tasks": len(rows),
        "per_task": agg, "task_secs": [round(s, 2) for s in secs],
    }))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
