"""Per-task kernel seconds (from lineage metrics) at a given master.

Usage: python tools/task_secs_probe.py 'local-cluster[8,1,10240]'
Runs warm-up + one measured build like the scaling leg, then prints the
distribution of per-file tokenize and encode kernel seconds recorded in
lineage — Spark-side overhead is total stage wall minus these.
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

master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[8,1,10240]"
pages_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, ".fixtures", "scale32x", "pages.parquet")
warm_path = os.path.join(REPO, ".fixtures", "bench", "pages.parquet")

from mongoesindexer_spark.session import get_spark, warm_python_workers
from mongoesindexer_spark.operators.build_index import IndexBuilder
from mongoesindexer_spark.plans.lineage import Lineage

spec = master.split("[")[1].rstrip("]").split(",")
cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
os.makedirs("/dev/shm/sparktmp", exist_ok=True)
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
spark = get_spark(f"tsecs-{cores}", master=master,
                  shuffle_partitions=max(cores, 64))
warm_python_workers(spark)

warm = tempfile.mkdtemp(prefix="mei_ts_warm_", dir="/dev/shm")
IndexBuilder(warm).build(spark, spark.read.parquet(warm_path))
shutil.rmtree(warm, ignore_errors=True)

out = tempfile.mkdtemp(prefix="mei_ts_idx_", dir="/dev/shm")
t0 = time.perf_counter()
IndexBuilder(out).build(spark, spark.read.parquet(pages_path))
total = time.perf_counter() - t0

rows = Lineage(out).rows()
by_stage = {}
detail = {}
for r in rows:
    if r.get("partition") and "secs" in r:
        by_stage.setdefault(r["stage"], []).append(float(r["secs"]))
        detail.setdefault(r["stage"], []).append(
            (r["partition"], float(r["secs"]),
             int(r.get("rows", r.get("n_docs", 0))),
             {k: r[k] for k in ("read", "kernel", "write") if k in r}))
rep = {"master": master, "total_s": round(total, 1)}
for st, secs in by_stage.items():
    secs.sort()
    rep[st] = {
        "n": len(secs), "sum": round(sum(secs), 1),
        "p50": round(statistics.median(secs), 2),
        "max": round(secs[-1], 2),
        "top4": [round(x, 2) for x in secs[-4:]],
    }
shutil.rmtree(out, ignore_errors=True)
print(json.dumps(rep))
for st, rows_ in detail.items():
    rows_.sort(key=lambda t: -t[1])
    print(st, "slowest:", rows_[:6])
    print(st, "fastest:", rows_[-3:])
