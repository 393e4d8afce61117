"""Profile per-stage build time at a given master (scaling-leg shape).

Usage: python tools/profile_stages.py 'local-cluster[8,1,10240]'
Monkeypatches IndexBuilder stage methods with timers, runs the same
warm-up + measured build as bench.scaling_leg, prints stage seconds.
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

master = sys.argv[1] if len(sys.argv) > 1 else "local-cluster[8,1,10240]"
pages_path = os.path.join(REPO, ".fixtures", "scale32x", "pages.parquet")
warm_path = os.path.join(REPO, ".fixtures", "bench", "pages.parquet")

from mongoesindexer_spark.session import get_spark, warm_python_workers
from mongoesindexer_spark.operators import build_index as bi

TIMES: dict[str, float] = {}

def _wrap(name):
    orig = getattr(bi.IndexBuilder, name)
    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        TIMES[name] = TIMES.get(name, 0.0) + time.perf_counter() - t0
        return out
    setattr(bi.IndexBuilder, name, timed)

for m in ["_stage_flat", "_stage_stats", "_stage_term_dict",
          "_stage_completion", "_stage_fields", "_stage_encode",
          "_register_blocks", "_ensure_format"]:
    _wrap(m)

spec = master.split("[")[1].rstrip("]").split(",")
cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
os.makedirs("/dev/shm/sparktmp", exist_ok=True)
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/sparktmp"
spark = get_spark(f"profile-{cores}", master=master,
                  shuffle_partitions=max(cores, 64))
# 1 GiB heap warm, same as bench.scaling_leg — the default 384 MB
# leaves the encode kernel's first big task per worker paying a
# concurrent page-fault storm that masquerades as a non-scaling stage
warm_python_workers(spark, heap_mb=1024)
pages = spark.read.parquet(pages_path)

warm = tempfile.mkdtemp(prefix="mei_prof_warm_", dir="/dev/shm")
bi.IndexBuilder(warm).build(spark, spark.read.parquet(warm_path))
shutil.rmtree(warm, ignore_errors=True)
TIMES.clear()

out = tempfile.mkdtemp(prefix="mei_prof_idx_", dir="/dev/shm")
n = pages.count()
t0 = time.perf_counter()
bi.IndexBuilder(out).build(spark, pages)
total = time.perf_counter() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"master": master, "n_docs": n, "total_s": round(total, 2),
                  "docs_per_sec": round(n / total, 1),
                  "stages": {k: round(v, 2) for k, v in sorted(
                      TIMES.items(), key=lambda kv: -kv[1])}}))
spark.stop()
