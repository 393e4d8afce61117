"""Stage-level timing of the index build at one parallelism level.

Usage: python tools/scaling_probe.py local[N] [pages_parquet]
Prints one JSON line with per-stage seconds and CPU accounting.
"""
from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    master = sys.argv[1]
    pages_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".fixtures", "scale8x", "pages.parquet")
    spec = master.split("[")[1].rstrip("]").split(",")
    cores = int(spec[0]) * int(spec[1]) if len(spec) >= 2 else int(spec[0])
    from mongoesindexer_spark.session import get_spark, warm_python_workers
    from mongoesindexer_spark.operators.build_index import IndexBuilder

    # mirror bench.scaling_leg: shuffle partitioning tracks data, not cores
    spark = get_spark(f"probe-{cores}", master=master,
                      shuffle_partitions=max(cores, 64))
    pages = spark.read.parquet(pages_path)
    out = tempfile.mkdtemp(prefix="mei_probe_")
    warm = tempfile.mkdtemp(prefix="mei_probe_warm_")
    t = {}
    try:
        t0 = time.perf_counter()
        warm_python_workers(spark)
        IndexBuilder(warm).build(spark, pages.limit(2000))
        t["warmup"] = time.perf_counter() - t0

        b = IndexBuilder(out)
        n = pages.count()
        b._ensure_format()
        for stage, fn in (
            ("flat", lambda: b._stage_flat(spark, pages)),
            ("stats", lambda: b._stage_stats(spark)),
            ("encode", lambda: b._stage_encode(spark)),
            ("register", lambda: b._register_blocks(spark)),
            ("term_dict", lambda: b._stage_term_dict(spark)),
            ("completion", lambda: b._stage_completion(spark)),
            ("fields", lambda: b._stage_fields(spark, pages)),
        ):
            t0 = time.perf_counter()
            fn()
            t[stage] = time.perf_counter() - t0
        total = sum(v for k, v in t.items() if k != "warmup")
        ru_s = resource.getrusage(resource.RUSAGE_SELF)
        ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
        print(json.dumps({
            "master": master, "n_docs": n,
            "stages_s": {k: round(v, 2) for k, v in t.items()},
            "build_s": round(total, 2),
            "docs_per_sec": round(n / total, 1),
            "cpu_self_s": round(ru_s.ru_utime + ru_s.ru_stime, 1),
            "cpu_children_s": round(ru_c.ru_utime + ru_c.ru_stime, 1),
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(warm, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
