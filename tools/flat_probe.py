"""Sub-step timing of the flat stage at one parallelism level.

Usage: python tools/flat_probe.py local[N]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    master = sys.argv[1]
    cpus = int(master.split("[")[1].rstrip("]"))
    from pyspark.sql import functions as F
    from mongoesindexer_spark.session import get_spark
    from mongoesindexer_spark.operators.build_index import (
        assign_doc_ids, resolve_text, tokenize_flat)

    spark = get_spark(f"flatprobe-{cpus}", master=master,
                      shuffle_partitions=cpus)
    pages = spark.read.parquet(os.path.join(
        REPO, ".fixtures", "scale8x", "pages.parquet"))
    t = {}

    # warm the python workers + JIT
    t0 = time.perf_counter()
    tokenize_flat(resolve_text(pages.limit(2000)).withColumn(
        "doc_id", F.xxhash64("url"))).write.format("noop").mode("overwrite").save()
    t["warmup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ext = resolve_text(pages.select("url", "text", "html")).drop("html")
    ext.write.format("noop").mode("overwrite").save()
    t["extract_only"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    handle = []
    docs = assign_doc_ids(ext, key="url", _persist_handle=handle)
    docs.write.format("noop").mode("overwrite").save()
    t["extract+assign_ids"] = time.perf_counter() - t0

    out = tempfile.mkdtemp(prefix="mei_flatprobe_")
    t0 = time.perf_counter()
    tokenize_flat(docs).write.mode("overwrite").parquet(out)
    t["tokenize+write"] = time.perf_counter() - t0

    # alternative: skip rank assignment entirely (hash ids), tokenize direct
    for c in handle:
        c.unpersist()
    out2 = tempfile.mkdtemp(prefix="mei_flatprobe2_")
    t0 = time.perf_counter()
    docs2 = resolve_text(pages.select("url", "text", "html")).drop("html") \
        .withColumn("doc_id", F.xxhash64("url"))
    tokenize_flat(docs2).write.mode("overwrite").parquet(out2)
    t["extract+hashid+tokenize+write"] = time.perf_counter() - t0

    import shutil
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out2, ignore_errors=True)
    print(json.dumps({"master": master,
                      "t": {k: round(v, 2) for k, v in t.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
