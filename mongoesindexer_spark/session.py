"""SparkSession construction with engine defaults.

Tuned for correctness-at-scale semantics: AQE on (runtime re-plan +
skew-join mitigation — the Spark analog of the reference's adaptive batch
sizing, load.service.ts:370-390), Arrow enabled for all pandas UDF
exchange, and shuffle partitions sized for the local harness (overridden
by --conf on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "mongoesindexer-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = (
        SparkSession.builder.appName(app)
        .master(master)
    )
    if master.startswith("local-cluster"):
        # multi-executor-JVM mode (the honest sandbox proxy for "N vs 4N
        # executors"): executors are separate processes that don't inherit
        # the driver's sys.path — ship the package like spark-submit
        # --py-files would.
        import mongoesindexer_spark as _pkg
        repo = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
        b = b.config("spark.executorEnv.PYTHONPATH", repo)
    # glibc malloc tuning for the numpy kernels that run inside Python
    # workers (tokenize / posting-encode / dedup).  Those kernels allocate
    # and free many multi-MB temporaries per Arrow batch; with glibc's
    # defaults every one is a fresh mmap + munmap, so each concurrent
    # worker spends most of its time in page-fault/zeroing/TLB-shootdown
    # kernel paths that serialize across processes — measured on this host
    # as a 15-22x per-task slowdown at 8 workers (encode-kernel probe, findings in BASELINE.md
    # .py) and the dominant loss of N->4N scaling efficiency.  Serving
    # large blocks from the (never-trimmed) heap makes workers reuse
    # already-faulted pages: same probe drops to ~1.5x, i.e. plain DRAM
    # sharing.  Cost: worker RSS stays at its high-water mark — fine for
    # long-lived executors sized for their task memory anyway.
    # ARROW_DEFAULT_MEMORY_POOL=system routes pyarrow's allocations (parquet
    # read buffers, Arrow batches) through the same tuned glibc heap; the
    # bundled jemalloc/mimalloc pools manage their own mmap'd arenas with
    # ~10s decay timers that hand pages back to the kernel between waves,
    # re-paying the fault storm every build.
    for k, v in (("MALLOC_MMAP_MAX_", "0"), ("MALLOC_TRIM_THRESHOLD_", "-1"),
                 ("ARROW_DEFAULT_MEMORY_POOL", "system")):
        b = b.config(f"spark.executorEnv.{k}", os.environ.get(k, v))
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode: driver heap IS the executor heap.  Execution memory is
        # divided across concurrent tasks, so high-core local runs spill in
        # sort/aggregate stages long before an 8g heap is "full" — size for
        # cores × a few hundred MB of execution memory per task.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()


def warm_python_workers(spark: SparkSession, n: int | None = None,
                        heap_mb: int = 384) -> None:
    """Force creation of ``n`` Python UDF workers (default: defaultParallelism).

    Spark creates pandas-UDF workers lazily and SERIALLY (one daemon fork +
    handshake at a time, then heavy pandas/pyarrow imports per worker), so
    the first vectorized stage of a fresh session pays an O(cores) serial
    ramp — ~10s at 32 cores.  Long-lived clusters amortize this; short
    benchmark jobs must warm explicitly so measurements reflect
    steady-state throughput.  Idempotent and cheap when already warm.

    ``heap_mb``: also grow each worker's malloc heap to roughly the
    high-water mark of the big numpy kernels (posting encode allocates
    hundreds of MB of temporaries per task).  With the engine's
    heap-reuse malloc tunables (see ``get_spark``) the pages are faulted
    ONCE per worker lifetime; without warming, the first big task per
    worker pays the whole fault storm — concurrently across workers,
    which serializes in the kernel and was measured as a ~6x slowdown of
    exactly one task per worker (per-task-seconds probe, findings in BASELINE.md).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    n = n or spark.sparkContext.defaultParallelism
    mb = heap_mb

    # no type hints: string annotations (future-import) break inference
    @pandas_udf("long")
    def _touch(s):
        if mb:
            # a few encode-kernel-sized temporaries, touched then freed —
            # raises the reusable heap high-water, not steady-state RSS
            for _ in range(3):
                scratch = np.empty(mb * (1 << 20) // 8, dtype=np.int64)
                scratch[:: 512] = 1
                del scratch
        return s

    (spark.range(0, n * 4, 1, numPartitions=n * 4)
     .select(_touch(col("id")).alias("x"))
     .write.format("noop").mode("overwrite").save())
