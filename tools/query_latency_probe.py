"""Measure warm BM25 WAND query latency against a freshly built index.

Usage: python tools/query_latency_probe.py [sf_dir]
Builds the index from <sf_dir>/documents.parquet on local[32], then runs
the bench query mix twice — pass 1 is cold-term (first fetch+decode per
term, engine row-group directory built on the first query), pass 2 is
fully cache-warm.  Prints avg/p95 per pass.  Source of the README latency
figures alongside bench.py's bm25_p95_ms.
"""
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import bm25_topk_wand
    from mongoesindexer_spark.session import get_spark

    spark = get_spark("latency-probe", master="local[32]",
                      shuffle_partitions=32)
    idx = tempfile.mkdtemp(prefix="mei_latency_idx_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    IndexBuilder(idx, n_buckets=32, key_col="doc_id",
                 id_col="doc_id").build(spark, docs)
    print(f"build {time.perf_counter() - t0:.1f}s")
    for name in ("pass1 (cold terms)", "pass2 (cache-warm)"):
        lat = []
        for q, k in bench.BM25_QUERIES * 2:
            t0 = time.perf_counter()
            bm25_topk_wand(spark, idx, q, k)
            lat.append((time.perf_counter() - t0) * 1000)
        p95 = statistics.quantiles(lat, n=20)[-1]
        print(f"{name}: avg {sum(lat) / len(lat):.1f} ms  p95 {p95:.1f} ms  "
              f"samples {[round(x) for x in lat]}")
    spark.stop()


if __name__ == "__main__":
    main()
