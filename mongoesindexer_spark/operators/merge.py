"""Log-structured segment merge / compaction.

Incremental syncs accumulate delta segments and tombstones (merge-on-read:
query paths union segments and anti-join tombstones).  Compaction rewrites
the index to a single clean generation — the Spark analog of Lucene's
background segment merging (opaque inside ES in the reference).

Invariant (tested): compacting base+deltas−tombstones produces an index
whose query results equal the merged view's, and whose postings equal a
from-scratch rebuild's on the same live docs (doc_ids are preserved, not
re-ranked — compaction must not invalidate external references).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.build_index import BLOCKS_DDL, IndexBuilder, encode_groups_sorted
from ..sources.catalog import ParquetCatalog


def compact(spark: SparkSession, index_dir: str,
            n_buckets: int | None = None) -> dict:
    """Rewrite postings_flat/doc_stats/postings_blocks without tombstoned
    docs; clear tombstones.  term_dict/global_stats are already exact
    (incremental sync maintains them by delta arithmetic) and are kept.
    """
    from ..operators.build_index import check_format_version
    check_format_version(index_dir, "compaction target")
    cat = ParquetCatalog(index_dir)
    builder = IndexBuilder(index_dir)
    n_buckets = n_buckets or builder.n_buckets
    if not cat.table_exists("tombstones"):
        return {"compacted": False, "reason": "no tombstones"}
    ts = cat.read(spark, "tombstones")
    n_dead = ts.count()

    live_all = cat.read(spark, "postings_flat").join(
        F.broadcast(ts), "doc_id", "left_anti")
    live_flat = live_all.filter(F.col("term").isNotNull()).drop("url")
    live_stats = cat.read(spark, "doc_stats").join(
        F.broadcast(ts), "doc_id", "left_anti")
    g = cat.read(spark, "global_stats").collect()[0]
    avgdl = float(g["avgdl"] or 1.0) or 1.0
    bs = builder.block_size

    def _enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = encode_groups_sorted(pdf, avgdl, bs)
        cols = ["term", "block_id", "first_doc", "last_doc", "n",
                "docs_vb", "tfs_vb", "dls_vb", "block_max_tfn",
                "max_tf", "min_dl", "sum_tf"]
        return pd.DataFrame({c: g[c] for c in cols}, columns=cols)

    blocks = (
        live_flat.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(_enc, schema=BLOCKS_DDL)
    )
    # order matters: rewrite data tables first, clear tombstones last —
    # a crash in between leaves a consistent merge-on-read view.
    cat.overwrite(live_all, "postings_flat")
    cat.overwrite(live_stats, "doc_stats")
    cat.overwrite(blocks, "postings_blocks")
    cat.overwrite(spark.createDataFrame([], "doc_id long"), "tombstones")
    return {"compacted": True, "removed_docs": int(n_dead)}
