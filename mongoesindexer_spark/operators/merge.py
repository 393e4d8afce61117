"""Log-structured segment merge / compaction.

Incremental syncs accumulate delta segments and tombstones (merge-on-read:
query paths union segments and anti-join tombstones).  Compaction rewrites
the index to a single clean generation — the Spark analog of Lucene's
background segment merging (opaque inside ES in the reference).

Execution shape: ONE task per live postings_flat part file (every flat
part is doc-range disjoint by construction — base parts are tokenize
range partitions, delta parts are url-range partitions of a doc-id range
above all earlier ids), each task tombstone-filters, rewrites the flat
part and encodes its segment in a single pyarrow pass — ZERO shuffle.
The former design bucketed postings by hash(term) across the whole
corpus, which concentrates a head term's entire posting list in one task
(the exact skew the build stage's per-file encode exists to avoid) and
shuffles every posting byte; at 10^12 docs it would OOM or crawl.

Invariant (tested): compacting base+deltas−tombstones produces an index
whose query results equal the merged view's, and whose postings equal a
from-scratch rebuild's on the same live docs (doc_ids are preserved, not
re-ranked — compaction must not invalidate external references).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from ..operators.build_index import (IndexBuilder, encode_flat_file,
                                     source_files_presorted)
from ..sources.catalog import ParquetCatalog, read_table_arrow


def compact(spark: SparkSession, index_dir: str, filesystem=None,
            catalog=None) -> dict:
    """Rewrite postings_flat/doc_stats/postings_blocks without tombstoned
    docs; clear tombstones.  term_dict/global_stats are already exact
    (incremental sync maintains them by delta arithmetic) and are kept.

    Commit order: new flat+segments are registered first, tombstones are
    cleared LAST — a crash in between leaves a consistent merge-on-read
    view (anti-joining already-removed ids is a no-op).

    ``catalog``: the table-commit seam (default
    ``ParquetCatalog(index_dir, filesystem)`` — control and data plane on
    the same filesystem).
    """
    from ..operators.build_index import check_format_version
    check_format_version(index_dir, "compaction target",
                         filesystem=filesystem)
    cat = catalog if catalog is not None else \
        ParquetCatalog(index_dir, filesystem)
    builder = IndexBuilder(index_dir, filesystem=filesystem, catalog=cat)
    if not cat.table_exists("tombstones"):
        return {"compacted": False, "reason": "no tombstones"}
    # tombstones are bounded by churn-since-last-compaction (cleared on
    # every compact), so a driver-side read + executor broadcast is the
    # right size; corpus-scale data never leaves the executors
    ts_pdf = read_table_arrow(cat, "tombstones")
    dead = np.unique(ts_pdf["doc_id"].to_numpy().astype(np.int64)) \
        if len(ts_pdf) else np.array([], dtype=np.int64)
    if dead.size == 0:
        return {"compacted": False, "reason": "no tombstones"}
    avgdl = float(read_table_arrow(
        cat, "global_stats").iloc[0]["avgdl"] or 1.0) or 1.0
    bs = builder.block_size

    from ..sources import fsio
    paths = [p for p in cat.data_files("postings_flat")
             if os.path.basename(p).startswith("part-")]
    # doc-range disjointness validated from footer stats; offsets double
    # as block_id bases (unique within the new generation)
    files = source_files_presorted(paths, key="doc_id",
                                   filesystem=filesystem)

    gen = uuid.uuid4().hex[:8]
    new_flat = os.path.join(index_dir, "compacted", gen, "flat")
    new_seg = os.path.join(index_dir, "segments", f"cmp-{gen}")
    fsio.makedirs(new_flat, filesystem)
    fsio.makedirs(new_seg, filesystem)
    dead_bc = spark.sparkContext.broadcast(dead)

    def _cmp(it):
        for pdf in it:
            for path, off, idx in zip(pdf["path"].values, pdf["off"].values,
                                      pdf["idx"].values):
                n_rows, n_blocks = encode_flat_file(
                    path,
                    os.path.join(new_seg, f"seg-c{int(idx):06d}.parquet"),
                    avgdl, bs, int(off),
                    drop_doc_ids=dead_bc.value,
                    flat_out_path=os.path.join(
                        new_flat, f"part-{int(idx):05d}-cmp.parquet"),
                    filesystem=filesystem)
                yield pd.DataFrame({"partition": [int(idx)],
                                    "rows": [n_rows], "blocks": [n_blocks]})

    todo = [(p, off, i) for i, (p, off) in enumerate(files)]
    stats = []
    if todo:
        fdf = spark.createDataFrame(
            spark.sparkContext.parallelize(todo, len(todo)),
            "path string, off long, idx long")
        stats = fdf.mapInPandas(
            _cmp, schema="partition long, rows long, blocks long").collect()
    if not fsio.listdir(new_flat, filesystem):
        # fully-tombstoned corpus: keep a readable empty table (schema
        # pinned to the build's — mixed-writer dirs must stay identical)
        from ..operators.build_index import FLAT_SCHEMA
        fsio.write_parquet_atomic(
            FLAT_SCHEMA.empty_table(),
            os.path.join(new_flat, "part-00000-cmp.parquet"), filesystem)

    n_dead = int(dead.size)
    # doc_stats is rewritten per part file with the SAME 8192-row row
    # groups the build writes — a plain Spark overwrite would emit ~1M-row
    # groups and every post-compaction fetch_urls point read would decode
    # whole files for k winners, for the lifetime of the index.  Part
    # files are doc_id-ordered; the tombstone filter preserves that.
    ds_paths = cat.data_files("doc_stats")
    new_ds = os.path.join(index_dir, "compacted", gen, "doc_stats")
    fsio.makedirs(new_ds, filesystem)

    def _cmp_ds(it):
        import pyarrow as pa
        for pdf in it:
            for path, idx in zip(pdf["path"].values, pdf["idx"].values):
                tbl = fsio.parquet_file(path, filesystem).read()
                mask = ~np.isin(tbl["doc_id"].to_numpy(), dead_bc.value)
                out_tbl = tbl.filter(pa.array(mask))
                if out_tbl.num_rows:
                    fsio.write_parquet_atomic(
                        out_tbl,
                        os.path.join(new_ds, f"ds-{int(idx):06d}.parquet"),
                        filesystem, row_group_size=8192)
                yield pd.DataFrame({"rows": [int(out_tbl.num_rows)]})

    live_rows = 0
    if ds_paths:
        dsdf = spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(p, i) for i, p in enumerate(sorted(ds_paths))],
                len(ds_paths)),
            "path string, idx long")
        live_rows = sum(r["rows"] for r in
                        dsdf.mapInPandas(_cmp_ds, schema="rows long").collect())
    if not live_rows:
        import pyarrow as pa
        fsio.write_parquet_atomic(
            pa.schema([("doc_id", pa.int64()), ("url", pa.string()),
                       ("doc_len", pa.int64())]).empty_table(),
            os.path.join(new_ds, "ds-000000.parquet"), filesystem)
    cat.register_external(new_ds, "doc_stats")
    cat.register_external(new_flat, "postings_flat")
    cat.register_external(new_seg, "postings_blocks")
    if cat.table_exists("fields"):
        # fields rows for tombstoned docs are only masked at read time
        # (read_fields anti-join); compaction is where they go away.
        # tombstones is still registered at this point (cleared below) —
        # anti-join it distributed rather than shipping the dead-id set
        # (possibly millions of rows) back out through createDataFrame
        cat.overwrite(
            cat.read(spark, "fields").join(
                cat.read(spark, "tombstones").select("doc_id"),
                "doc_id", "left_anti"),
            "fields")
        # fold the point-read sidecars to one generation each (their delta
        # files still carry tombstoned docs; SearchEngine masks those via
        # its tombstone set, which is cleared below — so the sidecars must
        # be physically clean from here on)
        from ..operators.build_index import write_keyword_sidecars
        write_keyword_sidecars(
            cat, cat.read(spark, "fields"),
            max(1, spark.sparkContext.defaultParallelism))
    cat.write_small_arrow(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64")}), "tombstones")
    dead_bc.unpersist()
    return {"compacted": True, "removed_docs": n_dead,
            "segments": len(stats)}
