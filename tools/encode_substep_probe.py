"""Per-substep timing of the encode kernel at 2 vs 8 concurrent workers.

Usage: python tools/encode_substep_probe.py
Replicates encode_flat_file's steps with timers over the probe index's
postings_flat files (run tools/encode_probe.py once first to build it).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
IDX = "/dev/shm/mei_encode_probe_idx"


def _one(args):
    path, off = args
    import numpy as np
    import pyarrow.dataset as pds

    from mongoesindexer_spark.functions.encode import encode_groups_coded

    t = {}
    t0 = time.perf_counter()
    tab = pds.dataset(path).to_table(
        columns=["term", "doc_id", "tf", "doc_len"],
        filter=pds.field("term").is_valid())
    t["read"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    denc = tab.column("term").combine_chunks().dictionary_encode()
    codes = denc.indices.to_numpy()
    vocab = np.asarray(denc.dictionary.to_pylist(), dtype=object)
    t["dict"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    rank = np.empty(vocab.size, dtype=np.int64)
    rank[np.argsort(vocab, kind="stable")] = np.arange(vocab.size)
    key = rank[np.asarray(codes, dtype=np.int64)]
    doc_ids = tab.column("doc_id").to_numpy()
    order = np.lexsort((np.asarray(doc_ids, dtype=np.int64), key))
    t["sort"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = encode_groups_coded(codes, vocab, doc_ids,
                            tab.column("tf").to_numpy(),
                            tab.column("doc_len").to_numpy(),
                            350.0, 128, int(off))
    t["full_kernel"] = time.perf_counter() - t0
    t["n_rows"] = tab.num_rows
    t["vocab"] = int(vocab.size)
    t["doc_sorted"] = bool(np.all(np.diff(doc_ids.astype(np.int64)) >= 0))
    return t


def main() -> None:
    from mongoesindexer_spark.operators.build_index import (
        source_files_presorted)
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    cat = ParquetCatalog(IDX)
    paths = []
    for d in cat._live_dirs("postings_flat"):
        paths.extend(os.path.join(d, f) for f in os.listdir(d)
                     if f.startswith("part-") and f.endswith(".parquet"))
    files = source_files_presorted(paths, key="doc_id")
    jobs = [(p, off) for p, off in files]
    for n in (2, 8, 2, 8):
        t0 = time.perf_counter()
        with mp.Pool(n) as pool:
            stats = pool.map(_one, jobs)
        wall = time.perf_counter() - t0
        agg = {k: round(sum(s[k] for s in stats), 1)
               for k in ("read", "dict", "sort", "full_kernel")}
        print(json.dumps({"pool": n, "wall": round(wall, 1),
                          "sum_task_s": agg,
                          "n_rows": stats[0]["n_rows"],
                          "vocab": stats[0]["vocab"],
                          "doc_sorted": all(s["doc_sorted"] for s in stats)}),
              flush=True)


if __name__ == "__main__":
    main()
