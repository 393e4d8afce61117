"""Time encode_groups_coded's INTERNAL steps at 1 vs 8 concurrent workers.

Usage: python tools/encode_kernel_probe.py
Needs the probe index from tools/encode_probe.py (postings_flat in /dev/shm).
Each worker repeatedly encodes ONE file (all workers a different file) so the
measurement isolates cross-process contention, not skew.
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

    from mongoesindexer_spark.functions.encode import (
        _encode_groups_core, _CodedTerms, varbyte_encode_lengths,
        bm25_tf_norm)

    tab = pds.dataset(path).to_table(
        columns=["term", "doc_id", "tf", "doc_len"],
        filter=pds.field("term").is_valid())
    denc = tab.column("term").combine_chunks().dictionary_encode()
    codes = np.asarray(denc.indices.to_numpy(), dtype=np.int64)
    vocab = np.asarray(denc.dictionary.to_pylist(), dtype=object)
    doc_ids = np.asarray(tab.column("doc_id").to_numpy(), dtype=np.int64)
    tfs = np.asarray(tab.column("tf").to_numpy(), dtype=np.int64)
    doc_lens = np.asarray(tab.column("doc_len").to_numpy(), dtype=np.int64)

    t = {}

    def tick(name, t0):
        t[name] = t.get(name, 0.0) + time.perf_counter() - t0

    n = codes.size
    t0 = time.perf_counter()
    rank = np.empty(vocab.size, dtype=np.int64)
    rank[np.argsort(vocab, kind="stable")] = np.arange(vocab.size)
    key = rank[codes]
    order = np.lexsort((doc_ids, key))
    tick("lexsort", t0)

    t0 = time.perf_counter()
    codes_s = codes[order]
    d_s = doc_ids[order]
    tf_s = tfs[order]
    dl_s = doc_lens[order]
    tick("gather", t0)

    term_change = np.empty(n, dtype=bool)
    term_change[0] = True
    term_change[1:] = codes_s[1:] != codes_s[:-1]

    # replicate _encode_groups_core with substep timers
    t0 = time.perf_counter()
    term_ord = np.cumsum(term_change) - 1
    term_start_row = np.flatnonzero(term_change)
    pos_in_term = np.arange(n, dtype=np.int64) - term_start_row[term_ord]
    blk_in_term = pos_in_term // 128
    blk_start = (pos_in_term % 128) == 0
    starts = np.flatnonzero(blk_start)
    ends = np.concatenate([starts[1:], [n]])
    tick("blocks", t0)

    t0 = time.perf_counter()
    tfn = bm25_tf_norm(tf_s, dl_s, 350.0)
    gaps = np.diff(d_s, prepend=np.int64(-1))
    gaps[starts] = d_s[starts] + 1
    tick("tfn_gaps", t0)

    t0 = time.perf_counter()
    payload_d, len_d = varbyte_encode_lengths(gaps)
    payload_t, len_t = varbyte_encode_lengths(tf_s - 1)
    payload_l, len_l = varbyte_encode_lengths(dl_s - 1)
    tick("varbyte", t0)

    t0 = time.perf_counter()
    bend_d = np.cumsum(len_d)
    blk_bend_d = bend_d[ends - 1]
    blk_bstart_d = blk_bend_d - np.add.reduceat(len_d, starts)
    bend_t = np.cumsum(len_t)
    blk_bend_t = bend_t[ends - 1]
    blk_bstart_t = blk_bend_t - np.add.reduceat(len_t, starts)
    bend_l = np.cumsum(len_l)
    blk_bend_l = bend_l[ends - 1]
    blk_bstart_l = blk_bend_l - np.add.reduceat(len_l, starts)
    tick("offsets", t0)

    t0 = time.perf_counter()
    db = payload_d.tobytes()
    tb = payload_t.tobytes()
    lb = payload_l.tobytes()
    docs_vb = [db[a:b] for a, b in zip(blk_bstart_d, blk_bend_d)]
    tfs_vb = [tb[a:b] for a, b in zip(blk_bstart_t, blk_bend_t)]
    dls_vb = [lb[a:b] for a, b in zip(blk_bstart_l, blk_bend_l)]
    tick("slices", t0)

    t0 = time.perf_counter()
    _ = np.maximum.reduceat(tfn, starts)
    _ = np.maximum.reduceat(tf_s, starts)
    _ = np.minimum.reduceat(dl_s, starts)
    _ = np.add.reduceat(tf_s, starts)
    terms_out = _CodedTerms(vocab, codes_s)[starts]
    tick("reduceat_terms", t0)

    t["n_blocks"] = len(docs_vb)
    t["total"] = sum(v for k, v in t.items()
                     if k not in ("n_blocks", "total"))
    return {k: round(v, 3) if isinstance(v, float) else v
            for k, v in t.items()}


def main() -> None:
    from mongoesindexer_spark.sources.catalog import ParquetCatalog
    cat = ParquetCatalog(IDX)
    paths = []
    for d in cat._live_dirs("postings_flat"):
        paths.extend(os.path.join(d, f) for f in os.listdir(d)
                     if f.startswith("part-") and f.endswith(".parquet"))
    paths = sorted(paths)
    for n in (1, 8, 1, 8):
        jobs = [(paths[i % len(paths)], 0) for i in range(n)]
        with mp.Pool(n) as pool:
            # warm imports first
            pool.map(_one, jobs)
            t0 = time.perf_counter()
            stats = pool.map(_one, jobs)
            wall = time.perf_counter() - t0
        keys = [k for k in stats[0] if k != "n_blocks"]
        agg = {k: round(sum(s[k] for s in stats) / n, 3) for k in keys}
        print(json.dumps({"workers": n, "wall": round(wall, 2),
                          "mean_per_task": agg}), flush=True)


if __name__ == "__main__":
    main()
