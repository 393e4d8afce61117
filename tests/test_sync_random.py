"""Randomized incremental-sync equivalence (SURVEY §5.2-4/6 hybrid):
for seed-pinned random corpora and random insert/update/delete batches —
including same-url event collisions — applying two sequential sync
batches then compaction must answer every query identically to the
pure-Python oracle built from scratch on the final corpus state.

Complements test_incremental (one fixed batch) with breadth: random op
mixes, empty-text docs, vocabulary churn, version-stamp collisions.
"""

import os

import numpy as np
import pandas as pd
import pytest

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "merge scan index query spark table row block term data").split()
T0 = pd.Timestamp("2025-01-01", tz="UTC")


def _gen_pages(rng: np.random.RandomState, n: int, tag: str) -> pd.DataFrame:
    rows = []
    for i in range(n):
        body = " ".join(rng.choice(WORDS, size=rng.randint(3, 25)))
        if i % 13 == 7:
            body = ""          # empty docs must survive the whole lifecycle
        rows.append({"url": f"https://{tag}{i:04d}.ex.com",
                     "warc_ts": T0 + pd.Timedelta(seconds=i),
                     "html": None, "text": body, "lang": "en"})
    return pd.DataFrame(rows)


def _gen_batch(rng: np.random.RandomState, live_urls: list, round_no: int,
               tag: str) -> pd.DataFrame:
    ts = T0 + pd.Timedelta(days=round_no)
    rows = []
    touched = list(rng.choice(live_urls, size=min(8, len(live_urls)),
                              replace=False))
    for j, u in enumerate(touched[:3]):
        rows.append({"op": "delete", "url": u, "warc_ts": None,
                     "html": None, "text": None, "lang": None})
    for j, u in enumerate(touched[3:]):
        body = " ".join(rng.choice(WORDS, size=rng.randint(3, 20)))
        rows.append({"op": "update", "url": u,
                     "warc_ts": ts + pd.Timedelta(seconds=j),
                     "html": None, "text": body, "lang": "en"})
    for j in range(4):
        body = " ".join(rng.choice(WORDS, size=rng.randint(3, 20)))
        rows.append({"op": "insert", "url": f"https://new{round_no}-{tag}{j}.ex.com",
                     "warc_ts": ts + pd.Timedelta(seconds=100 + j),
                     "html": None, "text": body, "lang": "en"})
    # same-url collision: a stale update (older warc_ts) racing the batch —
    # the within-batch collapse must let the NEWEST version win
    if touched:
        u = touched[-1]
        rows.append({"op": "update", "url": u,
                     "warc_ts": ts - pd.Timedelta(hours=1),
                     "html": None, "text": "stale loser version", "lang": "en"})
    return pd.DataFrame(rows).sample(frac=1.0, random_state=rng)  # shuffle order


def _apply_expected(pages: pd.DataFrame, batch: pd.DataFrame) -> pd.DataFrame:
    """The documented upsert semantics, applied to a pandas corpus:
    per url keep the event with greatest warc_ts (payload-less deletes
    win outright; ties delete > update > insert), then delete/upsert."""
    df = pages.set_index("url")
    rank = {"delete": 3, "update": 2, "insert": 1}
    for url, g in batch.groupby("url"):
        g = g.copy()
        g["unversioned_delete"] = (g["op"] == "delete") & g["warc_ts"].isna()
        g["r"] = g["op"].map(rank)
        g = g.sort_values(["unversioned_delete", "warc_ts", "r"],
                          ascending=[False, False, False],
                          na_position="last")
        ev = g.iloc[0]
        if ev["op"] == "delete":
            if url in df.index:
                df = df.drop(url)
        else:
            df.loc[url] = {"warc_ts": ev["warc_ts"], "html": ev["html"],
                           "text": ev["text"], "lang": ev["lang"]}
    return df.reset_index()


QUERIES = ["alpha data", "merge scan index", "theta", "spark table row",
           "zzmissing"]

# k exceeds every corpus size in this file: the comparison covers the FULL
# ranking.  A top-10 cut would be flaky at score ties on the k boundary —
# engine doc_ids are assignment-history-dependent after sync (new ids above
# max), the rebuild oracle's are url ranks, so equal-score docs can legally
# order differently and k-boundary MEMBERSHIP would differ.
FULL_K = 500


def _pairs(spark, idx, q, k=FULL_K):
    """Both engine paths as sorted (rounded score, url) pairs — sorted,
    not rank-order: near-ties (sub-1e-6 score gaps) may legally invert
    between paths because topk_df's float sum order is partition-
    dependent while the block kernels sum in term order (the same
    1e-6-tolerance contract every oracle comparison in the suite uses)."""
    from mongoesindexer_spark.operators.topk import bm25_topk_df, bm25_topk_wand
    wand = sorted((round(float(s), 6), u) for s, u in
                  zip(*[bm25_topk_wand(spark, idx, q, k)[c]
                        for c in ("score", "url")]))
    dfp = sorted((round(r["score"], 6), r["url"]) for r in
                 bm25_topk_df(spark, idx, q, k).collect())
    assert wand == dfp, f"wand/df disagree on {q!r}"
    return wand


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_random_sync_rounds_equal_rebuild(spark, tmp_path, seed):
    from tests.oracle import OracleIndex
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.merge import compact
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    rng = np.random.RandomState(seed)
    pages = _gen_pages(rng, 40, f"s{seed}-")
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, n_buckets=2).build(
        spark, spark.createDataFrame(pages))

    inc = IncrementalIndexer(idx)
    state = pages
    for rnd in (1, 2):
        batch = _gen_batch(rng, sorted(state["url"]), rnd, f"s{seed}-")
        res = inc.apply_updates(spark, spark.createDataFrame(batch),
                                batch_id=f"r{rnd}")
        assert res["applied"]
        state = _apply_expected(state, batch)

        oracle = OracleIndex.build(state)
        for q in QUERIES:
            want = sorted((round(s, 6), u) for _, u, s in oracle.topk(q, FULL_K))
            got = _pairs(spark, idx, q)
            assert got == want, (seed, rnd, q)

    # compaction must not change any answer on the random final state
    assert compact(spark, idx)["compacted"]
    oracle = OracleIndex.build(state)
    for q in QUERIES:
        want = sorted((round(s, 6), u) for _, u, s in oracle.topk(q, FULL_K))
        assert _pairs(spark, idx, q) == want, (seed, "post-compact", q)
