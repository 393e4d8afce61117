"""Unit tests for dedup / ANN / textstats / lookup / multimodal operators
against pure-Python references."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup
        (3, "dog lazy the over jumps fox brown quick the"),          # same bag of words as 0
        (4, "completely different content about spark and indexes"),
        (5, "le renard brun rapide saute par dessus le chien"),
        (6, "el zorro marron rapido salta sobre el perro perezoso"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs_df):
    from mongoesindexer_spark.operators.dedup import exact_dedup_groups
    out = {r["text_md5"]: (r["n_docs"], r["keeper"])
           for r in exact_dedup_groups(docs_df).collect()}
    dup_groups = [v for v in out.values() if v[0] > 1]
    assert dup_groups == [(2, 0)]  # docs 0 and 1, keeper 0


def test_fingerprint_dedup_bag_of_words(spark, docs_df):
    from mongoesindexer_spark.operators.dedup import fingerprint_dedup_groups
    out = [ (r["n_docs"], r["keeper"]) for r in fingerprint_dedup_groups(docs_df).collect() ]
    # 0, 1, 3 share the token set
    assert (3, 0) in out


def test_minhash_lsh_finds_dups(spark):
    from mongoesindexer_spark.operators.dedup import minhash_lsh_candidates
    rng = np.random.RandomState(3)
    base = [f"w{int(x)}" for x in rng.randint(0, 400, size=120)]
    near = list(base)
    near[60] = "CHANGED"                       # jaccard ≈ 0.95 on 3-gram shingles
    other = [f"v{int(x)}" for x in rng.randint(0, 400, size=120)]
    df = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(base)), (2, " ".join(near)),
         (3, " ".join(other))],
        "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["n_bands"]
             for r in minhash_lsh_candidates(df, num_hashes=32, bands=8).collect()}
    assert pairs.get((0, 1)) == 8          # identical docs collide in all bands
    assert (0, 2) in pairs                 # high-jaccard near-dup caught
    assert (0, 3) not in pairs             # unrelated docs don't collide
    # portable (md5) hash family: same pipeline, same guarantees — this
    # is the variant the DuckDB oracle reproduces bit-identically
    # (minhash_lsh_pairs_portable); collision sets may differ only on
    # borderline near-dups, never on exact dups or unrelated docs
    md5_pairs = {(r["id_a"], r["id_b"]): r["n_bands"]
                 for r in minhash_lsh_candidates(
                     df, num_hashes=32, bands=8, hash_fn="md5").collect()}
    assert md5_pairs.get((0, 1)) == 8
    assert (0, 2) in md5_pairs
    assert (0, 3) not in md5_pairs
    import pytest
    with pytest.raises(ValueError, match="hash_fn"):
        minhash_lsh_candidates(df, hash_fn="sha1")


def test_ngram_jaccard_exact(spark, docs_df):
    from mongoesindexer_spark.operators.dedup import ngram_jaccard
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard(docs_df, pairs).collect()}
    assert got[(0, 1)] == 1.0

    def py_jacc(a, b, k=3):
        sa = {" ".join(a.split()[i:i+k]) for i in range(len(a.split())-k+1)}
        sb = {" ".join(b.split()[i:i+k]) for i in range(len(b.split())-k+1)}
        return len(sa & sb) / len(sa | sb)

    texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    assert abs(got[(0, 2)] - py_jacc(texts[0], texts[2])) < 1e-12
    assert got[(0, 4)] == 0.0


def test_simhash_properties(spark, docs_df):
    from mongoesindexer_spark.operators.dedup import simhash
    out = {r["id"]: r["simhash"] for r in simhash(docs_df).collect()}
    assert out[0] == out[1]                # identical text → identical hash
    ham_near = bin((out[0] ^ out[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((out[0] ^ out[4]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far              # near dup closer than unrelated
    assert out[7] == 0                     # empty doc → zero hash


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    from mongoesindexer_spark.operators.ann import cosine_topk
    got = [(r["id"], r["cosine"]) for r in cosine_topk(df, q, 5).collect()]
    qv = vecs[0].astype(np.float64)
    sims = vecs.astype(np.float64) @ qv / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(qv))
    want_ids = np.lexsort((np.arange(50), -sims))[:5]
    assert [g[0] for g in got] == want_ids.tolist()
    for (gid, gcos) in got:
        assert abs(gcos - sims[gid]) < 1e-6


def test_cosine_lsh_recalls_self(spark):
    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[3]]
    from mongoesindexer_spark.operators.ann import cosine_topk_lsh
    got = [r["id"] for r in cosine_topk_lsh(df, q, 5, dim=16, n_planes=4).collect()]
    assert got and got[0] == 3  # the query vector itself lands in its own bucket


def test_quality_metrics(spark, docs_df):
    from mongoesindexer_spark.functions.textstats import quality_metrics
    out = {r["id"]: r for r in quality_metrics(docs_df).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[0]["n_distinct"] == 8       # 'the' twice
    assert out[0]["n_stop"] == 2           # 'the' x2 ('over' not in set)
    assert out[7]["n_tokens"] == 0


def test_lang_id(spark, docs_df):
    from mongoesindexer_spark.functions.textstats import lang_id
    out = {r["id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert out[0] == "en"
    assert out[5] == "fr"
    assert out[6] == "es"
    assert out[7] == "und"


def test_token_counts(spark):
    from mongoesindexer_spark.functions.textstats import token_counts
    df = spark.createDataFrame([(0, "Hello, world! ipv6_addr is 99% fine")],
                               "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 6
    # hello / , / world / ! / ipv6 / _ / addr / is / 99 / % / fine
    assert r["bpe_ish_tokens"] == 11


def test_winnow_fingerprints_deterministic(spark, docs_df):
    from mongoesindexer_spark.functions.textstats import winnow_fingerprints
    a = {r["id"]: r["fingerprints"] for r in winnow_fingerprints(docs_df).collect()}
    b = {r["id"]: r["fingerprints"] for r in winnow_fingerprints(docs_df.repartition(5)).collect()}
    assert a == b                          # partitioning-invariant
    assert a[0] == a[1]                    # identical docs → identical fingerprints
    assert a[7] == []
    # near-dups share most fingerprints
    inter = len(set(a[0]) & set(a[2]))
    assert inter / len(set(a[0]) | set(a[2])) > 0.5


def test_lookup_join_semantics(spark):
    from mongoesindexer_spark.operators.lookup import lookup
    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pk long, pname string")
    children = spark.createDataFrame(
        [(1, "x", False), (1, "y", True), (3, "z", False)],
        "fk long, cname string, deleted boolean")
    out = lookup(parents, children, "pk", "fk", "kids",
                 child_filter=F.col("deleted") == False,   # noqa: E712
                 child_project=["cname"])
    rows = {r["pk"]: [c["cname"] for c in r["kids"]] for r in out.collect()}
    assert rows[1] == ["x"]        # 'y' filtered by sub-pipeline
    assert rows[2] == []           # missing FK → empty array, parent kept
    assert rows[3] == ["z"]


def test_changed_fields_subset(spark):
    from mongoesindexer_spark.operators.lookup import changed_fields_subset
    ev = spark.createDataFrame(
        [(1, ["lastESIndexedAt"]), (2, ["title", "lastESIndexedAt"]), (3, [])],
        "id long, changed array<string>")
    out = ev.filter(changed_fields_subset(ev, "changed", ["lastESIndexedAt", "lastESIndexResponse"]))
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_multimodal_plumbing(spark):
    from mongoesindexer_spark.multimodal.binary import (
        decode_features, fake_decoder, frame_sample, media_metadata)
    blobs = [
        (0, b"\x89PNG\r\n" + b"a" * 100, "image"),
        (1, b"\xff\xd8\xff\xe0" + b"b" * 3000, "image"),
        (2, b"RIFF" + b"c" * 500, "audio"),
        (3, b"", "image"),
    ]
    df = spark.createDataFrame(blobs, "media_id long, blob binary, kind string")
    meta = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert meta[0]["mime"] == "image/png" and meta[0]["n_bytes"] == 106
    assert meta[1]["mime"] == "image/jpeg"
    assert meta[2]["mime"] == "audio/wav"

    # default decoder is an explicit stub
    with pytest.raises(Exception):
        decode_features(df).collect()

    feats = {r["media_id"]: r["features"] for r in
             decode_features(df, decoder=fake_decoder).collect()}
    assert len(feats) == 4 and all(len(v) == 16 for v in feats.values())
    # deterministic across partitionings
    feats2 = {r["media_id"]: r["features"] for r in
              decode_features(df.repartition(3), decoder=fake_decoder).collect()}
    assert feats == feats2

    frames = frame_sample(df, every_n_bytes=1024).groupBy("media_id").count()
    got = {r["media_id"]: r["count"] for r in frames.collect()}
    assert got[1] == 2 and got[0] == 1 and got[3] == 1


def test_embedding_near_dups_exact_and_lsh(spark):
    from mongoesindexer_spark.operators.ann import (embedding_near_dups,
                                                    embedding_near_dups_lsh)
    rng = np.random.RandomState(7)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    vecs = list(base)
    vecs.append(base[0] + rng.standard_normal(8).astype(np.float32) * 0.01)  # ~dup of 0
    vecs.append(base[5])                                                     # exact dup of 5
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")

    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(df, 0.95).collect()}
    assert (0, 20) in exact and (5, 21) in exact

    # LSH candidates are a subset of the exact pairs (verified cosine),
    # and exact duplicates always share a bucket → never missed
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dups_lsh(df, 0.95, dim=8, n_planes=4).collect()}
    assert lsh <= exact
    assert (5, 21) in lsh


def test_search_engine_cache_invalidates_after_sync(spark, tmp_path):
    """Regression: a query in the SAME process after an incremental sync
    must see tombstones/new docs (get_engine version must be frozen at
    construction, not read live)."""
    from pyspark.sql import functions as F
    from mongoesindexer_spark.operators.build_index import IndexBuilder
    from mongoesindexer_spark.operators.topk import bm25_topk_df
    from mongoesindexer_spark.streaming.incremental import IncrementalIndexer

    idx = str(tmp_path / "idx")
    pages = spark.createDataFrame(
        [(f"https://r/{i}", "zebra alpha") for i in range(6)],
        "url string, text string") \
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))) \
        .withColumn("html", F.lit(None).cast("binary")) \
        .withColumn("lang", F.lit("en"))
    IndexBuilder(idx).build(spark, pages)
    assert bm25_topk_df(spark, idx, "zebra", 50).count() == 6  # warms cache

    updates = spark.createDataFrame(
        [("delete", "https://r/0", None)], "op string, url string, text string") \
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-02 00:00:00"))) \
        .withColumn("html", F.lit(None).cast("binary")) \
        .withColumn("lang", F.lit("en")) \
        .select("op", "url", "warc_ts", "html", "text", "lang")
    IncrementalIndexer(idx).apply_updates(spark, updates, batch_id="b1")
    assert bm25_topk_df(spark, idx, "zebra", 50).count() == 5


def test_neardup_clusters_transitive(spark):
    """A~B and B~C (no A~C edge) must land in ONE component labeled by
    the min id; disconnected pairs stay separate; singletons (no pairs)
    are absent from the output by design."""
    from mongoesindexer_spark.operators.dedup import neardup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 7)],
        "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7, 20: 7}


def test_neardup_clusters_long_chain(spark):
    """A path graph needs diameter-many propagation rounds — the loop
    must iterate to the fixpoint, not stop after one round."""
    from mongoesindexer_spark.operators.dedup import neardup_clusters
    n = 9
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in neardup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_neardup_clusters_nonconvergence_raises(spark):
    """If a component's diameter exceeds max_iters the function must fail
    loudly, never return a silently-split component."""
    import pytest

    from mongoesindexer_spark.operators.dedup import neardup_clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(pairs, max_iters=3)


def test_simhash_fnv_chunking_exact_and_bounded(spark, monkeypatch):
    """The FNV kernel hashes in length-bucketed chunks so one pathological
    multi-KB token can't inflate the (vocab, max_token_len) scatter matrix
    to vocab x MBs (executor OOM).  Chunked output must stay bit-identical
    to the sequential FNV-1a reference — verified with the budget shrunk
    far enough that a single batch spans many chunks."""
    from mongoesindexer_spark.operators import dedup

    monkeypatch.setattr(dedup, "FNV_BUDGET_BYTES", 1 << 12)  # 4 KB

    def fnv_ref(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
        return h

    long_tok = "x" * 20_000  # alone exceeds the shrunk budget
    toks = [f"tok{i}" for i in range(50)] + ["y" * 300, long_tok]
    # single-token docs: the doc's simhash IS its token's FNV hash bits
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, text string")
    got = {r["id"]: r["simhash"] & ((1 << 64) - 1)
           for r in dedup.simhash(df).collect()}
    for i, t in enumerate(toks):
        assert got[i] == fnv_ref(t), t[:20]


def test_textstats_split_on_any_whitespace(spark):
    """token_counts/quality_metrics tokenize with \\s+ so they agree with
    the dedup operators and the DuckDB oracles on multi-whitespace text
    (regression: literal-space split saw 'foo\\nbar' as one token)."""
    from mongoesindexer_spark.functions.textstats import (quality_metrics,
                                                          token_counts)
    df = spark.createDataFrame(
        [(0, "foo\nbar  baz\tqux")], "doc_id long, text string")
    tc = token_counts(df).collect()[0]
    assert tc["ws_tokens"] == 4
    qm = quality_metrics(df).collect()[0]
    assert qm["n_tokens"] == 4


def test_lookup_preserves_duplicate_parents(spark):
    """Mongo $lookup keeps each parent document — two fully-identical
    parent rows must yield two output rows (the old groupBy-all-parent-
    columns implementation collapsed them)."""
    from mongoesindexer_spark.operators.lookup import lookup
    parents = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "pk long, pname string")
    children = spark.createDataFrame([(1, "x")], "fk long, cname string")
    out = lookup(parents, children, "pk", "fk", "kids")
    assert out.count() == 3
    dup = [r for r in out.collect() if r["pk"] == 1]
    assert len(dup) == 2 and all([c["cname"] for c in r["kids"]] == ["x"]
                                 for r in dup)


def test_decontaminate(spark, docs_df):
    """n-gram decontamination vs brute force: bench = docs {2, 4};
    k=3-gram overlap, distinct-count semantics, zero-hit docs present."""
    from mongoesindexer_spark.operators.dedup import decontaminate

    bench = docs_df.filter(F.col("doc_id").isin([2, 4]))
    got = {r["doc_id"]: (r["n_shingles"], r["n_hits"], r["contaminated"])
           for r in decontaminate(docs_df, bench, shingle_k=3).collect()}

    rows = {r["doc_id"]: r["text"] for r in docs_df.collect()}

    def shingles(t, k=3):
        toks = [x for x in t.lower().split() if x]
        if len(toks) >= k:
            return {" ".join(toks[i:i + k])
                    for i in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    bench_sh = set().union(*(shingles(rows[i]) for i in (2, 4)))
    for d, t in rows.items():
        sh = shingles(t)
        hits = len(sh & bench_sh)
        assert got[d] == (len(sh), hits, hits >= 1), d
    # every train doc present, incl. zero-hit ones
    assert set(got) == set(rows)
    assert any(h == 0 for _, h, _ in got.values())
    # higher threshold flips borderline docs off
    strict = {r["doc_id"]: r["contaminated"]
              for r in decontaminate(docs_df, bench, shingle_k=3,
                                     min_hits=10**6).collect()}
    assert not any(strict.values())
