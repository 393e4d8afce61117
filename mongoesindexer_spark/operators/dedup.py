"""Deduplication operators for large-scale text corpora.

The reference dedups during migration with a per-batch anti-join on _id
(scripts/migrate-ltd-docs.js:59-66 — J5 in SURVEY §2.3); a web-scale corpus
additionally needs content dedup (MinHash/LSH per Broder, "On the
resemblance and containment of documents", 1997, banding per Leskovec/
Rajaraman/Ullman MMDS ch.3; SimHash per Charikar, STOC 2002, as deployed
for web crawls in Manku et al., WWW 2007).  All operators below are DataFrame-native
(JVM expressions; no Python in the hot path except the numpy SimHash
kernel), shuffle once on the dedup key, and scale by construction: the
grouping key is always a fixed-width hash/bucket, so skew is bounded by
true duplicate-group size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# \s+ (not a literal space) so every operator in this module agrees with
# the simhash kernel's ASCII-\s split on multi-whitespace text — a literal
# ' ' split would treat "foo\nbar" as one token here but two there, giving
# inconsistent dedup verdicts across operators on the same corpus.  (Java's
# \s is ASCII-only, so the simhash Python kernel splits with re.ASCII to
# match; the full-text analyzers deliberately keep unicode-aware .split()
# — that is ES whitespace-tokenizer parity, a different contract.)
TOKENS = r"filter(split(lower({col}), '\\s+'), x -> x != '')"

# the Python-side twin of TOKENS (see comment above)
_WS_ASCII = __import__("re").compile(r"\s+", __import__("re").ASCII)

# Cap on the simhash FNV kernel's (tokens, max_token_len) scatter matrix;
# module-level so tests can shrink it to force multi-chunk execution.
FNV_BUDGET_BYTES = 64 << 20


def _tokens(col: str):
    return F.expr(TOKENS.format(col=col))


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: (text_md5, n_docs, keeper).

    Keeper = min id (deterministic).  One shuffle on the 128-bit hash."""
    return (
        df.select(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_md5"),
                  F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper"))
    )


def fingerprint_dedup_groups(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Bag-of-words (order/multiplicity-insensitive) duplicate groups:
    fingerprint = md5 of the sorted distinct token set."""
    fp = F.md5(F.encode(
        F.array_join(F.array_sort(F.array_distinct(_tokens(text_col))), " "),
        "UTF-8",
    )).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 32,
                       shingle_k: int = 3,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash signatures over k-token shingles, fully JVM-side.

    hash_i(shingle) = xxhash64(i, shingle); minhash_i = min over shingles.
    Output: (id, sig: array<long> of length num_hashes).

    ``hash_fn="md5"`` swaps the hash family for
    hash_i(shingle) = md5(i || '|' || shingle) (lowercase hex string,
    minhash = lexicographic min; sig becomes array<string>) — the SAME
    algorithm with a hash both Spark and DuckDB implement bit-identically,
    so the LSH pipeline gains an EXACT cross-engine oracle
    (``minhash_lsh_pairs_portable``); xxhash64 stays the default — it is
    several times cheaper per shingle and collision quality is equivalent
    for banding purposes (Broder 1997 needs only a min-wise independent
    family).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    out = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("toks"))
    out = out.withColumn(
        "shingles",
        F.when(
            F.size("toks") >= shingle_k,
            F.expr(
                f"transform(sequence(0, size(toks) - {shingle_k}), "
                f"i -> concat_ws(' ', {', '.join(f'toks[i+{j}]' for j in range(shingle_k))}))"
            ),
        ).otherwise(F.array(F.concat_ws(" ", F.col("toks")))),
    )
    if hash_fn == "md5":
        hash_expr = "transform(shingles, s -> md5(concat('{i}', '|', s)))"
    else:
        hash_expr = "transform(shingles, s -> xxhash64({i}, s))"
    sig = F.array(*[
        F.array_min(F.expr(hash_expr.format(i=i)))
        for i in range(num_hashes)
    ]).alias("sig")
    return out.select("id", sig)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 32,
                           bands: int = 8, shingle_k: int = 3,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    shingle → minhash(num_hashes) → split into ``bands`` bands of
    ``num_hashes/bands`` rows → bucket = hash(band slice) → self-join per
    bucket.  Output: (id_a, id_b, n_bands) with id_a < id_b.  The bucket
    join is the only shuffle; bucket sizes are bounded by true near-dup
    cluster size, not corpus size.

    ``hash_fn="md5"``: portable hash family (see
    :func:`minhash_signatures`) — band buckets become md5 hex strings and
    the whole pipeline is reproducible verbatim in DuckDB SQL.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k,
                              hash_fn=hash_fn)

    def _bucket(b: int):
        sl = f"concat_ws(',', slice(sig, {b * rows + 1}, {rows}))"
        if hash_fn == "md5":
            return F.expr(f"md5(concat('{b}', '|', {sl}))")
        return F.xxhash64(F.lit(b), F.expr(sl))

    banded = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(right, (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )
    return pairs


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", shingle_k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification pass after
    LSH): (id_a, id_b, jaccard)."""
    cat = ", ".join(f"toks[i+{j}]" for j in range(shingle_k))
    sh = (
        df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("toks"))
        .withColumn(
            "sh",
            F.array_distinct(F.when(
                F.size("toks") >= shingle_k,
                F.expr(f"transform(sequence(0, size(toks) - {shingle_k}), "
                       f"i -> concat_ws(' ', {cat}))"),
            ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))),
        )
        .select("id", "sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .select("id_a", "id_b",
                (F.col("inter") / F.col("uni")).alias("jaccard"))
    )
    return j


def ngram_jaccard_pairs_exact(df: DataFrame, threshold: float = 0.5,
                              text_col: str = "text", id_col: str = "doc_id",
                              shingle_k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs over ALL doc pairs — the
    O(n²) verification-sized twin of ``minhash_lsh_candidates`` +
    ``ngram_jaccard`` (which is the 100 TB path: LSH bounds the candidate
    set, this does not).  Deterministic and SQL-expressible, so it carries
    the exact correctness oracle for the Jaccard kernel."""
    cat = ", ".join(f"toks[i+{j}]" for j in range(shingle_k))
    sh = (
        df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("toks"))
        .withColumn(
            "sh",
            F.array_distinct(F.when(
                F.size("toks") >= shingle_k,
                F.expr(f"transform(sequence(0, size(toks) - {shingle_k}), "
                       f"i -> concat_ws(' ', {cat}))"),
            ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))),
        )
        .select("id", "sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc (near-dup by small hamming distance).

    numpy kernel in mapInPandas: token hash bits weighted by tf, sign of
    the per-bit sum.  Token hashing is a stable FNV-1a 64, fully
    vectorized: each Arrow batch hashes its DISTINCT token vocabulary once
    (byte-position-parallel across all tokens — ~max_token_len numpy
    passes), then per-doc signatures are one scatter-add over
    (doc, token) pairs.  No per-token or per-byte Python in the hot path.
    """

    def _fnv1a_chunk(bs: list[bytes], lens: np.ndarray) -> np.ndarray:
        """FNV-1a 64 of each (utf-8 encoded) token; bit-identical to the
        sequential reference implementation."""
        n = len(bs)
        total = int(lens.sum())
        flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
        maxlen = int(lens.max()) if n else 0
        # scatter the ragged byte streams into a (n, maxlen) matrix
        mat = np.zeros((n, maxlen), dtype=np.uint8)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        col = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        mat[row, col] = flat
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for kpos in range(maxlen):
            active = lens > kpos
            h[active] = (h[active] ^ mat[active, kpos].astype(np.uint64)) * prime
        return h

    def _fnv1a_many(tokens: np.ndarray) -> np.ndarray:
        """Hash in length-sorted chunks whose scatter matrix stays under a
        fixed byte budget: one pathological multi-MB token (minified JS or
        base64 that survived html extraction) would otherwise inflate the
        (vocab, max_token_len) matrix to vocab × MBs and OOM the executor.
        Each token's hash depends only on its own bytes, so chunked output
        is bit-identical to the one-shot computation."""
        bs = [t.encode("utf-8") for t in tokens]
        lens = np.array([len(b) for b in bs], dtype=np.int64)
        n = len(bs)
        out = np.empty(n, dtype=np.uint64)
        if not n:
            return out
        budget = FNV_BUDGET_BYTES
        order = np.argsort(lens, kind="stable")
        sl = lens[order]
        start = 0
        while start < n:
            # ascending lengths: estimate rows from the chunk's shortest
            # token, then clip against its actual longest (one re-clip is
            # enough — shrinking the chunk can only shrink its max length)
            rows = max(1, int(budget // max(1, int(sl[start]))))
            end = min(n, start + rows)
            maxlen = int(sl[end - 1])
            if maxlen and (end - start) * maxlen > budget:
                end = start + max(1, int(budget // maxlen))
            idx = order[start:end]
            out[idx] = _fnv1a_chunk([bs[i] for i in idx], lens[idx])
            start = end
        return out

    def _kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitpos = np.arange(64, dtype=np.uint64)
        for pdf in it:
            ids = pdf["id"].values
            tok_lists = [[t for t in _WS_ASCII.split((txt or "").lower()) if t]
                         for txt in pdf["text"].values]
            doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64),
                                [len(t) for t in tok_lists])
            all_toks = np.array([t for toks in tok_lists for t in toks],
                                dtype=object)
            if all_toks.size == 0:
                yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                    "simhash": pd.Series(np.zeros(len(ids)),
                                                         dtype="int64")})
                continue
            # hash each distinct token ONCE per batch (zipf: vocab ≪ tokens)
            vocab, inv = np.unique(all_toks, return_inverse=True)
            hs = _fnv1a_many(vocab)
            sign = np.where(
                ((hs[:, None] >> bitpos[None, :]) & np.uint64(1)) == 1, 1, -1
            ).astype(np.int64)                       # (vocab, 64)
            acc = np.zeros((len(ids), 64), dtype=np.int64)
            np.add.at(acc, doc_idx, sign[inv])       # tf-weighted via repeats
            sig_bits = (acc > 0).astype(np.uint64)
            sigs = (sig_bits << bitpos[None, :]).sum(axis=1)
            out = sigs.astype(np.int64)              # two's-complement view
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(out, dtype="int64")})

    return (
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(text_col).alias("text"))
        .mapInPandas(_kernel, schema="id long, simhash long")
    )


def neardup_clusters(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b", max_iters: int = 50) -> DataFrame:
    """Connected components over near-dup pairs → ``(id, cluster_id)``
    with ``cluster_id`` = the component's minimum member id — the step a
    training-data pipeline runs AFTER pair generation (MinHash/SimHash/
    embedding LSH all emit PAIRS; dedup keeps one doc per component, and
    transitive duplicates A~B~C must collapse even when (A, C) was never
    emitted).

    Algorithm: iterative hash-min label propagation.  Each round, every
    node takes the min label among itself and its neighbors — one
    broadcast-free equi-join + one groupBy per round, all JVM.  Rounds
    needed = graph diameter; near-dup components are small by
    construction (they are sets of mutual near-duplicates), so this
    converges in a handful of rounds at any corpus size, and each round
    shuffles only ``2·|pairs|`` rows — no all-pairs blowup.  The
    convergence check is a scalar ``count`` per round (driver sees one
    number, never the data).  Deterministic: labels are ids, min is
    order-free.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct())
    labels = (edges.select(F.col("src").alias("id"))
              .distinct()
              .withColumn("cluster_id", F.col("id")))
    for _ in range(max_iters):
        # neighbor labels: edge (src → dst) carries src's current label
        prop = (edges.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("cluster_id").alias("nbr_min")))
        nxt = (labels.join(prop, "id", "left")
               .select("id", F.least("cluster_id", "nbr_min")
                       .alias("cluster_id")))
        # localCheckpoint (eager): materializes this round AND truncates
        # the logical plan — without it the nested join lineage grows
        # every round and Catalyst analysis time explodes by ~round 6
        # (the standard iterative-algorithm failure mode)
        nxt = nxt.localCheckpoint()
        changed = (nxt.join(labels.withColumnRenamed("cluster_id", "old"),
                            "id")
                   .filter(F.col("cluster_id") != F.col("old"))
                   .count())
        labels = nxt
        if changed == 0:
            break
    else:
        # a silent non-fixpoint return would split one transitive
        # component into several cluster_ids and keep extra "keepers"
        # with no sign anything went wrong — fail loudly instead
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing): a component's diameter "
            f"exceeds max_iters — raise max_iters (rounds needed = "
            "distance from each component's min-id node)")
    return labels.select("id", "cluster_id")


def decontaminate(train: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 8, min_hits: int = 1,
                  broadcast_bench: bool = True) -> DataFrame:
    """Benchmark DECONTAMINATION: per train doc, the count of distinct
    k-gram shingles shared with ANY benchmark doc — the n-gram overlap
    rule public training pipelines apply before training (the 13-gram
    filter of Brown et al. 2020, "Language Models are Few-Shot
    Learners" appendix C; k and the hit threshold are parameters).
    Returns (doc_id, n_shingles, n_hits, contaminated) for EVERY train
    doc — zero-hit docs included, so the frame is directly usable as an
    anti-join mask.

    Scale shape: the benchmark side is orders of magnitude smaller than
    the training corpus, so its DISTINCT shingle hash set (xxhash64 —
    8-byte longs, never raw strings) broadcasts and the train side pays
    ONE scan + a map-side broadcast join + per-doc aggregation: the
    100 TB corpus never shuffles.  ``broadcast_bench=False`` switches
    to a shuffled equi-join on the shingle hash for benchmark suites
    too large to broadcast (cost then ∝ train shingles, one exchange).
    64-bit hash collisions can in principle overcount a hit; at any
    real benchmark size the probability is ~2⁻⁴⁰ per corpus, and the
    rule's consumers threshold on counts, not exact equality."""
    cat = ", ".join(f"toks[i+{j}]" for j in range(shingle_k))
    sh_expr = F.array_distinct(F.when(
        F.size("toks") >= shingle_k,
        F.expr(f"transform(sequence(0, size(toks) - {shingle_k}), "
               f"i -> concat_ws(' ', {cat}))"),
    ).otherwise(F.array(F.concat_ws(" ", F.col("toks")))))
    src = train.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    sc = train.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        # a few-file input would serialize the shingle explode into a
        # handful of tasks; spread the cheap (id, text) projection
        # first — a no-op at corpus scale, where input splits already
        # exceed the core count (this branch never triggers)
        src = src.repartition(sc.defaultParallelism)
    # explode_OUTER, deliberately: plain explode makes Catalyst infer a
    # size(sh) > 0 filter (InferFiltersFromGenerate) and push the WHOLE
    # shingle expression down into the file scan — evaluating it twice,
    # once inside a single scan task.  sh is never empty by construction
    # (the else-branch emits one whole-doc shingle), so outer semantics
    # are identical and the inferred filter never appears.
    tr = (src.select("doc_id", _tokens(text_col).alias("toks"))
          .withColumn("sh", sh_expr)
          .select("doc_id", F.explode_outer("sh").alias("shingle"))
          .select("doc_id", F.xxhash64("shingle").alias("h")))
    bh = (bench.select(_tokens(text_col).alias("toks"))
          .withColumn("sh", sh_expr)
          .select(F.explode_outer("sh").alias("shingle"))
          .select(F.xxhash64("shingle").alias("h")).distinct()
          .withColumn("_m", F.lit(1)))
    if broadcast_bench:
        bh = F.broadcast(bh)
    # ONE corpus scan: a broadcast LEFT join marks matched shingles,
    # and a single per-doc aggregation carries both counts (rows per
    # doc are already distinct shingles — sh_expr array_distincts)
    joined = tr.join(bh, "h", "left")
    return (joined.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.coalesce(
                     F.sum(F.when(F.col("_m").isNotNull(), 1)
                           .otherwise(0)), F.lit(0)).cast("long")
                 .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") >= min_hits))
