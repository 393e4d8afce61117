"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (JVM-side zip_with/aggregate
arithmetic — no Python in the plan); the scale path buckets vectors with
random-hyperplane LSH so each query probes one bucket group instead of the
full corpus.  Hyperplanes are generated from a fixed seed so bucketing is
deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k: (id, cosine) desc, ties by id asc.

    The scan is embarrassingly parallel; top-k is TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64))) or 1.0
    return (
        df.select(
            F.col(id_col).alias("id"),
            (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _normalized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, nv): unit-normalized double vectors — norms computed once per
    row, so the pairwise cosine below is a plain dot product."""
    d = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("n", _norm(F.col("v")))
    return d.select(
        "id", F.transform("v", lambda x: x / F.col("n")).alias("nv"))


def embedding_near_dups(df: DataFrame, threshold: float,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, cosine)
    with id_a < id_b and cosine >= threshold.

    The self-join is a broadcast nested-loop (O(n^2) comparisons) — the
    exact baseline for small corpora and the verifier for candidates.  At
    10^12-row scale use :func:`embedding_near_dups_lsh`, whose bucket
    equi-join shuffles instead of crossing.
    """
    nv = _normalized(df, vec_col, id_col)
    a = nv.select(F.col("id").alias("id_a"), F.col("nv").alias("va"))
    b = nv.select(F.col("id").alias("id_b"), F.col("nv").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups_lsh(df: DataFrame, threshold: float, dim: int,
                            n_planes: int = 6, vec_col: str = "embedding",
                            id_col: str = "vec_id", seed: int = 42,
                            n_tables: int = 1) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH candidate generation.

    Vectors only compare within their bucket → the join is an equi-join on
    bucket (shuffle-partitionable, no cross product); candidate pairs are
    deduped across tables and then verified with the exact cosine, so
    precision is 1 (every emitted pair truly clears the threshold) while
    recall < 1 by construction (pairs split across buckets are missed).
    ``n_tables`` is OR-amplification: each extra table re-buckets with a
    different plane seed and a pair is a candidate if it collides in ANY
    table — recall → 1 exponentially in n_tables at linear candidate cost
    (tests/test_ann_recall.py pins the floor).
    """
    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    cands = None
    for t in range(n_tables):
        bk = hyperplane_buckets(df, dim, n_planes, vec_col, id_col,
                                seed + t).select("id", "bucket")
        a = bk.select("bucket", F.col("id").alias("id_a"))
        b = bk.select("bucket", F.col("id").alias("id_b"))
        c = (a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    nv = _normalized(df, vec_col, id_col)
    return (
        cands
        .join(nv.select(F.col("id").alias("id_a"), F.col("nv").alias("va")),
              "id_a")
        .join(nv.select(F.col("id").alias("id_b"), F.col("nv").alias("vb")),
              "id_b")
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: sign-bit code over
    ``n_planes`` fixed hyperplanes → int bucket (id, bucket)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), p) > 0).cast("int")
        bucket = bucket * 2 + bit
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"),
                     F.col(vec_col).alias("vec"))


def cosine_topk_lsh(df: DataFrame, query_vec: list[float], k: int, dim: int,
                    n_planes: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 42) -> DataFrame:
    """Approximate cosine top-k: probe only the query's LSH bucket.

    At 10^12 rows the bucketed table is written partitioned by bucket so a
    probe is a partition-pruned scan of ~corpus/2^n_planes vectors."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i in range(n_planes):
        # _fold_dot, NOT planes[i] @ qv: the corpus rows' buckets (and the
        # DuckDB oracle) accumulate strictly left-to-right, and numpy's
        # pairwise-blocked dot can flip the sign of a last-ulp near-zero
        # projection — probing a different bucket than the rows landed in
        qbucket = qbucket * 2 + int(_fold_dot(planes[i], qv) > 0)
    bucketed = hyperplane_buckets(df, dim, n_planes, vec_col, id_col, seed)
    cand = bucketed.filter(F.col("bucket") == qbucket)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(qv)) or 1.0
    return (
        cand.select(
            "id",
            (_dot(F.col("vec"), q) / (_norm(F.col("vec")) * F.lit(qn))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization — the other classic ANN scale
# path (inverted-file indexes per Sivic & Zisserman "Video Google" ICCV
# 2003 as popularized by FAISS, Johnson et al. 2017; random-hyperplane
# LSH above per Charikar, STOC 2002)
# ---------------------------------------------------------------------------


def seeded_spherical_centroids(n_clusters: int, dim: int,
                               seed: int = 42) -> np.ndarray:
    """Data-independent coarse-quantizer codebook: ``n_clusters`` seeded
    gaussian directions, unit-normalized (spherical random quantization).

    Deterministic given (n_clusters, dim, seed), so an external oracle can
    reproduce the exact Voronoi assignment from the same literals — the
    production path trains the codebook instead (:func:`train_ivf_centroids`),
    which the same assign/probe machinery consumes unchanged."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(df: DataFrame, n_clusters: int, dim: int,
                        sample_n: int = 10_000, n_iters: int = 10,
                        seed: int = 42, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> np.ndarray:
    """Spherical k-means codebook from a deterministic driver-side sample.

    The sample is the ``sample_n`` smallest ids (TakeOrdered — one pass,
    no full collect); Lloyd iterations run in numpy on the driver.  At
    10^12 rows the sample stays driver-sized (codebook training needs
    thousands of points per centroid, not the corpus) while ASSIGNMENT —
    the corpus-sized step — stays distributed in :func:`ivf_assign`."""
    rows = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .orderBy("id").limit(sample_n).collect())
    x = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
    c = seeded_spherical_centroids(n_clusters, dim, seed)
    for _ in range(n_iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_clusters):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                c[j] = v / (np.linalg.norm(v) + 1e-12)
    return c


def _dot_literal(col, vec: np.ndarray):
    return _dot(col, F.array(*[F.lit(float(x)) for x in vec]))


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(id, cluster, vec): nearest-centroid Voronoi cell per vector.

    Pure JVM: k dot products per row (codebook ships as literals), argmax
    via ``array_position(dots, array_max(dots))`` — first index wins ties,
    matching `ORDER BY dot DESC, cid ASC`.  Ranking by raw dot equals
    ranking by cosine (|row| is constant across candidates, |c|=1).  At
    scale the output is written ``partitionBy("cluster")`` so a probe is a
    partition-pruned scan of ~corpus/n_clusters rows."""
    dots = F.array(*[_dot_literal(F.col(vec_col), c) for c in centroids])
    return df.select(
        F.col(id_col).alias("id"),
        (F.array_position(dots, F.array_max(dots)) - 1).cast("int").alias("cluster"),
        F.col(vec_col).alias("vec"),
    )


def _fold_dot(a, b) -> float:
    """Strict left-to-right float64 fold — bit-identical to the engine's
    JVM `aggregate` and DuckDB's `list_aggregate(..., 'sum')`, unlike
    numpy's pairwise-blocked np.dot (which can differ in the last ulp and
    flip near-tie cluster rankings between engine and oracle)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def cosine_topk_ivf(df: DataFrame, query_vec: list[float], k: int,
                    centroids: np.ndarray | None = None,
                    n_clusters: int = 8, n_probe: int = 2,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 42) -> DataFrame:
    """Approximate cosine top-k via IVF: probe only the ``n_probe``
    Voronoi cells nearest the query, exact cosine within them.

    ``centroids`` defaults to the seeded spherical codebook; pass a
    :func:`train_ivf_centroids` codebook in production.  Recall grows with
    n_probe (n_probe = n_clusters is exhaustive — pinned by tests)."""
    dim = len(query_vec)
    if centroids is None:
        centroids = seeded_spherical_centroids(n_clusters, dim, seed)
    qv = [float(x) for x in query_vec]
    order = sorted(range(len(centroids)),
                   key=lambda j: (-_fold_dot(qv, centroids[j]), j))
    probe = order[:n_probe]
    cand = ivf_assign(df, centroids, vec_col, id_col) \
        .filter(F.col("cluster").isin([int(j) for j in probe]))
    q = F.array(*[F.lit(x) for x in qv])
    qn = float(np.linalg.norm(np.asarray(qv, dtype=np.float64))) or 1.0
    return (
        cand.select(
            "id",
            (_dot(F.col("vec"), q) / (_norm(F.col("vec")) * F.lit(qn))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
