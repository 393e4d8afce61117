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
        qbucket = qbucket * 2 + int(planes[i] @ qv > 0)
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
