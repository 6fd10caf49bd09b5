"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (O(Q x N) — fine when the
query set is small or broadcastable). The scale path is LSH bucketing:
random-hyperplane signs computed from deterministic md5-derived planes,
bucket equi-join, then exact re-rank within buckets — the same
shuffle-only-small-keys discipline as dedup.py.

Dot products use built-in higher-order functions (zip_with + aggregate)
over double-cast arrays: JVM-side, no Python, deterministic left-to-right
summation order (matches the DuckDB oracle's list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    At 100 TB the corpus side streams through executors once; the query
    side must be broadcast-sized (use LSH bucketing otherwise).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def _plane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d is derived from
    md5(plane_idx:d) mapped to [-0.5, 0.5). Engine-independent."""
    return F.array(
        *[
            (
                F.conv(F.substring(F.md5(F.lit(f"{plane_idx}:{d}")), 1, 8), 16, 10).cast(
                    "double"
                )
                / F.lit(float(16**8))
                - 0.5
            )
            for d in range(dim)
        ]
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed to int."""
    out = F.lit(0)
    for p in range(n_planes):
        out = out + F.when(dot(vec, _plane(dim, p)) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets.

    With b planes the corpus splits into 2^b buckets → ~N/2^b exact
    comparisons per query. Recall is tested against brute force in
    tests/test_dataops.py.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), dim, n_planes))
    c = corpus.select(
        F.col(id_col).alias("match_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )
