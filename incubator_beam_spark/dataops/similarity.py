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
    # norms are precomputed per vector BEFORE the pair join: the pairwise
    # work drops from 3 interpreted dot products to 1.
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("match_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def plane_components(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d derives from
    md5(plane_idx:d) mapped to [-0.5, 0.5). Computed driver-side with
    hashlib so the identical literals can be embedded in oracle SQL (and
    Catalyst sees plain constants instead of 64 md5 calls per plane)."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane_idx}:{d}".encode()).hexdigest()[:8], 16)
        / float(16**8)
        - 0.5
        for d in range(dim)
    ]


def _plane(dim: int, plane_idx: int) -> Column:
    return F.array(*[F.lit(v) for v in plane_components(dim, plane_idx)])


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
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("bucket", lsh_bucket(F.col("qv"), dim, n_planes))
        .withColumn("qn", norm(F.col("qv")))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("match_id"), as_double(F.col(vec_col)).alias("cv")
        )
        .withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
        .withColumn("cn", norm(F.col("cv")))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def auto_planes(n_rows: int, target_bucket: int = 256, floor: int = 4, cap: int = 24) -> int:
    """Plane count so the expected bucket holds ~``target_bucket`` vectors:
    ceil(log2(N / target)). A FIXED plane count is a scale bug — 4 planes
    = 16 buckets makes the self-join ~N^2/16 regardless of N; planes must
    grow with the corpus for the bucket-local work to stay ~N*target."""
    import math

    if n_rows <= target_bucket:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n_rows / target_bucket))))


def neardup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.8,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 1000,
    verbose: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join, then
    exact cosine verify (the embedding analog of MinHash LSH dedup).

    One bucket per vector (sign bits of ``n_planes`` projections), so a
    pair is compared at most once — no candidate dedup pass needed. Only
    (bucket, id, vector) shuffles; at 100 TB the bucket join replaces the
    O(N^2) all-pairs comparison with ~N^2/2^planes bucket-local work.

    ``n_planes=None`` (default) scales the plane count with the corpus:
    one metadata-cheap ``count()`` sizes ``auto_planes`` so expected
    buckets stay ~256 vectors regardless of N (round-1 review: a fixed 4
    planes left the join quadratic at corpus scale). Pass an explicit
    count when the caller already knows N or needs a reproducible bucket
    layout (the gate query pins 4 to match its oracle).

    ``max_bucket`` caps bucket size (default 1000) the same way
    ``minhash_lsh_pairs`` caps band buckets: ``auto_planes`` sizes the
    EXPECTED bucket, but a degenerate embedding cluster (zero/near-zero
    vectors all sharing one sign pattern) makes one bucket quadratic at
    corpus scale regardless of plane count. By default over-cap buckets
    are dropped SILENTLY inside one plan: the hot-key removal is a
    map-side-combined count + broadcast anti-join whose build side
    reads the once-materialized bucket blocks (zero extra scan or
    shuffle). ``verbose=True`` makes the drop LOUD — a capped collect of
    the hot set feeds a warning with dropped bucket/vector counts and
    the anti-join probes the collected literal — at the cost of one
    extra scan+shuffle job (~1.5x the silent runtime at bench scale;
    the Exchange cannot be reused across jobs), which is why loud is
    opt-in. Unlike multi-band MinHash, a dropped sign-LSH bucket has no
    other band to recover through, so the drop trades recall on the
    degenerate cluster for a bounded join (the standard mitigation; the
    degenerate cluster is near-identical anyway and is better handled
    by exact dedup upstream). ``max_bucket=None`` disables the cap.
    """
    from .dedup import ensure_parallelism

    if n_planes is None:
        n_planes = auto_planes(emb.count())

    # parallel scan, bucket computed once, then MATERIALIZED once so the
    # hot-bucket count and both self-join sides read stored blocks —
    # ReuseExchange cannot dedupe these subtrees (the bucket projection's
    # HOF lambdas defeat plan canonicalization; measured r10: the
    # projection ran 4x per query, 0 ReusedExchange in the final plan).
    from .dedup import materialize_once

    v = materialize_once(
        ensure_parallelism(emb.select(F.col(id_col).alias("id"), F.col(vec_col)))
        .select("id", as_double(F.col(vec_col)).alias("v"))
        .withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
        .withColumn("nrm", norm(F.col("v")))
    )
    if max_bucket is not None:
        hot = (
            v.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > max_bucket)
            .select("bucket", "bsz")
        )
        if not verbose:
            # silent default: single plan, the anti-join build side
            # reads the materialized bucket blocks — zero extra
            # scan/shuffle. Plan shape pinned by tests/test_plans.py.
            v = v.join(
                F.broadcast(hot.select("bucket")), ["bucket"], "left_anti"
            )
        else:
            # loud path: one extra job computes the hot set eagerly (the
            # Exchange cannot be reused across jobs — that is the cost of
            # loudness); its result feeds BOTH the warning and the
            # anti-join literal. The collect is capped: beyond the cap it
            # degrades to warning-with-floor + distributed build, never
            # to a driver OOM.
            cap = 100_000
            hot_rows = hot.limit(cap + 1).collect()
            overflow = len(hot_rows) > cap
            if hot_rows:
                import warnings

                n_dropped = sum(r.bsz for r in hot_rows[:cap])
                warnings.warn(
                    f"neardup_pairs: dropping {'>' if overflow else ''}"
                    f"{min(len(hot_rows), cap)} bucket(s) over "
                    f"max_bucket={max_bucket} ({'>' if overflow else ''}"
                    f"{n_dropped} vectors lose near-dup recall; handle "
                    "degenerate clusters with exact dedup upstream or "
                    "raise max_bucket)",
                    stacklevel=2,
                )
            if overflow:
                v = v.join(
                    F.broadcast(hot.select("bucket")), ["bucket"], "left_anti"
                )
            else:
                hot_lit = v.sparkSession.createDataFrame(
                    [(int(r.bucket),) for r in hot_rows], "bucket INT"
                )
                v = v.join(F.broadcast(hot_lit), ["bucket"], "left_anti")
    a = v.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = v.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def semdedup(
    emb: DataFrame,
    centroids: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster embeddings with a coarse quantizer, then
    drop every vector that has a lower-id within-cluster neighbor at
    cosine >= ``tau``. Keeps one representative (the lowest id) per
    semantic-duplicate neighborhood in one parallel pass (deterministic,
    order-free — no sequential greedy loop).

    Scale shape: centroid assignment is a broadcast argmax (vectors never
    shuffle for it); the duplicate test is a cell equi-join, so pairwise
    work is N^2/K cell-local, exactly the SemDeDup recipe's per-cluster
    pairwise pass; only (cell, id, vector) rows shuffle once by cell.
    Returns the KEPT rows as (id_col, cell).
    """
    assigned = ivf_assign(emb, centroids, id_col, vec_col).repartition("cell")
    a = assigned.select(
        "cell", F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("vn").alias("na"),
    )
    b = assigned.select(
        "cell", F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("vn").alias("nb"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos") >= tau)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dropped, "id", "left_anti")
        .select(F.col("id").alias(id_col), "cell")
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    (max cosine; ties broken by lowest centroid id). Centroids broadcast;
    the assignment is a broadcast join + per-vector argmax — one pass
    over the corpus, no shuffle of vectors.
    """
    v = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", norm(F.col("v")))
    c = centroids.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = v.join(F.broadcast(c)).withColumn(
        "cos_c", dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    )
    best = F.max_by(
        F.col("cid"), F.struct(F.col("cos_c"), (-F.col("cid")).alias("neg"))
    )
    return (
        scored.groupBy("id")
        .agg(best.alias("cell"), F.first("v").alias("v"), F.first("vn").alias("vn"))
    )


def ivf_assign_probes(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe coarse quantization: each vector maps to its
    ``nprobe`` nearest centroid cells (by cosine, ties to lower centroid
    id). Same broadcast + single pass as ``ivf_assign``; the per-vector
    top-nprobe is a sort_array+slice over the K centroid scores — no
    window, no extra shuffle. Output has one row per (vector, probe)."""
    v = emb.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn", norm(F.col("v")))
    c = centroids.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    scored = v.join(F.broadcast(c)).withColumn(
        "cos_c", dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    )
    ranked = F.slice(
        F.sort_array(
            F.collect_list(F.struct((-F.col("cos_c")).alias("neg"), F.col("cid")))
        ),
        1,
        nprobe,
    )
    return (
        scored.groupBy("id")
        .agg(
            ranked.alias("probes"),
            F.first("v").alias("v"),
            F.first("vn").alias("vn"),
        )
        .withColumn("cell", F.explode("probes.cid"))
        .drop("probes")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: queries search their ``nprobe`` nearest
    centroid cells (corpus vectors live in exactly one cell, so probe
    expansion multiplies only the small query side — candidate pairs
    stay unique without a dedup). The scale path for ANN when hyperplane
    LSH recall is insufficient: cells are data-adaptive (real
    centroids), cell assignment is a broadcast argmax, and the search
    join is a cell equi-join — nprobe*N^2/K bucket-local work, corpus
    vectors shuffled once by cell.
    """
    if nprobe > 1:
        qa = ivf_assign_probes(queries, centroids, nprobe, id_col, vec_col).select(
            F.col("id").alias("query_id"), F.col("cell"),
            F.col("v").alias("qv"), F.col("vn").alias("qn"),
        )
    else:
        qa = ivf_assign(queries, centroids, id_col, vec_col).select(
            F.col("id").alias("query_id"), F.col("cell"),
            F.col("v").alias("qv"), F.col("vn").alias("qn"),
        )
    ca = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col("id").alias("match_id"), F.col("cell"),
        F.col("v").alias("cv"), F.col("vn").alias("cn"),
    )
    scored = (
        ca.join(F.broadcast(qa), "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def ivf_topk_indexed(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF top-k against a MAINTAINED index — the ``(id, v, vn, cell)``
    artifact index maintenance writes (cell-partitioned parquet, see
    ``stream_ivf_index_maintain``): corpus cells come from the index's
    stored ``cell`` column, nothing is re-assigned, and the probed
    cells are pushed down as an ``isin`` filter BEFORE the join so the
    scan reads only the probed cell partitions. This is the SERVING
    shape at 100 TB: a query batch touches nprobe partitions per
    query, not the index — probe cost is independent of index size.
    The probed-cell collect is a bounded driver artifact (at most
    nprobe x |query batch| integers). Ranking contract identical to
    ``ivf_topk`` (cos rounded 6dp DESC, match_id ASC)."""
    if nprobe > 1:
        qa = ivf_assign_probes(queries, centroids, nprobe, id_col, vec_col)
    else:
        qa = ivf_assign(queries, centroids, id_col, vec_col)
    qa = qa.select(
        F.col("id").alias("query_id"), F.col("cell"),
        F.col("v").alias("qv"), F.col("vn").alias("qn"),
    )
    cells = [r.cell for r in qa.select("cell").distinct().collect()]
    ca = index.filter(F.col("cell").isin(cells)).select(
        F.col("id").alias("match_id"), F.col("cell"),
        F.col("v").alias("cv"), F.col("vn").alias("cn"),
    )
    scored = (
        ca.join(F.broadcast(qa), "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .select("query_id", "match_id", "cos")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an embedding (zero vectors pass through unchanged).
    Codegen'd transform+aggregate — normalization is a scan-side op."""
    n = norm(vec)
    return F.when(n == 0, vec).otherwise(F.transform(vec, lambda x: x / n))


def kmeans_assign_step(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration's assignment + per-cell partial sums, the
    building block of distributed k-means: centroids = the first k
    vectors by id (deterministic seed, as k-means|| would give), assign
    every vector to its max-cosine centroid via broadcast argmax, then
    per-cell integer-cent partial sums (deterministic across engines and
    summation orders — floats only become means AFTER the exact integer
    sum).

    At 100 TB: centroids broadcast (k * dim * 8 bytes), assignment is one
    scan, the shuffle carries k partial-sum rows per partition.
    """
    seeds = emb.orderBy(id_col).limit(k)
    assigned = ivf_assign(emb, seeds, id_col, vec_col)
    cents = F.transform("v", lambda x: F.round(x * 10000).cast("long"))
    return (
        assigned.withColumn("vc", cents)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at("vc", 1)).alias("sum_d1"),
            F.sum(F.element_at("vc", 2)).alias("sum_d2"),
            F.sum(F.element_at("vc", 3)).alias("sum_d3"),
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector affine int8 quantization: 4x storage cut for embedding
    corpora (the difference between 100 TB and 25 TB of vectors).
    Scan-side expressions only: per-vector min/max -> scale/zero-point,
    codes = round((x - min) / scale) clamped to [0, 2^bits-1]. Returns
    (id, codes array<int>, scale, zero_point); ``dequantize_embeddings``
    inverts. Constant vectors get scale 0 and all-zero codes."""
    levels = (1 << bits) - 1
    v = as_double(F.col(vec_col))
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(float(levels))
    codes = F.transform(
        v,
        lambda x: F.when(
            scale > 0,
            F.round((x - vmin) / scale).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return emb.select(
        F.col(id_col),
        codes.alias("codes"),
        scale.alias("scale"),
        vmin.alias("zero_point"),
    )


def dequantize_embeddings(
    q: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: x ≈ code * scale + zero_point."""
    return q.select(
        F.col(id_col),
        F.transform(
            F.col("codes"),
            lambda c: c.cast("double") * F.col("scale") + F.col("zero_point"),
        ).alias("embedding"),
    )


def group_centroid_scores(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic-outlier scoring: each vector's cosine to its GROUP's
    centroid (element-wise mean). Low scores are candidate mislabels /
    noisy samples — the standard centroid-distance data-cleaning pass.

    Scale shape: centroids are built by posexplode + groupBy(group, pos)
    — the shuffle carries only partial (sum, count) accumulators per
    (group, dim), i.e. n_groups x dim rows total regardless of corpus
    size. The reassembled centroid table (n_groups rows) is BROADCAST
    back and the cosine is a scan-side zip_with — vectors themselves
    never shuffle.
    """
    x = emb.select(
        group_col, F.posexplode(as_double(F.col(vec_col))).alias("pos", "val")
    )
    cvec = (
        x.groupBy(group_col, "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s.c
            ).alias("cv")
        )
    )
    v = emb.select(group_col, id_col, as_double(F.col(vec_col)).alias("v"))
    return v.join(F.broadcast(cvec), group_col).select(
        id_col,
        group_col,
        F.round(
            dot(F.col("v"), F.col("cv")) / (norm(F.col("v")) * norm(F.col("cv"))), 6
        ).alias("centroid_cos"),
    )


def sign_projection_matrix(dim: int, k: int, seed: str = "proj") -> list[list[int]]:
    """Deterministic ±1 (Achlioptas/sign) random-projection matrix,
    derived from md5 so it is identical on every engine/rerun. Built
    DRIVER-side once (k*dim hashes) and shipped as a literal — never
    recomputed per row."""
    import hashlib

    return [
        [
            1
            - 2
            * (int(hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[:8], 16) % 2)
            for i in range(dim)
        ]
        for j in range(k)
    ]


def sign_project(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "proj",
) -> DataFrame:
    """Random-projection dimensionality reduction: x -> M x with a ±1
    sign matrix (distance-preserving in expectation, Johnson-
    Lindenstrauss). 64->8 dims cuts ANN/pair-scoring cost ~8x.

    Scale shape: the matrix is a BROADCAST LITERAL (k x dim ints); the
    projection is one scan-side transform/aggregate expression per
    output dim — no UDF, no shuffle, no per-row hashing.
    """
    dim = len(emb.select(vec_col).first()[0])
    m = sign_projection_matrix(dim, k, seed)
    mat = F.array(*[F.array(*[F.lit(x) for x in row]) for row in m])
    v = as_double(F.col(vec_col))
    proj = F.transform(
        mat,
        lambda row: F.aggregate(
            F.zip_with(v, row, lambda x, s: x * s.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return emb.select(F.col(id_col), proj.alias("projected"))


def kmeans_lloyd(
    emb: DataFrame,
    k: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full distributed Lloyd k-means to a fixed iteration count — the
    IVF/IVF-PQ coarse-quantizer training loop (MLlib's KMeans shape,
    re-expressed declaratively so every round is ONE scan + ONE k-row
    aggregate).

    Deterministic & engine-exact: vectors quantize to e4 integer units,
    distances are exact BIGINT L2^2, argmin ties break to the lowest
    cell, and each new centroid dimension is the FLOOR of the integer
    mean — so the whole trajectory (assignments, centroids) is
    bit-reproducible in any engine (numpy differential test mirrors it).

    At 100 TB per iteration: centroids ship as a broadcast literal
    (k*dim ints), assignment is scan-side codegen, and the shuffle
    carries k partial-sum rows per partition (map-side combine) — the
    classic scalable k-means round. Returns (assignments DataFrame
    (id, cell), final centroids as list[list[int]] e4 units).
    """
    vq = F.transform(as_double(F.col(vec_col)), lambda x: F.round(x * 10000).cast("long"))
    seeds = (
        emb.orderBy(id_col).limit(k).select(vq.alias("q")).collect()
    )
    cents: list[list[int]] = [list(r.q) for r in seeds]
    dim = len(cents[0])

    def assign(df: DataFrame) -> DataFrame:
        # one parsed SQL string per round: k*dim literals via Column
        # operators would cost thousands of py4j round-trips per round
        # for an identical plan (same lesson as pq_encode)
        cents_sql = ", ".join(
            "array(" + ", ".join(str(int(v)) for v in c) + ")" for c in cents
        )
        d = (
            f"transform(array({cents_sql}), c -> aggregate("
            f"zip_with(_vq, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x))"
        )
        cell = f"CAST(array_position({d}, array_min({d})) - 1 AS INT)"
        return df.withColumn("cell", F.expr(cell))

    base = emb.select(id_col, vq.alias("_vq"))
    assigned = None
    for _ in range(n_iters):
        assigned = assign(base)
        rows = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("_vq", i + 1)).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cell = {r["cell"]: r for r in rows}
        cents = [
            [int(by_cell[j][f"s{i}"]) // int(by_cell[j]["n"]) for i in range(dim)]
            if j in by_cell
            else cents[j]  # empty cell keeps its centroid
            for j in range(k)
        ]
    return assigned.select(id_col, "cell"), cents


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    topk: DataFrame | None = None,
) -> DataFrame:
    """k-nearest-neighbor label transfer: majority label among the
    cosine top-k (the auto-labeling / label-propagation step curation
    pipelines run to extend a small labeled seed set across a corpus).

    Votes tie-break to the SMALLER label id; neighbor rank ties break
    on match_id (the shared top-k contract: cos rounded 6dp DESC,
    match_id ASC), so the prediction is deterministic and oracle-able
    end to end.

    The neighbor stage is PLUGGABLE: pass ``topk`` — any precomputed
    (query_id, match_id, ...) neighbor table from ``ivf_topk`` /
    ``ivfpq_topk`` / ``lsh_topk`` — and only the vote stage runs here.
    Without it, falls back to ``brute_force_topk`` (broadcast query
    side, corpus streams once) — the small-corpus baseline ONLY: at
    scale the corpus side must never broadcast, so use the IVF path
    (cell equi-join; corpus shuffled once by cell). Either way the
    vote aggregate shuffles only (query_id, label) pairs — k rows per
    query — never vectors.
    """
    if topk is None:
        topk = brute_force_topk(
            queries, corpus, k=k, id_col=id_col, vec_col=vec_col
        )
    labels = corpus.select(
        F.col(id_col).alias("match_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        topk.join(labels, "match_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("nbr_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("nbr_label").alias("pred_label"),
            "votes",
        )
    )
