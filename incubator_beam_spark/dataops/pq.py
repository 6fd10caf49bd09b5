"""Product quantization (PQ) for embedding columns: compressed codes +
asymmetric-distance (ADC) top-k search — the storage/serving scale path
for ANN over a 100-TB corpus (Jegou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the FAISS IVF-PQ design).

Reference parity: Beam has no vector-search primitive; this is the
composition a Beam user would hand-write over ParDo + side inputs
(broadcast codebook), expressed Catalyst-native here.

Scale design:
- The codebook is a MODEL ARTIFACT: tiny (m × K × dim/m ints), collected
  once driver-side and shipped as a literal into every expression — the
  same broadcast-small-model shape as ``sign_projection_matrix``. The
  corpus is never shuffled.
- ``pq_encode`` is one scan: per subspace, an argmin over K literal
  centroids inside whole-stage codegen. Output is m small ints per
  vector (64-dim float32 → 8 codes ≈ 32× smaller), which is what makes
  a 100-TB vector corpus servable.
- ``pq_adc_topk`` never touches the original vectors: the query builds
  an m×K lookup table driver-side, scoring is m array lookups + integer
  adds per row, and the top-k lowers to TakeOrderedAndProject.

Cross-engine exactness: vectors quantize to integer e4 units
(``round(x*10000)``, the convention shared with ``kmeans_assign_step``)
and every distance/score is exact BIGINT arithmetic — argmin ties break
to the lowest centroid index, so codes and scores hash-match a DuckDB
oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import as_double

Codebook = list[list[list[int]]]  # [subspace][centroid][dim] in e4 int units


def quantized(vec: Column) -> Column:
    """array<long> of round(x*10000) — the shared e4 integer unit."""
    return F.transform(as_double(vec), lambda x: F.round(x * 10000).cast("long"))


def pq_codebook(
    emb: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebook:
    """Deterministic codebook: centroid j of subspace s = subvector s of
    the j-th vector by id (k-means++-seed style, matching
    ``kmeans_assign_step``'s seeding; swap in trained centroids in
    production). Driver-side collect of n_centroids rows only — the
    codebook is a broadcast artifact, not data."""
    rows = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(quantized(F.col(vec_col)).alias("q"))
        .collect()
    )
    dim = len(rows[0].q)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [[list(r.q[s * sub : (s + 1) * sub]) for r in rows] for s in range(m)]


def pq_encode(
    emb: DataFrame,
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, codes array<int> of length m): per subspace, the index
    of the L2-nearest codebook centroid (exact integer distances, ties to
    the lowest index via first-match ``array_position``). Pure scan-side.
    ``keep`` carries extra columns through (e.g. the IVF cell id when
    building a composite IVF-PQ index)."""
    m, sub = len(codebook), len(codebook[0][0])
    df = emb.select(
        F.col(id_col), *[F.col(c) for c in keep], quantized(F.col(vec_col)).alias("vq")
    )
    # The whole encoder is ONE SQL string parsed once: building the same
    # tree through Column operators costs thousands of py4j round-trips
    # (~1s of driver time per call for K=16, m=8) for an identical plan.
    def dists(s: int) -> str:
        cents = ", ".join(
            "array(" + ", ".join(str(int(c)) for c in cent) + ")"
            for cent in codebook[s]
        )
        return (
            f"transform(array({cents}), c -> aggregate("
            f"zip_with(slice(vq, {s * sub + 1}, {sub}), c, (x, y) -> (x - y) * (x - y)), "
            f"0L, (acc, x) -> acc + x))"
        )

    # Let-bind each subspace's distance array by wrapping it in a
    # single-element array + transform (the shingles() trick): the
    # argmin then references the BOUND variable, so the K distance
    # aggregates run once per subspace instead of twice (interpreted
    # HOFs do no CSE — array_position(D, array_min(D)) with D inlined
    # re-evaluated the whole distance transform; r11, ~2x per-row work).
    codes_sql = "array(" + ", ".join(
        f"element_at(transform(array({dists(s)}), d0 -> "
        f"CAST(array_position(d0, array_min(d0)) - 1 AS INT)), 1)"
        for s in range(m)
    ) + ")"
    return df.select(
        id_col, *[F.col(c) for c in keep], F.expr(codes_sql).alias("codes")
    )


def pq_adc_lut(codebook: Codebook, query_q: list[int]) -> list[list[int]]:
    """ADC lookup table: lut[s][j] = exact integer L2^2 between the
    query's subvector s and centroid j. Computed driver-side (m*K sums of
    ints) and shipped as a literal."""
    m, sub = len(codebook), len(codebook[0][0])
    if len(query_q) != m * sub:
        raise ValueError(f"query dim {len(query_q)} != {m * sub}")
    return [
        [
            sum((query_q[s * sub + d] - cent[d]) ** 2 for d in range(sub))
            for cent in codebook[s]
        ]
        for s in range(m)
    ]


def pq_adc_topk(
    codes: DataFrame,
    lut: list[list[int]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC: score = sum_s lut[s][codes[s]] (exact
    BIGINT), smallest first, ties to lowest id. m lookups + adds per row
    over the compressed codes — the original vectors are never read."""
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    score = F.aggregate(
        F.zip_with(
            F.col("codes"), lut_lit, lambda c, row: F.element_at(row, c + 1)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(id_col, score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_index(
    emb: DataFrame,
    centroids: DataFrame,
    codebook: Codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composite IVF-PQ index (FAISS's billion-scale layout): one
    pass assigns each vector to its max-cosine coarse cell (broadcast
    centroids) and PQ-encodes it — output (id, cell, codes) is the whole
    serving artifact, ~m bytes + a cell id per vector. Queries probe a
    cell (equi-join on the broadcast probe set) and ADC-score only that
    cell's codes: corpus-fraction scanned ~= 1/n_cells, vectors never
    shuffled or re-read."""
    from .similarity import ivf_assign

    asg = ivf_assign(emb, centroids, id_col, vec_col)
    return pq_encode(asg, codebook, id_col="id", vec_col="v", keep=("cell",)).withColumnRenamed(
        "id", id_col
    )
