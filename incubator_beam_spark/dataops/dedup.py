"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB corpora:
- Exact dedup is a hash groupBy on a 16-byte fingerprint, not the full
  text — the shuffle moves 24 bytes/row, not documents.
- MinHash LSH: signatures are computed scan-side with higher-order array
  expressions (no UDF, no explode of shingles through a shuffle); only
  (band_hash, doc_id) pairs — k_bands rows of ~24 bytes per doc — are
  shuffled; candidate verification joins back to signatures, never to raw
  text.
- SimHash packs to one BIGINT per doc; near-dup search is a band join on
  bit-chunks.

Hash choice is md5 everywhere: identical across Spark and DuckDB (the
correctness oracle), stable across JVMs; at 128 bits collision rates are
negligible at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (built-in exprs only).

    Documents with fewer than ``n`` words contribute one whole-text
    shingle, so every doc has a non-empty shingle set.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: for seed i, min over shingles of md5(shingle#i).

    Lexicographic min over fixed-length hex == numeric min over the 128-bit
    hash, so plain string min is a valid permutation-min.
    """
    def perm(i: int):
        # single-arg lambda: a 2-arg lambda would make Spark pass the
        # element index as the second argument
        return lambda s: F.md5(F.concat(s, F.lit(f"#{i}")))

    return F.array(
        *[F.array_min(F.transform(shingle_col, perm(i))) for i in range(num_hashes)]
    )


def lsh_band_keys(sig_col: Column, rows_per_band: int = 2) -> Column:
    """Bucket a signature into bands: band key = md5 of the band's rows.
    Returns array<struct<band:int, key:string>> ready to explode."""
    num_hashes = 8  # matches minhash_signature default
    n_bands = num_hashes // rows_per_band
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(sig_col, b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array columns (distinct semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH, verified with exact
    Jaccard over shingle sets.

    Plan shape (scale-critical): signature+bands computed in the scan
    stage; shuffle only (band, key, doc_id); self-join per bucket;
    candidates deduped before the (expensive) verify join.
    """
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.col(text_col)).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    bands = sig.select(
        "doc_id", F.explode(lsh_band_keys(F.col("sig"), rows_per_band)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    left = bands.alias("l")
    right = bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )

    sh_a = sig.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sig.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(text: Column, bits: int = 32) -> Column:
    """SimHash over BPE-ish tokens packed into a BIGINT.

    Per bit b: count tokens whose 60-bit md5-derived hash has bit b set;
    set output bit when 2*count >= n_tokens. Pure array expressions —
    computed during the scan, nothing shuffled.
    """
    from .text import tokens

    tok = tokens(text)
    hashes = F.transform(
        tok, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
    )
    n = F.size(hashes)

    def bit_set(b: int):
        return lambda h: F.shiftright(h, b).bitwiseAND(1) == 1

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        cnt = F.size(F.filter(hashes, bit_set(b)))
        out = out + F.when(cnt * 2 >= n, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest id per fingerprint. Shuffles 24-byte
    fingerprints, not documents."""
    from .text import fingerprint

    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
