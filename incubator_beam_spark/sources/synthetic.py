"""Synthetic load-generation source (reference ``sdks/java/io/synthetic``:
``SyntheticBoundedSource.java``, ``SyntheticUnboundedSource.java``,
``SyntheticOptions.java:129-147`` — numRecords / keySizeBytes /
valueSizeBytes / hotKeyFraction / numHotKeys).

Spark-first shape: the bounded generator is ``spark.range`` — an
already-splittable, zero-IO parallel scan (the reference needed a custom
BoundedSource + BundleSplitter for exactly this; ``range`` gives split
planning, predicate pushdown on ``id``, and codegen for free). The
unbounded variant maps the same deterministic record function over the
``rate`` streaming source. Records are md5-derived, so the stream is
reproducible across engines and runs — the DuckDB oracle can regenerate
it exactly (``generate_series`` + the same md5 arithmetic).

At 100 TB: generating load never shuffles — key/value synthesis is
scan-side expression work, and hot-key skew is dialed in with
``hot_key_fraction`` to exercise AQE skew-join / salting paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import PCollection, PTransform


def _bucket(col, salt: str, mod: int):
    """First 8 md5 hex chars as int in [0, mod) — engine-portable
    (matches DuckDB ``('0x'||substr(md5(...),1,8))::BIGINT % mod``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % mod
    )


def _sized_hex(col, salt: str, n_chars: int):
    """Deterministic hex string of exactly ``n_chars`` derived from
    ``col`` — md5 repeated and truncated (1 md5 covers 32 chars)."""
    reps = (n_chars + 31) // 32
    h = F.md5(F.concat_ws("|", F.lit(salt), col.cast("string")))
    return F.substring(F.repeat(h, reps), 1, n_chars)


def synthetic_bounded(
    spark: SparkSession,
    num_records: int,
    key_size: int = 8,
    value_size: int = 16,
    num_keys: int = 100,
    hot_key_fraction: float = 0.0,
    num_hot_keys: int = 1,
    seed: str = "syn",
) -> DataFrame:
    """Deterministic bounded KV load generator.

    Returns ``(id, key_id, key, value)``: ``key_id`` follows the
    reference's hot-key model (``SyntheticOptions.hotKeyFraction``): a
    ``hot_key_fraction`` slice of records lands on ``num_hot_keys`` hot
    keys; the rest spread uniformly over the remaining key space. ``key``
    / ``value`` are md5-derived hex strings of the requested sizes.
    """
    if not 0.0 <= hot_key_fraction <= 1.0:
        raise ValueError(f"hot_key_fraction must be in [0,1], got {hot_key_fraction}")
    if num_hot_keys >= num_keys:
        raise ValueError("num_hot_keys must be < num_keys")
    rows = spark.range(num_records)
    b = _bucket(F.col("id"), f"{seed}|k", 1_000_000)
    cold = num_keys - num_hot_keys
    key_id = F.when(
        b < int(hot_key_fraction * 1_000_000), b % num_hot_keys
    ).otherwise(num_hot_keys + (b % cold))
    return rows.select(
        "id",
        key_id.alias("key_id"),
        _sized_hex(key_id, f"{seed}|key", key_size).alias("key"),
        _sized_hex(F.col("id"), f"{seed}|val", value_size).alias("value"),
    )


def synthetic_unbounded(
    spark: SparkSession,
    rows_per_second: int = 1000,
    key_size: int = 8,
    value_size: int = 16,
    num_keys: int = 100,
    hot_key_fraction: float = 0.0,
    num_hot_keys: int = 1,
    seed: str = "syn",
) -> DataFrame:
    """Unbounded variant over the ``rate`` streaming source: same
    deterministic record function applied to the rate stream's ``value``
    counter, plus the source's event-time ``timestamp`` (reference
    ``SyntheticUnboundedSource.java`` + ``SyntheticWatermark.java`` —
    Spark's rate source supplies the watermark clock)."""
    if num_hot_keys >= num_keys:
        raise ValueError("num_hot_keys must be < num_keys")
    rows = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "id")
    )
    b = _bucket(F.col("id"), f"{seed}|k", 1_000_000)
    cold = num_keys - num_hot_keys
    key_id = F.when(
        b < int(hot_key_fraction * 1_000_000), b % num_hot_keys
    ).otherwise(num_hot_keys + (b % cold))
    return rows.select(
        "timestamp",
        "id",
        key_id.alias("key_id"),
        _sized_hex(key_id, f"{seed}|key", key_size).alias("key"),
        _sized_hex(F.col("id"), f"{seed}|val", value_size).alias("value"),
    )


class SyntheticSource(PTransform):
    """PTransform wrapper (root transform, like the IO readers)."""

    def __init__(self, num_records: int, **options):
        self.num_records, self.options = num_records, options

    def expand(self, pcoll: PCollection) -> PCollection:
        df = synthetic_bounded(pcoll.pipeline.spark, self.num_records, **self.options)
        return PCollection(df, pcoll.pipeline)
