"""One-pass dataset profiling (pre-training data audits: null rates,
cardinalities, value ranges — the report run before any curation job).

Everything is a single ``agg`` pass: Catalyst fuses all per-column
aggregates into one partial+final hash aggregation, so profiling N
columns costs ONE scan + a 1-row shuffle regardless of N. Exact
``countDistinct`` variants exist for oracle parity; at 100 TB switch
``exact_distinct=False`` for HLL sketches (approx_count_distinct) — the
plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """Wide 1-row profile: per column — row count, null count, distinct
    count, min/max (rendered as strings so heterogeneous types fit one
    schema)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            (
                F.countDistinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"{c}_distinct"),
            F.min(col).cast("string").alias(f"{c}_min"),
            F.max(col).cast("string").alias(f"{c}_max"),
        ]
    return df.agg(*aggs)
