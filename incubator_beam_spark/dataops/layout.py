"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the scan is the bottleneck; file-level min/max statistics only
prune when the data is clustered on the filtered columns. Z-ordering
(bit-interleaving two key columns) gives locality on BOTH dimensions at
once, so either predicate prunes most files — the technique behind
Delta/Iceberg OPTIMIZE ZORDER, implemented here with plain Spark:
a scan-side JVM expression + ``repartitionByRange`` + sorted write.

Scale design: the z-value is pure bit arithmetic inside whole-stage
codegen (shiftleft/and/or — no UDF); ``repartitionByRange`` samples the
z distribution (one lightweight job) and range-partitions, so each
output file owns a disjoint z-interval → disjoint (x, y) rectangles →
parquet footer min/max prune on either column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Morton-spread magic masks: spread the low 16 bits of an int to the even
# bit positions of a 32-bit lane (classic bit-twiddling identity).
_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread16(c: Column) -> Column:
    c = c.bitwiseAND(F.lit((1 << 16) - 1))
    for shift, mask in _MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zvalue(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of ``x`` and ``y`` into a 32-bit Morton
    (Z-order) code: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    return _spread16(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread16(y.cast("long")), 1)
    )


def zorder_layout(
    df: DataFrame, xcol: str, ycol: str, n_files: int
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-value of
    (xcol, ycol) into ``n_files`` partitions and sort within each.
    ``.write.parquet`` on the result produces files whose (xcol, ycol)
    min/max footers prune on either column."""
    z = zvalue(F.col(xcol), F.col(ycol)).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
