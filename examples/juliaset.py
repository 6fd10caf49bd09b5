"""The julia-set workflow (reference ``examples/complete/juliaset/``):
escape-time iteration of f(z) = z^2 + c, c = -.62772 + .42193i, over an
NxN grid, written out as the reference's per-x-row coordinate lines.

The per-pixel loop is the registered gate ``ex_juliaset``
(queries/examples.py) — a single ``aggregate()`` higher-order fold in
2^20 fixed-point integers, zero shuffle. This runner adds the
reference's output stage: group coordinates by x, format one
``x: [(x, y, iter), ...]`` line per row, write with the text sink.

Usage:
    python examples/juliaset.py [grid_size] [output_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

if __name__ == "__main__":
    from incubator_beam_spark import queries  # noqa: F401  (registers gates)
    from incubator_beam_spark.queries import examples as ex
    from incubator_beam_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else ex._JULIA_N
    spark = get_spark("juliaset")
    # the gate pins n=64 for the oracle; the runner accepts any n
    saved, ex._JULIA_N = ex._JULIA_N, n  # @query registers fn unchanged
    try:
        df = ex.ex_juliaset(spark, "")
    finally:
        ex._JULIA_N = saved
    lines = (
        df.groupBy("px")
        .agg(
            F.concat(
                F.col("px").cast("string"),
                F.lit(": "),
                F.to_json(
                    F.array_sort(F.collect_list(F.struct("px", "py", "it")))
                ),
            ).alias("value")
        )
        .orderBy("px")
        .select("value")
    )
    if len(sys.argv) > 2:
        lines.write.mode("overwrite").text(sys.argv[2])
        print(f"wrote {n}x{n} julia set to {sys.argv[2]}")
    else:
        lines.show(10, truncate=100)
