"""Monte-Carlo pi (reference ``examples/complete/estimate_pi.py``):
throw points at the unit square, count quarter-circle hits, print the
estimate JSON like the reference's ``WriteToText(coder=JsonCoder)``.

Two modes:
- default: the DETERMINISTIC md5-derived stream of the registered gate
  ``ex_estimate_pi`` (same estimate every run, cross-engine exact);
- ``--random``: the reference's true-to-spirit nondeterministic draw
  via Spark's ``rand()`` (different estimate every run — this is why
  the GATE replaces the RNG, see queries/examples.py).

Usage:
    python examples/estimate_pi.py [n_points] [--random] [output_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if __name__ == "__main__":
    from incubator_beam_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--random"]
    use_random = "--random" in sys.argv[1:]
    n = int(args[0]) if args else 250_000
    spark = get_spark("estimate_pi")
    if use_random:
        pts = spark.range(n).selectExpr("rand() AS x", "rand() AS y")
        agg = pts.selectExpr(
            "count(*) AS trials",
            "CAST(sum(CASE WHEN x*x + y*y <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS inside",
        )
    else:
        pts = spark.range(n).selectExpr(
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 7), 16, 10) AS BIGINT) AS x",
            "CAST(conv(substring(md5(CAST(id AS STRING)), 9, 7), 16, 10) AS BIGINT) AS y",
        )
        agg = pts.selectExpr(
            "count(*) AS trials",
            "CAST(sum(CASE WHEN x*x + y*y <= 72057594037927936 THEN 1 ELSE 0 END)"
            " AS BIGINT) AS inside",
        )
    out = agg.selectExpr(
        "trials", "inside", "4.0 * inside / trials AS estimate"
    )
    row = out.collect()[0]
    line = f"[{row.trials}, {row.inside}, {row.estimate}]"
    if len(args) > 1:
        spark.createDataFrame([(line,)], "value string").write.mode(
            "overwrite"
        ).text(args[1])
        print(f"wrote {line} to {args[1]}")
    else:
        print(line)
