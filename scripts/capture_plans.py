"""Capture .explain('formatted') for named registered queries into
plans/<round>/<name>_<tag>.txt (the optimization round's evidence files).
Round dir defaults to r12; override with $PLANS_ROUND.

Usage: python scripts/capture_plans.py before q1 q2 ...   (tag = before/after)
       python scripts/capture_plans.py before --headline  (every headline query)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_beam_spark import registry  # noqa: E402
from incubator_beam_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("PLANS_OUT_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r12"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    registry.load_all()
    if names == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("capture-plans", cpus=8)
    for name in names:
        q = registry.QUERIES[name]
        try:
            df = q.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # capture the failure, don't abort the batch
            txt = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
