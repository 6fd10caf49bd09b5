"""Time named registered gates bench-style (untimed warmup, N timed
noop-sink runs each), print one JSON line. Used by the r11 interleaved
A/B harness (run alternately from two source trees).

Not part of the product; run standalone from a repo root:
    python scripts/exp_gate_times.py gate1 gate2 ... [--repeat N]
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark import registry  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=")[1])
    spark = get_spark("exp-gate-times", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = registry.load_all()
    out = {}
    for g in args:
        fn = qs[g].fn

        def run():
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            for (_, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
                rdd.unpersist()

        run()  # warm
        ts = []
        for _ in range(repeat):
            t0 = time.time()
            run()
            ts.append(round(time.time() - t0, 3))
        out[g] = ts
    print("GATE_TIMES " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
