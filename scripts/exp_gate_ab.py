"""Interleaved A/B for any registered gate: run from a given repo root,
print bench-style min-of-3 after one untimed warmup.
Usage: python scripts/exp_gate_ab.py <repo_root> <gate> [gate ...]"""
import sys
import time

root = sys.argv[1]
names = sys.argv[2:]
sys.path.insert(0, root)

from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark import registry  # noqa: E402

registry.load_all()
spark = get_spark("gate-ab")
spark.range(1000).selectExpr("sum(id)").collect()
SF = "/root/testdata/sf0.1"


def cleanup():
    import gc

    spark.catalog.clearCache()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)
    gc.collect()


for name in names:
    fn = registry.QUERIES[name].fn
    fn(spark, SF).count()  # untimed warmup
    cleanup()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    cleanup()
    print(f"RESULT {root} {name} {best:.4f}")
spark.stop()
