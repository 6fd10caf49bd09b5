"""Interleaved A/B: doc_simhash_pairs with HOF signature (before) vs
vectorized simhash_table signature (after), one JVM, alternating.
Both arms run the REAL dedup.simhash_pairs; the before arm monkeypatches
simhash_table back to the r10 column-expression formulation.

Not part of the product; run standalone:
    python scripts/exp_simhash_pairs_ab.py [sf_dir]
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from incubator_beam_spark.session import get_spark  # noqa: E402
from incubator_beam_spark.dataops import dedup  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def hof_signature_table(docs, id_col="doc_id", text_col="text", bits=32, out_col="sh"):
    """The pre-r11 signature stage: interpreted HOF aggregate."""
    return docs.select(
        F.col(id_col), dedup.simhash64(F.col(text_col), bits=bits).alias(out_col)
    )


def main():
    spark = get_spark("exp-simhash-pairs-ab", cpus=32)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    docs.count()
    real = dedup.simhash_table

    def run(patched):
        dedup.simhash_table = hof_signature_table if patched else real
        try:
            df = dedup.simhash_pairs(docs)
            df.write.format("noop").mode("overwrite").save()
        finally:
            dedup.simhash_table = real
        for (_, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    for arm in (True, False):
        run(arm)  # warm codegen untimed
    times = {"before": [], "after": []}
    for _ in range(5):
        for name, arm in (("before", True), ("after", False)):
            t0 = time.time()
            run(arm)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name:7s} min={min(ts):6.3f} med={sorted(ts)[len(ts)//2]:6.3f} "
              f"all={[round(t, 2) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
