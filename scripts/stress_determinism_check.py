"""Cross-environment determinism check for the stress-lane CEP count.

VERDICT r7 "what's wrong" #1: matches_out differed across environments
(builder 8944 vs driver 9085) on identical code. Root cause: round-robin
``repartition(n_files)`` assigns rows to part files based on the input
slice layout, which follows the session's default parallelism — a
machine-dependent quantity. bench.py now hash-repartitions on
``bid_id % n_files`` so file contents are a pure function of the data.

This script reproduces the lane's CEP path at 2M events under TWO
sessions with different core counts (the exact knob that differed
between the builder's and the driver's machines) and asserts the match
counts agree. Run: ``python scripts/stress_determinism_check.py``.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = 2_000_000
N_FILES = 20


def run_once(master: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from incubator_beam_spark.plans.cep import match_recognize_stream

    spark = (
        SparkSession.builder.master(master)
        .appName(f"stress_det_{master}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="wh_"))
        .getOrCreate()
    )
    src_dir = tempfile.mkdtemp(prefix="stress_det_bids_")
    try:
        bids = spark.range(N_EVENTS).select(
            F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 172800)).alias(
                "ts"
            ),
            (F.col("id") % 1000).alias("auction"),
            F.pmod(F.xxhash64("id"), F.lit(10000)).alias("price"),
            F.col("id").alias("bid_id"),
        )
        bids.repartition(N_FILES, F.col("bid_id") % N_FILES).write.mode(
            "overwrite"
        ).parquet(src_dir)
        parts = sorted(glob.glob(os.path.join(src_dir, "part-*")))
        for k, p in enumerate(parts):
            os.utime(p, (1704067200 + k, 1704067200 + k))
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max(N_FILES // 10, 1))
            .parquet(src_dir)
        )
        cep = match_recognize_stream(
            stream,
            partition_by="auction",
            order_by="bid_id",
            define={"H": F.col("price") >= 9000},
            pattern="H H H",
            measures={
                "n_rows": ("count", None),
                "last_bid": ("last", None, "bid_id"),
            },
        )
        name = f"det_{abs(hash(master)) % 10**8}"
        q = (
            cep.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        n = spark.table(name).count()
        q.stop()
        print(f"# {master}: {n} matches in {wall:.1f}s", file=sys.stderr)
        return n
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        spark.stop()


def main() -> None:
    import subprocess

    # each master in its OWN process: a stopped SparkSession leaves JVM
    # state (default parallelism) behind; a fresh interpreter per run is
    # the honest cross-environment simulation
    counts = {}
    for master in ("local[8]", "local[32]"):
        r = subprocess.run(
            [sys.executable, __file__, "--one", master],
            capture_output=True,
            text=True,
        )
        sys.stderr.write(r.stderr.splitlines()[-1] + "\n" if r.stderr else "")
        counts[master] = int(r.stdout.strip())
    assert counts["local[8]"] == counts["local[32]"], counts
    print(f"DETERMINISTIC: {counts}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print(run_once(sys.argv[2]))
    else:
        main()
