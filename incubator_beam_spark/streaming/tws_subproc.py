"""Subprocess runner for transformWithStateInPandas gates.

The TWS state server's Python worker inherits the JVM's environment; the
vendored-protobuf shim (pbshim.py) works only when its sitecustomize dir
is on PYTHONPATH BEFORE the JVM starts. A FOREIGN pre-started
SparkSession (the correctness driver hands us its own) therefore cannot
run TWS in this sandbox — its JVM env is frozen shim-less and the worker
dies importing google.protobuf (round-5 driver failure).

Fix: when ``pbshim.worker_protobuf_ok`` says the host JVM can't do it,
the gate runs the REAL TWS drain here, in a subprocess that owns its
session (``session.get_spark`` activates the shim before this JVM
launches), and hands the result back as parquet. The gate still
exercises genuine transformWithStateInPandas + RocksDB state under any
host. On a normally-provisioned cluster (pip protobuf present) the
subprocess never runs.

Usage: python -m incubator_beam_spark.streaming.tws_subproc <impl> <sf_dir> <out>
  impl    name of a callable in queries.streaming_queries taking (spark, sf_dir)
  sf_dir  fixture directory
  out     parquet output path for the result DataFrame
"""

from __future__ import annotations

import sys


def main(impl: str, sf_dir: str, out_path: str) -> None:
    from incubator_beam_spark.session import get_spark

    spark = get_spark("ibs_tws_subproc", cpus=8)
    try:
        from incubator_beam_spark.queries import streaming_queries as sq

        df = getattr(sq, impl)(spark, sf_dir)
        df.write.mode("overwrite").parquet(out_path)
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
