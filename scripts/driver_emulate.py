"""Emulate the driver's correctness gate more strictly than the pytest
harness: run each registered query at sf0.01, run its DuckDB oracle,
canonicalize BOTH through pandas (sort columns by name, sort_values over
all columns — exactly the step that crashes on list cells), then compare
values AND dtypes (the driver's value-hash is dtype-sensitive: int64 290
vs float64 290.0 hash-mismatched in round 1).

Usage: python scripts/driver_emulate.py [--devices] [N] [name ...]
  N          check the first N registered queries (default 50 — the window)
  name       check only the named queries
  --devices  check the BANKED manifest pairs (queries/devices.py::devices())
             instead of registered gates — verdict r9 item 2: the banking
             ritual must run the same dtype-strict check promotion will face
             (the registry-only emulator is exactly why the q72_factfact
             int32-vs-int64 mon column survived the r9 verification)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_beam_spark import registry
from incubator_beam_spark.catalog import TABLES
from incubator_beam_spark.session import get_spark

SF_DIR = os.environ.get("EMUL_SF_DIR", "/root/testdata/sf0.01")


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def check(name: str, q, spark, con) -> str:
    try:
        s_pdf = q.fn(spark, SF_DIR).toPandas()
    except Exception as e:  # noqa: BLE001
        return f"SPARK-ERR {type(e).__name__}: {str(e)[:200]}"
    if q.oracle is None:
        return f"no_oracle rows={len(s_pdf)}"
    try:
        d_pdf = con.sql(q.oracle).df()
    except Exception as e:  # noqa: BLE001
        return f"ORACLE-ERR {type(e).__name__}: {str(e)[:200]}"
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return f"COLS spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
    if len(s_pdf) != len(d_pdf):
        return f"ROWS spark={len(s_pdf)} duck={len(d_pdf)}"
    try:
        s_c, d_c = _canon(s_pdf), _canon(d_pdf)
    except TypeError as e:
        return f"CANON-ERR {e}"
    for col in s_c.columns:
        a, b = s_c[col], d_c[col]
        # THE SETTLED RULE (r11, scripts/width_audit.json): the driver
        # hash tolerates width differences within a kind (int32/int8 vs
        # int64, datetime ns vs us — 44 gates with such columns all
        # carry green driver hash rows) but NOT kind differences
        # (int64 290 vs float64 290.0 hash-mismatched in round 1).
        # tests/conftest.py::assert_matches_oracle_strict enforces the
        # identical rule for banked devices.
        if a.dtype.kind != b.dtype.kind:
            return f"DTYPE {col}: spark={a.dtype} duck={b.dtype}"
        if a.dtype != b.dtype:
            # width-tolerated: compare as Python objects — downcasting
            # the wider side would wrap out-of-range values and could
            # mask a narrow-side overflow as a pass
            a, b = a.astype(object), b.astype(object)
        if not a.equals(b):
            mism = (a != b) & ~(a.isna() & b.isna())
            idx = mism[mism].index[:3].tolist()
            return f"VALUES {col}: rows {idx} spark={a.loc[idx].tolist()} duck={b.loc[idx].tolist()}"
    return "ok"


def main() -> None:
    qs = registry.load_all()
    args = sys.argv[1:]
    if args and args[0] == "--devices":
        from incubator_beam_spark.queries.devices import devices
        from incubator_beam_spark.registry import Query

        dev = devices()
        qs = {
            name: Query(name, fn, oracle, "")
            for name, (fn, oracle) in dev.items()
        }
        names = args[1:] or list(qs)
        if not names:
            print("device bank is empty — nothing to check")
            sys.exit(0)
    elif args and not args[0].isdigit():
        names = args
    else:
        n = int(args[0]) if args else 50
        names = list(qs)[:n]
    if os.environ.get("EMUL_NO_PBSHIM"):
        # replicate the driver's FOREIGN pre-started session: the JVM
        # starts WITHOUT the protobuf shim on PYTHONPATH, so TWS gates
        # must take their subprocess fallback (round-5 red row)
        from pyspark.sql import SparkSession

        from incubator_beam_spark.pbshim import SHIM_DIR

        parts = [
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and p != SHIM_DIR
        ]
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)
        spark = (
            SparkSession.builder.appName("driver-emulate-foreign")
            .master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = get_spark("driver-emulate", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    bad = 0
    for name in names:
        res = check(name, qs[name], spark, con)
        flag = " " if res.startswith(("ok", "no_oracle")) else "!"
        if flag == "!":
            bad += 1
        print(f"{flag} {name}: {res}", flush=True)
    print(f"\n{len(names) - bad}/{len(names)} clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
