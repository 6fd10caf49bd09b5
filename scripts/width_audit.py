"""Settle the integer-width question empirically (verdict r10 item 3).

Drives EVERY registered gate at sf0.01 and records, per column, where
the Spark result dtype differs from the DuckDB oracle dtype:

* ``kind`` mismatches (int vs float, etc.) — known driver hash breaks.
* ``width``-only mismatches (int32 vs int64, datetime64[ns] vs [us],
  same kind) — the disputed class.

Each width-mismatched gate is then cross-referenced against the union
of historical driver verdicts (CORRECTNESS_r*.json): a gate that
carries a ``hash_match: true`` driver row while producing a
width-mismatched column is DIRECT evidence the real driver's value
hash tolerates width (the column reached the driver as int32 vs the
oracle's int64 and still hashed equal).

Output: scripts/width_audit.json + a summary to stdout.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_beam_spark import registry
from incubator_beam_spark.catalog import TABLES
from incubator_beam_spark.session import get_spark

SF_DIR = os.environ.get("EMUL_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        rows = data if isinstance(data, dict) else {}
        for name, v in rows.items():
            if isinstance(v, dict) and v.get("hash_match"):
                out.setdefault(name, []).append(rnd)
    return out


def main() -> None:
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = registry.load_all()
    findings: dict[str, dict] = {}
    for i, (name, q) in enumerate(qs.items()):
        if q.oracle is None:
            continue
        try:
            s_pdf = q.fn(spark, SF_DIR).toPandas()
            d_pdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            findings[name] = {"error": f"{type(e).__name__}: {str(e)[:150]}"}
            continue
        width, kind = {}, {}
        for col in s_pdf.columns:
            if col not in d_pdf.columns:
                continue
            a, b = s_pdf[col].dtype, d_pdf[col].dtype
            if a == b:
                continue
            if a.kind == b.kind:
                width[col] = [str(a), str(b)]
            else:
                kind[col] = [str(a), str(b)]
        if width or kind:
            findings[name] = {"width": width, "kind": kind}
        if (i + 1) % 50 == 0:
            print(f"... {i + 1}/{len(qs)}", flush=True)

    green = driver_green_rounds()
    evidence = []
    for name, f in findings.items():
        if f.get("width") and name in green:
            evidence.append(
                {"gate": name, "width_cols": f["width"], "green_rounds": green[name]}
            )

    out = {
        "sf_dir": SF_DIR,
        "gates_checked": len(qs),
        "gates_with_dtype_diffs": findings,
        "width_tolerated_evidence": evidence,
    }
    with open(os.path.join(REPO, "scripts", "width_audit.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"\n{len(findings)} gates with dtype diffs or errors")
    print(f"{len(evidence)} gates provide width-tolerance evidence:")
    for e in evidence:
        print(f"  {e['gate']}: {e['width_cols']} green in rounds {e['green_rounds']}")


if __name__ == "__main__":
    main()
