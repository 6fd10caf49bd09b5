"""Dev loop: run registered queries against the DuckDB oracle at a given sf.

Usage: python scripts/check_queries.py [name ...] [--sf DIR]
Runs all queries when no names given; prints PASS/FAIL per query.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from incubator_beam_spark import registry
from incubator_beam_spark.catalog import TABLES
from incubator_beam_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    os.environ["TEST_SF_DIR"] = args.sf
    import conftest  # noqa: E402  (after TEST_SF_DIR so SF_DIR is right)

    registry.load_all()
    names = args.names or sorted(registry.QUERIES)
    spark = get_spark("check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    failed = []
    for name in names:
        q = registry.QUERIES[name]
        try:
            df = q.fn(spark, args.sf)
            if q.oracle:
                conftest.assert_matches_oracle(df, con, q.oracle, name)
                print(f"PASS  {name}")
            else:
                n = df.count()
                print(f"PASS  {name} (rows-only, n={n})")
        except Exception as e:  # noqa: BLE001 - dev tool reports and continues
            failed.append(name)
            msg = str(e).split("\n")[0][:300]
            print(f"FAIL  {name}: {msg}")
            if os.environ.get("CHECK_VERBOSE"):
                traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
