"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``incubator_beam_spark.registry``: every implemented
operator from SURVEY.md §2 is registered there as a named query with
(where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubator_beam_spark import registry  # noqa: E402

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return {name: q.fn for name, q in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    registry.load_all()
    return {name: q.oracle for name, q in registry.QUERIES.items() if q.oracle is not None}
