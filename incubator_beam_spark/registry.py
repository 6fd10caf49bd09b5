"""Query registry — the declared operator inventory.

Every operator from SURVEY.md §2 that is implemented gets a named entry
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string computing the same result on the
same parquet tables. The driver hash-compares the two at sf0.01.

Convention: alias every computed column identically in the Spark plan and
the oracle, and ``ROUND`` floating-point aggregates on BOTH sides so the
value-hash is insensitive to summation order.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "incubator_beam_spark.queries.relational",
    "incubator_beam_spark.queries.combiners",
    "incubator_beam_spark.queries.functions",
    "incubator_beam_spark.queries.events",
    "incubator_beam_spark.queries.sqlfront",
    "incubator_beam_spark.queries.dataops",
    "incubator_beam_spark.queries.streaming_queries",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query, optionally with a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if e.name != mod:  # genuinely missing dependency inside the module
                raise
    return QUERIES
