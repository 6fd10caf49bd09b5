"""Query registry — the declared operator inventory.

Every operator from SURVEY.md §2 that is implemented gets a named entry
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string computing the same result on the
same parquet tables. The driver hash-compares the two at sf0.01.

Convention: alias every computed column identically in the Spark plan and
the oracle, and ``ROUND`` floating-point aggregates on BOTH sides so the
value-hash is insensitive to summation order. For ratios/averages whose
true value can land exactly on a decimal .5 boundary, emit INTEGER units
(``CAST(round(x * 10^k) AS BIGINT)``) instead of ``round(x, k)`` —
engines disagree on HALF_UP vs half-away rounding of such doubles
(surfaces at sf>=0.1).
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
    "incubator_beam_spark.queries.coreapi",
    "incubator_beam_spark.queries.combiners",
    "incubator_beam_spark.queries.functions",
    "incubator_beam_spark.queries.events",
    "incubator_beam_spark.queries.sqlfront",
    "incubator_beam_spark.queries.tpcds",
    "incubator_beam_spark.queries.dataops",
    "incubator_beam_spark.queries.streaming_queries",
    "incubator_beam_spark.queries.loadtests",
    "incubator_beam_spark.queries.game",
    "incubator_beam_spark.queries.examples",
    "incubator_beam_spark.queries.surface",
    "incubator_beam_spark.queries.devices",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query, optionally with a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver emits correctness rows for the FIRST 50 registered names only.
# Spend that window on the highest-risk components: LLM-data ops, SQL front
# door, event windowing, the round-1 red rows, and newly added operator
# gates. Everything else (TPC-H, joins, sets — all driver-green in round 1)
# registers after the window and stays covered by the local oracle tests.
_PRIORITY: tuple[str, ...] = (
    # ROUND-10 window (verdict r9 item 1, ninth rotation — the
    # COMMITTED r10 set from COVERAGE.md §window-plan, verbatim): the
    # six r9-built devices promoted via the mechanical devices.py path
    # lead (growth +6, registry 419 -> 425), then cep_all_rows_running
    # (the one CEP family member the r9 displacement rule dropped),
    # then the 15 heavy/misc re-check slots the r9 promotions
    # displaced, then the 28 stalest r1-era gates (driver-checked once
    # in round 1, never since). Every row carries a hash verdict.
    "stream_match_recognize_prev",
    "sql_tpcds_q72_factfact",
    "doc_minhash_incremental",
    "stream_ivf_index_maintain",
    "stream_match_recognize_compound_order",
    "emb_second_moments",
    "cep_all_rows_running",
    "io_python_datasource",
    "io_tfrecord_roundtrip",
    "core_elementwise_chain",
    "core_partition_fanout",
    "core_reshuffle_stability",
    "schema_surgery_roundtrip",
    "join_lookup_broadcast",
    "stream_nexmark_q7",
    "stream_stream_left_join",
    "doc_curation_pipeline",
    "sql_tpcds_q64",
    "sql_tpcds_q67",
    "sql_tpcds_q78",
    "sql_tpcds_q5",
    "sql_tpcds_q14",
    "agg_bit_xor",
    "agg_count_per_element",
    "agg_cube",
    "agg_latest_per_key",
    "agg_mean_per_key",
    "agg_pivot",
    "agg_rollup",
    "agg_string_agg",
    "agg_tuple_combine",
    "agg_variance_covariance",
    "cogroup_by_key",
    "distinct_rows",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "join_semi",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "set_except",
    "set_intersect",
    "set_union_all",
    "topk_global",
)


def load_all() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if e.name != mod:  # genuinely missing dependency inside the module
                raise
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    QUERIES.clear()
    QUERIES.update(ordered)
    return QUERIES
