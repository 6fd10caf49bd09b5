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
    "incubator_beam_spark.queries.surface",
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
    # ROUND-4 window: never-driver-checked gates (verdict r3 item 1) +
    # the 7 most complex new TPC-DS conformance gates (item 2) + the
    # deterministic sample twins (item 7: approx family hard rows).
    # Rotated OUT to round 5 (still local-oracle-green):
    # combine_values_norm, agg_latest_globally, groupby_fluent,
    # io_synthetic_bounded, evt_window_reify, evt_windowed_join,
    # evt_distinct_users_per_window, evt_group_into_batches_sharded,
    # evt_dynamic_session_window, evt_capped_session_window,
    # evt_funnel_steps, evt_retention_cohorts, the 8 remaining
    # round-3 sql_tpcds_* (q3 q6 q7 q12 q38 q44 q89 q98), the 29
    # round-4-session sql_tpcds_* additions (q2 q4 q5 q9 q13 q14 q17
    # q21 q22 q25 q27 q32 q33 q35 q40 q43 q45 q50 q53 q58 q64 q65 q67
    # q66 q69 q75 q76 q78 q79 q83 q85 q87 q93 q8 q10 q74), the game suite, df_pandas_melt/cumsum/value_counts, stream_stream_full_outer_join, stream_sliding_agg, stream_chained_watermarks, and
    # whatever else this round adds after the window freezes.
    # Mechanical rotation: `python scripts/rotate_window.py [--verify]`.
    "nexmark_q0_passthrough",
    "nexmark_q1_currency",
    "nexmark_q2_filter",
    "nexmark_q3_local_item",
    "nexmark_q4_avg_closing",
    "nexmark_q5_hot_items",
    "nexmark_q6_avg_selling_last10",
    "nexmark_q7_highest_value",
    "nexmark_q8_new_users",
    "nexmark_q9_winning_bids",
    "nexmark_q11_user_sessions",
    "nexmark_q12_proc_time_count",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_priority_by_returnflag",
    "q16_supplier_part_count",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "fn_string_suite",
    "fn_math_suite",
    "fn_datetime_suite",
    "fn_conditional_suite",
    "fn_array_suite",
    "fn_unnest",
    "fn_tostring_kvs",
    "fn_bitwise_suite",
    "fn_map_suite",
    "fn_hof_suite",
    "df_pandas_groupby",
    "df_pandas_merge",
    "df_pandas_str_accessor",
    "df_pandas_rolling",
    "df_pandas_dt_accessor",
    "load_gbk",
    "load_cogbk",
    "load_pardo",
    "load_combine",
    "load_sideinput",
    "agg_sample_deterministic",
    "agg_sample_per_key_deterministic",
    "win_navigation_suite",
    "sql_tpcds_q1",
    "sql_tpcds_q11",
    "sql_tpcds_q36",
    "sql_tpcds_q47",
    "sql_tpcds_q51",
    "sql_tpcds_q59",
    "sql_tpcds_q70",
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
