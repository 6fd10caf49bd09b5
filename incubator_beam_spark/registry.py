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
    # ROUND-11 window (verdict r10 item 1, tenth rotation — the
    # COMMITTED r11 set from COVERAGE.md §window-plan, verbatim): the
    # seven r10-built devices promoted via the mechanical devices.py
    # path lead (growth +7, registry 425 -> 432), then the 43 stalest
    # exact-oracle gates by last-driver-row age (rows-only gates
    # excluded by design — they face the driver through their
    # driver-green exact twins). Every row carries a hash verdict.
    "stream_ann_serving",
    "stream_match_recognize_compound_order_et",
    "doc_minhash_ingest_loop",
    "mm_flac_meta",
    "emb_ivf_cell_split",
    "stream_minhash_ingest",
    "doc_html_extract",
    "set_union_distinct",
    "set_intersect_all",
    "set_except_all",
    "topk_per_key",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "win_rank_functions",
    "win_lead_lag",
    "win_running_sum",
    "q2_min_cost_supplier",
    "pardo_tagged_outputs",
    "io_write_dynamic",
    "agg_top_per_key_array",
    "agg_to_list_sorted",
    "agg_to_set",
    "agg_count_if_any_value",
    "win_range_frame",
    "agg_hotkey_fanout",
    "combine_lifted_geomean",
    "fn_regex_suite",
    "fn_json_suite",
    "sql_udtf_ngrams",
    "evt_tumbling_window",
    "evt_sliding_window",
    "evt_session_window",
    "evt_timestamp_combiners",
    "evt_group_into_batches",
    "evt_custom_merging_window",
    "evt_asof_join",
    "sql_tumble",
    "sql_session",
    "sql_exists_subquery",
    "sql_scalar_subquery",
    "sql_correlated_avg",
    "sql_grouping_sets",
    "sql_unnest_lateral",
    "doc_text_stats",
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
