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
    # ROUND-8 window (verdict r7 item 1, seventh rotation): the
    # COMMITTED r8 set from COVERAGE.md §window-plan — every remaining
    # never-checked TPC-DS shape (41), the five exact dataops gates,
    # and three of the four committed rows-only gates. One deviation,
    # directed by verdict r7 items 2+4: the NEW io_python_datasource_stream
    # gate (UnboundedSource offset/split contract, completing the SDF
    # demonstration for both boundedness modes; growth +1) takes the slot
    # of agg_approx_count_distinct, and — applying item 4's principle
    # ("register the exact variant as the window-facing gate so the
    # driver file converges to all-green", also pinned by
    # test_window_gates_all_have_oracles) — the three committed rows-only
    # gates face the driver through their exact twins: agg_sample_per_key
    # -> agg_sample_per_key_deterministic, agg_approx_unique_per_key ->
    # agg_approx_unique_per_key_bounds, agg_approx_quantiles_per_key ->
    # agg_approx_quantiles_per_key_bounds. Every row in CORRECTNESS_r08
    # carries a hash verdict; COVERAGE.md §window-plan documents the
    # rows-only accounting.
    "sql_tpcds_q10",
    "sql_tpcds_q74",
    "sql_tpcds_q14_pair",
    "sql_tpcds_q15",
    "sql_tpcds_q18",
    "sql_tpcds_q19",
    "sql_tpcds_q20",
    "sql_tpcds_q23_pair",
    "sql_tpcds_q24",
    "sql_tpcds_q26",
    "sql_tpcds_q28",
    "sql_tpcds_q29",
    "sql_tpcds_q30",
    "sql_tpcds_q37",
    "sql_tpcds_q39_pair",
    "sql_tpcds_q42",
    "sql_tpcds_q46",
    "sql_tpcds_q48",
    "sql_tpcds_q52",
    "sql_tpcds_q55",
    "sql_tpcds_q56",
    "sql_tpcds_q57",
    "sql_tpcds_q60",
    "sql_tpcds_q61",
    "sql_tpcds_q62",
    "sql_tpcds_q63",
    "sql_tpcds_q68",
    "sql_tpcds_q71",
    "sql_tpcds_q72",
    "sql_tpcds_q73",
    "sql_tpcds_q80",
    "sql_tpcds_q81",
    "sql_tpcds_q82",
    "sql_tpcds_q84",
    "sql_tpcds_q86",
    "sql_tpcds_q91",
    "sql_tpcds_q92",
    "sql_tpcds_q94",
    "sql_tpcds_q95",
    "sql_tpcds_q96",
    "sql_tpcds_q99",
    "emb_kmeans_step",
    "doc_shuffle",
    "doc_gopher_rules",
    "doc_substring_dup",
    "doc_epoch_repeats",
    "io_python_datasource_stream",
    "agg_sample_per_key_deterministic",
    "agg_approx_unique_per_key_bounds",
    "agg_approx_quantiles_per_key_bounds",
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
