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
    # ROUND-12 window (eleventh rotation — the COMMITTED r12 set from
    # COVERAGE.md §window-plan "Committed r12 window plan", verbatim):
    # the six r11-banked devices promoted via the mechanical devices.py
    # path lead (growth +6, registry 432 -> 438), then the 44 stalest
    # exact-oracle gates by last-driver-row age (rows-only gates
    # excluded by design — they face the driver through their
    # driver-green exact twins). Every row carries a hash verdict.
    "stream_ann_serving_et",
    "doc_crawl_funnel",
    "doc_length_histogram_plan",
    "stream_minhash_ingest_et",
    "stream_crawl_funnel",
    "doc_minhash_index_compact",
    "doc_quality_score",
    "doc_langid",
    "doc_exact_dedup",
    "doc_minhash_signature",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "doc_ngram_jaccard",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_neardup_pairs",
    "mm_binary_meta",
    "mm_frame_extract",
    "emb_ivf_topk",
    "mm_audio_meta",
    "doc_neardup_clusters",
    "emb_inference",
    "doc_bm25_topk",
    "doc_chunk_windows",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "io_cdc_apply",
    "io_zorder_histogram",
    "evt_disjoint_merge_window",
    "evt_range_join",
    "sql_hop",
    "sql_in_subquery",
    "sql_cte_chain",
    "sql_values_join",
    "sql_order_limit_offset",
    "sql_case_insensitive_agg",
    "doc_repetition",
    "doc_pii_scrub",
    "emb_normalize",
    "doc_quality_filter",
    "doc_vocab_topk",
    "doc_simhash_pairs",
    "doc_normalize",
    "mm_image_meta",
    "mm_video_meta",
    "doc_profile",
    "doc_unigram_logprob",
    "doc_hash_split",
    "emb_quantize",
    "emb_inference_keyed",
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
