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
    # Round-3 rotation: the 92 r1∪r2 driver-green names stay covered by the
    # local oracle suite; this window goes to never-driver-checked gates.
    # ROUND-4 TODO: rotate again — after r3's window the never-driver-checked
    # set is roughly: NEXMark q0-q12, the 9 schema-adapted TPC-H (q4 q6v2
    # q11-q22 variants), evt_dynamic_session_window/evt_window_reify/
    # evt_timestamp_combiners leftovers, combine_values_norm, groupby_fluent,
    # fn_regex/fn_json suites not in r3's window, doc_shuffle,
    # doc_pack_sequences, doc_bpe_merges, emb_pq_codes, mm_image_decode,
    # sql_grouping_sets/rollup/cube/pivot leftovers, fn_array_suite,
    # fn_unnest, fn_tostring_kvs, fn_bitwise_suite, fn_map_suite,
    # fn_math/datetime/conditional_suite (bumped from this window),
    # everything added in round 3 after the r3 window opened
    # (doc_gopher_rules, emb_semdedup, io_synthetic_bounded,
    # doc_substring_dup, mm_audio_rms, agg_sample[_per_key]_deterministic,
    # load_*, df_pandas_groupby, stream_synthetic_gbk), and this session's
    # additions not already below: sql_pandas_udaf, emb_index_persist_topk,
    # stream_nexmark_q7, stream_incremental_dedup, core_elementwise_chain,
    # core_partition_fanout, core_reshuffle_stability,
    # schema_surgery_roundtrip, join_lookup_broadcast, io_tfrecord_roundtrip,
    # evt_capped_session_window, evt_funnel_steps, evt_retention_cohorts,
    # evt_anomaly_zscore, doc_bigram_logprob, stream_stream_left_join,
    # trigger_aftercount_panes, trigger_accumulating_panes, doc_fingerprint
    # (bumped for stateful_timer_flush).
    # Mechanical rotation: `python scripts/rotate_window.py [--verify]`
    # unions all CORRECTNESS_r*.json rows and prints the never-checked
    # names as a ready-to-paste window (run AFTER the r3 file lands).
    # Lead with the round-2 red row (TIMESTAMP_NTZ fix proof):
    "evt_range_join",
    # streaming ValidatesRunner parity gates (engine namesake; two were
    # broken by the same NTZ root cause, now fixed)
    "stream_tumbling_agg",
    "stream_stateless_map_filter",
    "stream_distinct_users",
    "stream_session_window",
    "stream_stream_join",
    "stream_asof_enrich",
    # round-2-added LLM-data gates (text curation / fingerprints / packing)
    "doc_normalize",
    # doc_fingerprint (trivial md5 projection, lowest risk) -> round 4;
    # its slot goes to the stateful-ParDo/timer kernel's first driver row
    "stateful_timer_flush",
    "doc_repetition",
    "doc_pii_scrub",
    "doc_quality_filter",
    "doc_vocab_topk",
    "doc_simhash_pairs",
    "doc_profile",
    "doc_unigram_logprob",
    "doc_hash_split",
    "doc_contamination",
    "doc_dsir_weights",
    "doc_domain_mix",
    "doc_quality_top_per_domain",
    "doc_incremental_new",
    "doc_weighted_sample",
    "doc_token_entropy",
    "doc_temperature_resample",
    "doc_concat_chunk_spans",
    # embedding ops: normalization, k-means, quantization, IVF-PQ, keyed inference
    "emb_normalize",
    # the full Lloyd loop's UNROLLED exact oracle subsumes the one-step
    # gate (emb_kmeans_step -> round 4)
    "emb_kmeans_lloyd",
    "emb_quantize",
    "emb_inference_keyed",
    "emb_centroid_outliers",
    "emb_sign_projection",
    "emb_ivfpq_topk",
    # multimodal byte codecs
    "mm_image_meta",
    "mm_video_meta",
    # SQL rels never driver-checked
    "sql_hop",
    "sql_in_subquery",
    "sql_cte_chain",
    "sql_values_join",
    "sql_order_limit_offset",
    "sql_case_insensitive_agg",
    # scalar-function suites (SURVEY §2.8 scalar fn rows; the other 5
    # rotate to round 4 — all 9 are local-oracle-green)
    # fn_string/math/datetime/conditional_suite rotated to round 4 to make
    # room for this session's brand-new operator paths (higher risk than
    # the pure-builtin fn suites, which stay local-oracle-green); also new
    # this round but composed of driver-checked pieces, deferred to r4:
    # sql_pandas_udaf, emb_index_persist_topk, trigger_aftercount_panes
    "evt_disjoint_merge_window",
    "join_bloom_prefilter",
    "stream_deduplicate",
    # the trigger VM's first exact-oracle row (scripted pane lifecycle)
    "trigger_lifecycle_panes",
    # round-3 session additions (highest-risk: brand new operators)
    "io_cdc_apply",
    "stream_cdc_apply",
    "join_skew_salted",
    "io_zorder_histogram",
    "doc_line_dedup",
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
