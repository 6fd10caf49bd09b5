"""Banked promotion devices — gate-ready queries with exact DuckDB
oracles. Two populations live here:

* ``promoted_r9()`` — the 19 devices banked during round 8 and
  REGISTERED in round 9 (this module sits in
  ``registry._QUERY_MODULES`` and ``_register_all()`` applies
  ``@query`` to each pair at import). All 19 hold the first slots of
  the r9 driver window (``registry._PRIORITY``; COVERAGE.md
  §window-plan).
* ``devices()`` — the CURRENT bank: devices built this round that
  stay unregistered until the next round's window opens (growth
  freeze; every entry must be pytest-oracle-green at all three
  fixture SFs before it enters the bank).

PROMOTION stays mechanical: next round, move entries from
``devices()`` into the promoted dict and insert the names into
``registry._PRIORITY`` (window placement per COVERAGE.md
§window-plan).

The streaming devices return DRAINED batch DataFrames (bounded
file-backed stream through a memory sink — the same contract every
registered stream_* gate uses), so the driver's (spark, sf_dir) ->
DataFrame comparator applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# -- streaming MATCH_RECOGNIZE devices (plans/cep.py streaming kernel) -------

STREAM_MR_ALL_ROWS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events),
tri AS (
  SELECT o1.user_id, o1.rn,
         o1.event_id AS e1, o2.event_id AS e2, o3.event_id AS e3,
         o2.value AS dval
  FROM ordered o1
  JOIN ordered o2 ON o2.user_id = o1.user_id AND o2.rn = o1.rn + 1
  JOIN ordered o3 ON o3.user_id = o1.user_id AND o3.rn = o1.rn + 2
  WHERE o1.event_type = 'signup' AND o2.event_type = 'click'
    AND o3.event_type = 'purchase'),
num AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rn) AS mn
  FROM tri)
SELECT user_id, mn AS match_number, 'S' AS classifier,
       e1 AS event_id, 1::BIGINT AS n_run, NULL::DOUBLE AS d_val
FROM num
UNION ALL
SELECT user_id, mn, 'D', e2, 2::BIGINT, dval FROM num
UNION ALL
SELECT user_id, mn, 'R', e3, 3::BIGINT, dval FROM num
"""


def stream_match_recognize_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ALL ROWS PER MATCH (per-row emission path): ``S D R``
    per-user triples — candidates are provably disjoint, so greedy SKIP
    PAST LAST ROW == all candidates and the oracle enumerates
    consecutive rn-triples. Each match emits THREE rows with
    classifier, order value, RUNNING COUNT(*) and RUNNING
    LAST(D.value)."""
    from ..plans.cep import match_recognize_stream
    from .streaming_queries import _drain, stream_table

    e = stream_table(spark, sf_dir, "events")
    out = match_recognize_stream(
        e,
        partition_by="user_id",
        order_by="event_id",
        define={
            "S": F.col("event_type") == "signup",
            "D": F.col("event_type") == "click",
            "R": F.col("event_type") == "purchase",
        },
        pattern="S D R",
        measures={
            "n_run": ("count", None),
            "d_val": ("last", "D", "value"),
        },
        all_rows=True,
    )
    return _drain(out, "append")


STREAM_MR_CLASSIFIER_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events),
pair AS (
  SELECT o1.user_id, o1.rn, o1.event_id AS e1, o2.event_id AS e2,
         CASE WHEN o2.event_type = 'purchase' THEN 'R' ELSE 'D' END
           AS classifier
  FROM ordered o1
  JOIN ordered o2 ON o2.user_id = o1.user_id AND o2.rn = o1.rn + 1
  WHERE o1.event_type = 'signup'
    AND o2.event_type IN ('click', 'purchase'))
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY rn)
         AS match_number,
       classifier, e1 AS start_event, e2 AS end_event
FROM pair
"""


def stream_match_recognize_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CLASSIFIER() under ONE ROW PER MATCH with a genuinely
    varying symbol: ``S (R | D)`` — a signup followed by a purchase or
    a click; the oracle derives the classifier from the second row's
    type."""
    from ..plans.cep import match_recognize_stream
    from .streaming_queries import _drain, stream_table

    e = stream_table(spark, sf_dir, "events")
    out = match_recognize_stream(
        e,
        partition_by="user_id",
        order_by="event_id",
        define={
            "S": F.col("event_type") == "signup",
            "D": F.col("event_type") == "click",
            "R": F.col("event_type") == "purchase",
        },
        pattern="S (R | D)",
        measures={
            "start_event": ("first", "S", "event_id"),
            "end_event": ("last", None, "event_id"),
        },
        with_classifier=True,
    )
    return _drain(out, "append")


STREAM_MR_COMPOUND_KEY_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY event_id) AS rn
  FROM events),
high AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY rn) AS isl
  FROM ordered WHERE value >= 150),
pos AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, isl
                               ORDER BY rn) AS p
  FROM high),
pairs AS (
  SELECT a.user_id, a.event_type, a.rn AS srn,
         a.event_id AS e1, b.event_id AS e2
  FROM pos a JOIN pos b
    ON b.user_id = a.user_id AND b.event_type = a.event_type
   AND b.isl = a.isl AND b.p = a.p + 1
  WHERE a.p % 2 = 1)
SELECT user_id, event_type,
       row_number() OVER (PARTITION BY user_id, event_type
                          ORDER BY srn) AS match_number,
       e1 AS first_event, e2 AS last_event
FROM pairs
"""


def stream_match_recognize_compound_key(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING compound PARTITION BY (user_id, event_type): greedy
    ``H H`` pairs each island of consecutive high rows left to right;
    the oracle reproduces it with island detection and odd-position
    pairing."""
    from ..plans.cep import match_recognize_stream
    from .streaming_queries import _drain, stream_table

    e = stream_table(spark, sf_dir, "events")
    out = match_recognize_stream(
        e,
        partition_by=["user_id", "event_type"],
        order_by="event_id",
        define={"H": F.col("value") >= 150},
        pattern="H H",
        measures={
            "first_event": ("first", "H", "event_id"),
            "last_event": ("last", "H", "event_id"),
        },
    )
    return _drain(out, "append")


STREAM_MR_SKIP_NEXT_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events),
pairs AS (
  SELECT o1.user_id, o1.rn,
         o1.event_id AS e1, o2.event_id AS e2, o2.value AS v2
  FROM ordered o1
  JOIN ordered o2 ON o2.user_id = o1.user_id AND o2.rn = o1.rn + 1
  WHERE o1.value >= 100 AND o2.value >= 100)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY rn)
         AS match_number,
       e1 AS first_event, e2 AS last_event, v2 AS last_val
FROM pairs
"""


def stream_match_recognize_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING AFTER MATCH SKIP TO NEXT ROW — the overlapping twin of
    the compound-key device: restarting one past each match start makes
    EVERY consecutive high-value pair a match (islands of k high rows
    yield k-1 overlapping matches, not floor(k/2))."""
    from ..plans.cep import match_recognize_stream
    from .streaming_queries import _drain, stream_table

    e = stream_table(spark, sf_dir, "events")
    out = match_recognize_stream(
        e,
        partition_by="user_id",
        order_by="event_id",
        define={"H": F.col("value") >= 100},
        pattern="H H",
        measures={
            "first_event": ("first", "H", "event_id"),
            "last_event": ("last", "H", "event_id"),
            "last_val": ("last", "H", "value"),
        },
        after_match="to next row",
    )
    return _drain(out, "append")


def stream_hashngram_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fastText-style hashed-ngram classifier running as a
    Structured Streaming query: documents arrive as micro-batches
    (file source) and the classifier — a stateless scan-side
    projection — scores each batch as it lands; the drained sink must
    equal the batch gate's output exactly (oracle: the same
    HASHNGRAM_ORACLE). This is the deploy shape of a quality filter on
    an ingest stream: zero state, zero shuffle, per-batch latency =
    scan + projection."""
    from ..dataops.inference import hash_ngram_classify
    from .streaming_queries import _drain, stream_table

    d = stream_table(spark, sf_dir, "documents")
    return _drain(hash_ngram_classify(d), "append")


# -- the device manifest ------------------------------------------------------


def _dataops_devices():
    from . import dataops as _d

    return {
        "doc_pagerank": (_d.doc_pagerank, _d.PAGERANK_ORACLE),
        "mm_jpeg_meta": (_d.mm_jpeg_meta, _d.JPEG_META_ORACLE),
        "doc_bigram_kn_logprob": (_d.doc_bigram_kn_logprob, _d.BIGRAM_KN_ORACLE),
        "doc_hashngram_classify": (_d.doc_hashngram_classify, _d.HASHNGRAM_ORACLE),
        "doc_ccnet_buckets": (_d.doc_ccnet_buckets, _d.CCNET_BUCKETS_ORACLE),
        "emb_knn_classify": (_d.emb_knn_classify, _d.KNN_CLASSIFY_ORACLE),
        "doc_unigram_viterbi": (_d.doc_unigram_viterbi, _d.UNIGRAM_VITERBI_ORACLE),
        "mm_gif_meta": (_d.mm_gif_meta, _d.GIF_META_ORACLE),
        "doc_wordpiece_stats": (_d.doc_wordpiece_stats, _d.WORDPIECE_ORACLE),
        "doc_quality_ensemble": (_d.doc_quality_ensemble, _d.QUALITY_ENSEMBLE_ORACLE),
        "doc_rrf_hybrid_topk": (_d.doc_rrf_hybrid_topk, _d.RRF_HYBRID_ORACLE),
        "mm_image_ahash_dedup": (_d.mm_image_ahash_dedup, _d.IMAGE_AHASH_ORACLE),
        "mm_image_resize": (_d.mm_image_resize, _d.IMAGE_RESIZE_ORACLE),
        "mm_audio_resample": (_d.mm_audio_resample, _d.AUDIO_RESAMPLE_ORACLE),
    }


def promoted_r9() -> dict:
    """name -> (query_fn, oracle_sql) for the 19 devices promoted into
    the registry in round 9 (the r8 bank, registered via
    ``_register_all`` at import)."""
    out = {
        "stream_match_recognize_all_rows": (
            stream_match_recognize_all_rows,
            STREAM_MR_ALL_ROWS_ORACLE,
        ),
        "stream_match_recognize_classifier": (
            stream_match_recognize_classifier,
            STREAM_MR_CLASSIFIER_ORACLE,
        ),
        "stream_match_recognize_compound_key": (
            stream_match_recognize_compound_key,
            STREAM_MR_COMPOUND_KEY_ORACLE,
        ),
        "stream_match_recognize_skip_next": (
            stream_match_recognize_skip_next,
            STREAM_MR_SKIP_NEXT_ORACLE,
        ),
    }
    from . import dataops as _d

    out["stream_hashngram_classify"] = (
        stream_hashngram_classify,
        _d.HASHNGRAM_ORACLE,
    )
    out.update(_dataops_devices())
    return out


STREAM_MR_PREV_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER w AS rn,
         CASE WHEN value < lag(value) OVER w THEN 'D'
              WHEN value > lag(value) OVER w THEN 'U'
              ELSE NULL END AS cls
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
druns AS (
  SELECT user_id, min(rn) AS start_rn, max(rn) AS end_rn,
         max(event_id) AS bottom_event, count(*)::BIGINT AS n_down
  FROM (SELECT *, rn - row_number()
          OVER (PARTITION BY user_id ORDER BY rn) AS grp
        FROM ordered WHERE cls = 'D')
  GROUP BY user_id, grp),
pairs AS (
  SELECT d.user_id, d.start_rn, d.bottom_event,
         u.event_id AS top_event, d.n_down
  FROM druns d JOIN ordered u
    ON u.user_id = d.user_id AND u.rn = d.end_rn + 1 AND u.cls = 'U')
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY start_rn)
         AS match_number,
       bottom_event, top_event, n_down
FROM pairs
"""


def stream_match_recognize_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREV() physical navigation in the STREAMING kernel (r9 lift;
    verdict r8 item 2): the batch V-pattern's falling/rising DEFINEs
    ``DOWN AS value < PREV(value)`` compiled to in-state callables —
    lag's physical-row frame is rows the state buffer already holds,
    with max_prev consumed rows retained as history so PREV sees
    across the consumption boundary. Pattern is the non-extendable
    V-variant ``DOWN+ UP`` (the batch gate's trailing ``UP+`` would
    violate the streaming liveness guard — a trailing quantifier can
    always extend into the next batch). Oracle: lag-classified D-runs
    immediately followed by a U row."""
    import uuid

    from ..plans.sqlfront import run_sql_stream
    from .streaming_queries import _drain, stream_table

    view = f"__mrprev_{uuid.uuid4().hex[:8]}"
    stream_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    out = run_sql_stream(
        spark,
        f"""
        SELECT user_id, match_number, bottom_event, top_event, n_down
        FROM {view} MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES LAST(DOWN.event_id) AS bottom_event,
                   LAST(UP.event_id) AS top_event,
                   COUNT(DOWN.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN+ UP)
          DEFINE DOWN AS value < PREV(value),
                 UP AS value > PREV(value)
        )
        """,
    )
    return _drain(out, "append")


STREAM_MR_COMPOUND_ORDER_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY event_type, event_id) AS rn
  FROM events),
high AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
         AS isl
  FROM ordered WHERE value >= 150),
pos AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, isl ORDER BY rn) AS p
  FROM high),
pairs AS (
  SELECT a.user_id, a.rn AS srn,
         a.event_type AS first_type, a.event_id AS first_event,
         b.event_type AS last_type, b.event_id AS last_event
  FROM pos a JOIN pos b
    ON b.user_id = a.user_id AND b.isl = a.isl AND b.p = a.p + 1
  WHERE a.p % 2 = 1)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY srn)
         AS match_number,
       first_type, first_event, last_type, last_event
FROM pairs
"""


def stream_match_recognize_compound_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING compound ORDER BY (r9 lift — the last documented
    streaming-only restriction): scan order (event_type, event_id)
    within each user — the composite sort key lives in state slot 0,
    ties resolve by the declared column order, and the MEASURES
    reference BOTH order columns (the multi-order data-slot path).
    Greedy ``H H`` pairs over the high-value rows in compound order;
    the oracle reproduces it with island detection over the same
    compound ordering."""
    from ..plans.cep import match_recognize_stream
    from .streaming_queries import _drain, stream_table

    e = stream_table(spark, sf_dir, "events")
    out = match_recognize_stream(
        e,
        partition_by="user_id",
        order_by=["event_type", "event_id"],
        define={"H": F.col("value") >= 150},
        pattern="H H",
        measures={
            "first_type": ("first", "H", "event_type"),
            "first_event": ("first", "H", "event_id"),
            "last_type": ("last", "H", "event_type"),
            "last_event": ("last", "H", "event_id"),
        },
    )
    return _drain(out, "append")


def promoted_r10() -> dict:
    """name -> (query_fn, oracle_sql) for the SIX devices banked during
    round 9 and REGISTERED in round 10 (they lead the r10 driver
    window; COVERAGE.md §window-plan). The q72_factfact body carries
    the r10 ``mon`` CAST to BIGINT in both CTEs (Spark
    year()*12+month() is INT, DuckDB's BIGINT). Round 11's width audit
    (scripts/width_audit.json) settled that the driver hash actually
    TOLERATES integer width, so the cast was harmless-but-unneeded —
    kept because aligned dtypes cost nothing."""
    from . import dataops as _d
    from . import tpcds as _t

    return {
        "stream_match_recognize_prev": (
            stream_match_recognize_prev,
            STREAM_MR_PREV_ORACLE,
        ),
        "sql_tpcds_q72_factfact": (
            _t.sql_tpcds_q72_factfact,
            _t._Q72_FACTFACT_BODY,
        ),
        "doc_minhash_incremental": (
            _d.doc_minhash_incremental,
            _d.MINHASH_INCREMENTAL_ORACLE,
        ),
        "stream_ivf_index_maintain": (
            _d.stream_ivf_index_maintain,
            _d.STREAM_IVF_MAINTAIN_ORACLE,
        ),
        "stream_match_recognize_compound_order": (
            stream_match_recognize_compound_order,
            STREAM_MR_COMPOUND_ORDER_ORACLE,
        ),
        "emb_second_moments": (
            _d.emb_second_moments,
            _d.EMB_MOMENTS_ORACLE,
        ),
    }


STREAM_MR_COMPOUND_ORDER_ET_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY date_trunc('minute', ts), event_type,
                                     event_id) AS rn
  FROM events),
high AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
         AS isl
  FROM ordered WHERE value >= 150),
pos AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, isl ORDER BY rn) AS p
  FROM high),
pairs AS (
  SELECT a.user_id, a.rn AS srn,
         a.event_type AS first_type, a.event_id AS first_event,
         b.event_type AS last_type, b.event_id AS last_event
  FROM pos a JOIN pos b
    ON b.user_id = a.user_id AND b.isl = a.isl AND b.p = a.p + 1
  WHERE a.p % 2 = 1)
SELECT user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY srn)
         AS match_number,
       first_type, first_event, last_type, last_event
FROM pairs
"""


def stream_match_recognize_compound_order_et(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EVENT-TIME x compound ORDER BY (r10 lift — the restriction the
    r9 round left documented): order by (tmin, event_type, event_id)
    where ``tmin`` is the MINUTE-truncated timestamp — the watermark
    column, with heavy TIES inside every minute that the two
    tie-breaker columns must resolve batch-identically — under WILDLY
    out-of-order arrival (second half of the month delivered first,
    same scripting as stream_cep_event_time: 60-day watermark delay,
    then terminator / watermark-push / flush sentinel waves). Greedy
    ``H H`` pairs the high-value islands in compound order; MEASURES
    read both tie-breaker columns (tie-breakers stay measurable — only
    the watermark column itself is held as integer microseconds).
    Sentinels carry value 0 after all real data, so they decide
    trailing matches without joining any."""
    import tempfile
    import time

    from ..plans.cep import match_recognize_stream
    from .events import _per_user_sentinels, _stage_scripted_file
    from .streaming_queries import _drain

    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    stage = tempfile.mkdtemp(prefix="cep_et_compound_")
    mid = F.lit("2024-01-16").cast("timestamp")
    t0 = time.time() - 100
    _stage_scripted_file(stage, e.filter(F.col("ts") >= mid), "a_late_half", t0)
    _stage_scripted_file(stage, e.filter(F.col("ts") < mid), "b_early_half", t0 + 10)

    def sent(ts_lit):
        return (
            _per_user_sentinels(e, ts_lit)
            .withColumn("value", F.lit(0.0))
            .select(e.columns)
        )

    _stage_scripted_file(stage, sent("2024-03-01"), "c_terminators", t0 + 20)
    _stage_scripted_file(stage, sent("2024-06-01"), "d_wm_push", t0 + 30)
    _stage_scripted_file(stage, sent("2024-06-02"), "e_flush", t0 + 40)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    ).withColumn("tmin", F.date_trunc("minute", F.col("ts")))
    out = match_recognize_stream(
        stream,
        partition_by="user_id",
        order_by=["tmin", "event_type", "event_id"],
        define={"H": F.col("value") >= 150},
        pattern="H H",
        measures={
            "first_type": ("first", "H", "event_type"),
            "first_event": ("first", "H", "event_id"),
            "last_type": ("last", "H", "event_type"),
            "last_event": ("last", "H", "event_id"),
        },
        event_time=True,
        watermark_delay="60 days",
    )
    return _drain(out, "append")


def promoted_r11() -> dict:
    """name -> (query_fn, oracle_sql) for the SEVEN devices banked
    during round 10 and REGISTERED in round 11 (they lead the r11
    driver window; COVERAGE.md §window-plan). All seven were
    dtype-strict emulator-clean at sf0.01 AND sf0.1 before promotion
    (and judge-verified independently in the r10 verdict)."""
    from . import dataops as _d

    return {
        "stream_ann_serving": (
            _d.stream_ann_serving,
            _d.STREAM_ANN_SERVING_ORACLE,
        ),
        "stream_match_recognize_compound_order_et": (
            stream_match_recognize_compound_order_et,
            STREAM_MR_COMPOUND_ORDER_ET_ORACLE,
        ),
        "doc_minhash_ingest_loop": (
            _d.doc_minhash_ingest_loop,
            _d.MINHASH_INGEST_LOOP_ORACLE,
        ),
        "mm_flac_meta": (
            _d.mm_flac_meta,
            _d.FLAC_META_ORACLE,
        ),
        "emb_ivf_cell_split": (
            _d.emb_ivf_cell_split,
            _d.IVF_CELL_SPLIT_ORACLE,
        ),
        "stream_minhash_ingest": (
            _d.stream_minhash_ingest,
            _d.STREAM_MINHASH_INGEST_ORACLE,
        ),
        "doc_html_extract": (
            _d.doc_html_extract,
            _d.HTML_EXTRACT_ORACLE,
        ),
    }


def promoted_r12() -> dict:
    """name -> (query_fn, oracle_sql) for the SIX devices banked during
    round 11 and REGISTERED in round 12 (they lead the r12 driver
    window; COVERAGE.md §window-plan "Committed r12 window plan"). All
    six were dtype-strict emulator-clean at sf0.01 AND sf0.1 before
    promotion (r11 close-out 6/6 sweeps) and re-verified at promotion
    time (r12)."""
    from . import dataops as _d

    return {
        "stream_ann_serving_et": (
            _d.stream_ann_serving_et,
            _d.STREAM_ANN_SERVING_ET_ORACLE,
        ),
        "doc_crawl_funnel": (
            _d.doc_crawl_funnel,
            _d.CRAWL_FUNNEL_ORACLE,
        ),
        "doc_length_histogram_plan": (
            _d.doc_length_histogram_plan,
            _d.CRAWL_LENGTH_PLAN_ORACLE,
        ),
        "stream_minhash_ingest_et": (
            _d.stream_minhash_ingest_et,
            _d.STREAM_MINHASH_INGEST_ET_ORACLE,
        ),
        "stream_crawl_funnel": (
            _d.stream_crawl_funnel,
            _d.STREAM_CRAWL_FUNNEL_ORACLE,
        ),
        "doc_minhash_index_compact": (
            _d.doc_minhash_index_compact,
            _d.MINHASH_INDEX_COMPACT_ORACLE,
        ),
    }


def devices() -> dict:
    """name -> (query_fn, oracle_sql) for every CURRENTLY banked device
    (built this round, registered next round). The bank restarts empty
    at each promotion; the r11 bank was promoted in r12
    (``promoted_r12``) and r12 is an optimization round (no new
    devices), so the bank is empty."""
    return {}


def _register_all() -> None:
    """Apply @query to every promoted device (runs at import)."""
    from ..registry import query

    for promoted in (promoted_r9, promoted_r10, promoted_r11, promoted_r12):
        for name, (fn, oracle) in promoted().items():
            query(name, oracle=oracle)(fn)


_register_all()
