"""Banked promotion devices — gate-ready queries with exact DuckDB
oracles that are NOT yet registered (registry growth is frozen
mid-round; every device here is pytest-oracle-green at all three
fixture SFs, see tests/test_cep.py + tests/test_dataops.py).

PROMOTION (the next round's first task) is mechanical:
1. append ``"incubator_beam_spark.queries.devices"`` to
   ``registry._QUERY_MODULES``,
2. uncomment the ``_register_all()`` call at the bottom,
3. insert the promoted names into ``registry._PRIORITY`` (window
   placement per COVERAGE.md §window-plan).

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


def devices() -> dict:
    """name -> (query_fn, oracle_sql) for every banked device."""
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


def _register_all() -> None:
    """Apply @query to every banked device (promotion step 2)."""
    from ..registry import query

    for name, (fn, oracle) in devices().items():
        query(name, oracle=oracle)(fn)


# promotion step 2 — uncomment when this module joins _QUERY_MODULES:
# _register_all()
