"""SQL MATCH_RECOGNIZE end-to-end, batch AND streaming, on this engine
(reference surface: Beam SQL's ``BeamMatchRel`` —
``sdks/java/extensions/sql/.../impl/rel/BeamMatchRel.java`` +
``BeamMatchRelTest.java``): one query text, two execution modes.

The query finds "recovery" sequences per user over the events table: a
signup anchor, one-to-eight clicks priced BELOW the anchor (a
cross-symbol DEFINE — ``D.value < LAST(S.value)`` — the match-state-
dependent predicate the SQL standard's V-pattern chains need), closed by
a purchase ABOVE it, and reports the span plus an arithmetic expression
measure.

Usage:
    python examples/match_recognize_sql.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = """
SELECT user_id, match_number, start_event, end_event, n_clicks, gain
FROM {table} MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY event_id
  MEASURES FIRST(S.event_id) AS start_event,
           LAST(R.event_id)  AS end_event,
           COUNT(D.*)        AS n_clicks,
           LAST(R.event_id) - FIRST(S.event_id) AS gain
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (S D{{1,8}} R)
  DEFINE S AS event_type = 'signup',
         D AS event_type = 'click' AND D.value < LAST(S.value),
         R AS event_type = 'purchase' AND R.value > LAST(S.value)
)
"""


def main() -> None:
    from incubator_beam_spark.plans.sqlfront import run_sql, run_sql_stream
    from incubator_beam_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-match-recognize")

    # --- batch: the events table as a temp view -------------------------
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    batch = run_sql(spark, QUERY.format(table="events"))
    print("batch matches:")
    batch.show(10, truncate=False)

    # --- streaming: the SAME query text over a file stream --------------
    schema = spark.table("events").schema
    # Spark's file stream source wants a DIRECTORY; stage the table file
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="mr_sql_demo_")
    shutil.copy(f"{sf_dir}/events.parquet", stage)
    stream = spark.readStream.schema(schema).parquet(stage)
    stream.createOrReplaceTempView("events_stream")
    out = run_sql_stream(spark, QUERY.format(table="events_stream"))
    q = (
        out.writeStream.format("memory")
        .queryName("mr_stream_demo")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_stream = spark.table("mr_stream_demo").count()
    n_batch = batch.count()
    print(f"streaming matches: {n_stream} (batch found {n_batch})")
    # the stream holds matches that COULD still extend past the final
    # micro-batch (hold-until-decided), so stream <= batch on a finite
    # replay — every emitted match is final and also present in batch
    assert n_stream <= n_batch

    # --- streaming ALL ROWS + CLASSIFIER (r8 surface) --------------------
    # the same clause in per-row mode: every matched input row comes back
    # with the symbol that matched it and RUNNING measures
    all_rows_q = QUERY.replace("ONE ROW PER MATCH", "ALL ROWS PER MATCH").replace(
        "SELECT user_id, match_number,",
        "SELECT user_id, match_number, classifier,",
    )
    out2 = run_sql_stream(spark, all_rows_q.format(table="events_stream"))
    q2 = (
        out2.writeStream.format("memory")
        .queryName("mr_stream_rows_demo")
        .outputMode("append")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    print("streaming ALL ROWS sample (per matched row, with classifier):")
    spark.table("mr_stream_rows_demo").show(6, truncate=False)

    # --- streaming OVERLAPPING matches (late-r8 surface) -----------------
    # AFTER MATCH SKIP TO NEXT ROW restarts one past each match start, so
    # a run of k consecutive high-value events yields k-1 matches — the
    # sliding-pair alert shape (every emitted match is still final under
    # the stability probe; overlap never re-emits from dropped state)
    overlap_q = """
    SELECT user_id, match_number, e1, e2
    FROM {table} MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY event_id
      MEASURES FIRST(H.event_id) AS e1, LAST(H.event_id) AS e2
      ONE ROW PER MATCH
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (H H)
      DEFINE H AS H.value >= 100
    )
    """
    out3 = run_sql_stream(spark, overlap_q.format(table="events_stream"))
    q3 = (
        out3.writeStream.format("memory")
        .queryName("mr_stream_overlap_demo")
        .outputMode("append")
        .start()
    )
    q3.processAllAvailable()
    q3.stop()
    print("streaming overlapping high-pair alerts (SKIP TO NEXT ROW):")
    spark.table("mr_stream_overlap_demo").show(6, truncate=False)
    shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
