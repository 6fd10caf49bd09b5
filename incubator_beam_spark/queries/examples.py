"""The reference's non-game example pipelines, re-expressed.

``sdks/python/apache_beam/examples/`` beyond the game suite
(queries/game.py): complete/autocomplete.py (top-k completions per
prefix), complete/top_wikipedia_sessions.py (longest user sessions per
30-day window), and cookbook/mergecontacts.py (3-way CoGroupByKey
merge). tfidf.py already has a gate in queries/dataops.py; wordcount
variants are examples/wordcount.py here; estimate_pi.py is a
Monte-Carlo demo whose value is nondeterministic by construction (its
invariant — pi to ~2 digits at large n — is not a fixture-scale gate);
juliaset and distribopt are image/scipy demos outside the data-engine
surface; the remaining cookbook entries are either covered by existing
gates (multiple_output_pardo -> pardo_tagged_outputs, filters ->
core_elementwise_chain, custom_ptransform -> the PTransform machinery
everywhere) or need external services (bigquery_*, datastore_*,
bigtableio).

Every gate here is exact: counts are integers, rankings carry full
deterministic tie-breaks, group iterables are canonicalized sorted,
and the oracle recomputes the same pipeline in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .. import core
from ..catalog import table
from ..registry import query


@query(
    "ex_autocomplete",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents),
    counts AS (SELECT word, count(*) AS n FROM words GROUP BY word),
    prefixes AS (
      SELECT unnest(list_transform(range(1, len(word) + 1),
                                   k -> substr(word, 1, k))) AS prefix,
             word, n
      FROM counts),
    ranked AS (
      SELECT prefix, word, n,
             row_number() OVER (PARTITION BY prefix
                                ORDER BY n DESC, word DESC) AS rnk
      FROM prefixes)
    SELECT prefix, rnk, word, n FROM ranked WHERE rnk <= 5
    """,
)
def ex_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/complete/autocomplete.py (TopPerPrefix): per prefix, the
    top-5 most common words, ranked by (count, word) tuple order exactly
    as Beam's ``Top.LargestPerKey`` does (count DESC, then word DESC on
    ties — (count, word) pairs are unique per prefix so the ranking is
    total). The reference's word regex ``[A-Za-z']+`` is narrowed to
    ``[a-z]+`` over lower-cased text so both engines tokenize
    identically.

    Scale shape — the pipeline's own key insight, preserved: prefixes
    explode AFTER ``Count.PerElement``, so the fan-out is VOCABULARY x
    avg-word-length, not corpus-sized; at 100 TB the heavy shuffle is
    the word count (map-side combined), and the prefix ranking
    shuffles a table bounded by the lexicon, independent of corpus
    row count."""
    words = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    prefixes = counts.select(
        F.explode(
            F.expr("transform(sequence(1, length(word)), k -> substring(word, 1, k))")
        ).alias("prefix"),
        "word",
        "n",
    )
    w = W.partitionBy("prefix").orderBy(F.desc("n"), F.desc("word"))
    return (
        prefixes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("prefix", "rnk", "word", "n")
    )


@query(
    "ex_top_wikipedia_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) >= 3600
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    per_session AS (
      SELECT user_id,
             floor(epoch(min(ts)))::BIGINT AS session_start,
             count(*) AS n_edits
      FROM sess GROUP BY user_id, sid),
    windowed AS (
      SELECT (session_start // 2592000) * 2592000 AS month_start,
             user_id, session_start, n_edits
      FROM per_session),
    ranked AS (
      SELECT month_start, user_id, session_start, n_edits,
             row_number() OVER (PARTITION BY month_start
                                ORDER BY n_edits DESC, user_id,
                                         session_start) AS rnk
      FROM windowed)
    SELECT month_start, rnk, user_id, session_start, n_edits
    FROM ranked WHERE rnk <= 10
    """,
)
def ex_top_wikipedia_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/complete/top_wikipedia_sessions.py (ComputeTopSessions):
    sessionize each user's edits with a 1-hour gap (``ComputeSessions``:
    Sessions window + Count.PerElement), assign each session to the
    30-day fixed window containing its START (the reference keys months
    by the window the session's timestamp lands in), and emit the top
    10 sessions per window by edit count. The reference's
    ``TopCombineFn(key=count)`` is tie-ambiguous; the gate totalizes
    the order with (n_edits DESC, user_id, session_start) so both
    engines rank identically — same device as the game suite's
    leaderboards. The events table plays the edit log (user_id =
    contributor, ts = edit time); the 1% user sampling flag is omitted
    (sampling gates live in doc_stratified_bounds).

    Scale shape: one shuffle on user for the islands pass, then the
    per-window top-10 is a rank over a SESSION-count-sized table —
    WindowExec over aggregate-sized input (SCALE.md rule 6), never over
    raw edits."""
    e = table(spark, sf_dir, "events")
    ts_s = F.col("ts").cast("double")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(ts_s).over(w)
    sess = (
        e.select("user_id", "ts", "event_id")
        .withColumn(
            "brk", F.when(prev.isNull() | ((ts_s - prev) >= 3600), 1).otherwise(0)
        )
        .withColumn("sid", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.floor(F.min(ts_s)).cast("long").alias("session_start"),
        F.count(F.lit(1)).alias("n_edits"),
    )
    month = (F.col("session_start") / 2592000).cast("long") * 2592000
    rank_w = W.partitionBy("month_start").orderBy(
        F.desc("n_edits"), "user_id", "session_start"
    )
    return (
        per_session.withColumn("month_start", month)
        .withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= 10)
        .select("month_start", "rnk", "user_id", "session_start", "n_edits")
    )


@query(
    "ex_mergecontacts",
    oracle="""
    WITH em AS (
      SELECT user_id,
             string_agg(CAST(event_id AS VARCHAR), ','
                        ORDER BY CAST(event_id AS VARCHAR)) AS emails
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    ph AS (
      SELECT user_id,
             string_agg(CAST(event_id AS VARCHAR), ','
                        ORDER BY CAST(event_id AS VARCHAR)) AS phones
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    ad AS (
      SELECT user_id, min(CAST(event_id AS VARCHAR)) AS addr
      FROM events WHERE event_type = 'view' GROUP BY user_id)
    SELECT user_id AS name,
           '"' || user_id || '"' || chr(9)
             || '"' || coalesce(emails, '') || '"' || chr(9)
             || '"' || coalesce(phones, '') || '"' || chr(9)
             || '"' || coalesce(addr, '') || '"' AS tsv,
           emails IS NULL AS no_email,
           phones IS NULL AS no_phone,
           addr IS NULL AS no_address
    FROM em FULL JOIN ph USING (user_id) FULL JOIN ad USING (user_id)
    """,
)
def ex_mergecontacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/cookbook/mergecontacts.py: three keyed "databases"
    (emails / phones / snailmail addresses per name) merged with a
    3-way ``CoGroupByKey`` (the cookbook's non-linear-pipeline demo),
    formatted to the reference's quoted-TSV line ("name"<TAB>"emails
    CSV"<TAB>"phones CSV"<TAB>"first address"), plus the three
    per-contact stats flags its stats branch counts. The fixture's
    event types play the databases (signup=email, click=phone,
    view=address; event_id as the contact string). Beam's group
    iterables are unordered, so CSVs are canonicalized sorted and
    "first address" is the sorted-first — the repo-wide determinism
    convention; the reference's quote/backslash escaping steps are
    identity on numeric ids. Runs through the REAL core.CoGroupByKey
    (per-side map-side-combined collect_list + one full-outer join on
    the key — each side aggregates BEFORE the shuffle, so the join
    moves one row per (name, side), not one per contact)."""
    p = core.Pipeline(spark)
    e = table(spark, sf_dir, "events")

    def db(event_type: str) -> core.PCollection:
        return core.PCollection(
            e.filter(F.col("event_type") == event_type).select(
                F.col("user_id").alias("key"),
                F.col("event_id").cast("string").alias("value"),
            ),
            p,
        )

    grouped = core.CoGroupByKey(
        email=db("signup"), phone=db("click"), snailmail=db("view")
    ).expand(None)
    csv = lambda c: F.array_join(F.array_sort(c), ",")  # noqa: E731
    first = F.coalesce(F.element_at(F.array_sort("snailmail"), 1), F.lit(""))
    q = F.lit('"')
    tab = F.lit("\t")
    return grouped.df.select(
        F.col("key").alias("name"),
        F.concat(
            q, F.col("key").cast("string"), q, tab,
            q, csv("email"), q, tab,
            q, csv("phone"), q, tab,
            q, first, q,
        ).alias("tsv"),
        (F.size("email") == 0).alias("no_email"),
        (F.size("phone") == 0).alias("no_phone"),
        (F.size("snailmail") == 0).alias("no_address"),
    )
