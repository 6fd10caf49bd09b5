"""The reference's non-game example pipelines, re-expressed.

``sdks/python/apache_beam/examples/`` beyond the game suite
(queries/game.py): wordcount.py (the hello-world, also runnable as
``examples/wordcount.py``), complete/autocomplete.py (top-k completions
per prefix), complete/top_wikipedia_sessions.py (longest user sessions
per 30-day window), cookbook/mergecontacts.py (3-way CoGroupByKey
merge), complete/estimate_pi.py (Monte-Carlo pi — made exact here by
swapping ``random.uniform`` for a deterministic md5-derived
low-discrepancy stream both engines replay bit-identically), and
complete/juliaset/ (escape-time fractal — made exact with fixed-point
integer arithmetic; the 100-step iteration is a single Spark
``aggregate()`` fold and an unrolled 100-CTE chain in the oracle, the
same device as the k-means/BPE-learn oracles). tfidf.py already has a
gate in queries/dataops.py; distribopt is a scipy demo outside the
data-engine surface; the remaining cookbook entries are either covered
by existing gates (multiple_output_pardo -> pardo_tagged_outputs,
filters -> core_elementwise_chain, custom_ptransform -> the PTransform
machinery everywhere) or need external services (bigquery_*,
datastore_*, bigtableio).

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


@query(
    "ex_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def ex_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/wordcount.py — Beam's hello-world (read lines, split
    into words, ``Count.PerElement``, format). The word regex is the
    repo-wide ``[a-z]+`` over lower-cased text so both engines tokenize
    identically (the reference uses ``[A-Za-z']+``). The runnable
    script twin with file IO and the formatted ``word: count`` output
    lines is examples/wordcount.py; this gate pins the counting
    pipeline itself.

    Scale shape: the explode is map-side (no shuffle), the count is one
    hash-partial + final HashAggregate pair over vocabulary-sized
    state — at 100 TB the shuffle carries one row per (partition,
    word), bounded by vocabulary, not corpus size."""
    return (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ex_estimate_pi",
    oracle="""
    WITH pts AS (
      SELECT ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 7))::BIGINT AS x,
             ('0x' || substr(md5(CAST(i AS VARCHAR)), 9, 7))::BIGINT AS y
      FROM range(250000) t(i)),
    agg AS (
      SELECT count(*) AS n_points,
             CAST(sum(CASE WHEN x*x + y*y <= 72057594037927936
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
      FROM pts)
    SELECT n_points, n_inside,
           (4000000 * n_inside) // n_points AS pi_micro
    FROM agg
    """,
)
def ex_estimate_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/complete/estimate_pi.py (run_trials + combine_results):
    throw points at the unit square, count the quarter-circle hits,
    estimate pi = 4 * inside / total. The reference draws
    ``random.uniform`` floats — nondeterministic by construction — so
    this gate replaces the RNG with a deterministic stream both engines
    compute bit-identically: point i = (md5(i)[0:7], md5(i)[8:7]) as
    28-bit integers in [0, 2^28), hit iff x^2 + y^2 <= 2^56 (integer
    arithmetic, fits int64). The estimate is emitted in integer
    micro-units via integer division (Spark ``div`` / DuckDB ``//``) —
    the repo's ratio-output device. 250k points land pi_micro within
    ~2e-3 of pi, same accuracy contract the reference's test asserts
    (estimate_pi_test.py: |pi - 3.141592| < 0.02).

    Scale shape: embarrassingly parallel map over ``range`` (Spark's
    range source splits evenly across executors), one partial+final
    aggregate pair; zero shuffle beyond the 1-row combine."""
    pts = spark.range(250_000).selectExpr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 7), 16, 10) AS BIGINT) AS x",
        "CAST(conv(substring(md5(CAST(id AS STRING)), 9, 7), 16, 10) AS BIGINT) AS y",
    )
    return pts.selectExpr(
        "count(*) AS n_points",
        "CAST(sum(CASE WHEN x*x + y*y <= 72057594037927936 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_inside",
    ).selectExpr(
        "n_points",
        "n_inside",
        "(4000000 * n_inside) div n_points AS pi_micro",
    )


# Julia-set fixed-point constants: scale S = 2^20; c = -.62772 + .42193i
# (juliaset.py:20) becomes (round(-.62772 * S), round(.42193 * S)); the
# escape test |z|^2 > 2.0 (juliaset.py:40) becomes > 2 * S^2.
_JULIA_N = 64
_JULIA_CR = -658211
_JULIA_CI = 442426
_JULIA_ESC = 2 * (1 << 20) * (1 << 20)


def _julia_oracle() -> str:
    """Unrolled 100-CTE DuckDB oracle for the julia-set escape loop.

    One CTE per iteration — the chained-CTE device the k-means and
    BPE-learn oracles use. (A ``list_reduce`` fold would be the natural
    dual of Spark's ``aggregate()``, but DuckDB 1.0's list_reduce
    evaluates struct-accumulator fields sequentially IN PLACE — a later
    field's expression sees an earlier field's NEW value — which
    silently corrupts any recurrence with cross-field dependencies like
    z^2's (zr, zi) rotation. The unrolled CTE form reads every
    right-hand side from the previous step's row, so it cannot alias.)
    """
    n, esc, cr, ci = _JULIA_N, _JULIA_ESC, _JULIA_CR, _JULIA_CI
    ctes = [
        f"""s0 AS (
      SELECT (i // {n})::BIGINT AS px, (i % {n})::BIGINT AS py,
             ((2 * (i // {n}) * 1048576) // {n} - 1048576)::BIGINT AS zr,
             ((2 * (i % {n}) * 1048576) // {n} - 1048576)::BIGINT AS zi,
             0::BIGINT AS upd, false AS done
      FROM range({n * n}) t(i))"""
    ]
    for k in range(1, 101):
        ctes.append(
            f"""s{k} AS (
      SELECT px, py,
        CASE WHEN done OR zr*zr + zi*zi > {esc} THEN zr
             ELSE ((zr*zr - zi*zi) >> 20) + ({cr}) END AS zr,
        CASE WHEN done OR zr*zr + zi*zi > {esc} THEN zi
             ELSE ((2*zr*zi) >> 20) + ({ci}) END AS zi,
        CASE WHEN done OR zr*zr + zi*zi > {esc} THEN upd ELSE upd + 1 END AS upd,
        (done OR zr*zr + zi*zi > {esc}) AS done
      FROM s{k - 1})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT px, py, CASE WHEN done THEN upd ELSE 99::BIGINT END AS it FROM s100"
    )


@query("ex_juliaset", oracle=_julia_oracle())
def ex_juliaset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/complete/juliaset/juliaset/juliaset.py
    (get_julia_set_point_color): escape-time iteration of
    f(z) = z^2 + c with c = -.62772 + .42193i over an NxN pixel grid
    mapped to [-1, 1]^2, max 100 iterations, escape when |z|^2 > 2;
    emits (x, y, iterations) per pixel exactly like the reference's
    coordinate output. Floating-point escape loops are not
    cross-engine-exact, so the dynamics run in 2^20 fixed-point integer
    arithmetic: multiply, subtract, arithmetic-right-shift — identical
    on both engines (Spark ``shiftright`` and DuckDB ``>>`` both floor
    on negatives; verified, not assumed). Grid is 64x64 (the
    reference's --grid_size default is 1000; the recurrence per pixel
    is identical).

    Spark-first shape: the whole 100-step loop is ONE ``aggregate()``
    higher-order-function fold per row — a single codegen'd projection,
    zero shuffle, no Python in the plan; at 100 TB of pixels this is a
    pure map stage. The oracle unrolls the same loop into 100 chained
    CTEs (see _julia_oracle for why list_reduce is unusable here)."""
    n, esc, cr, ci = _JULIA_N, _JULIA_ESC, _JULIA_CR, _JULIA_CI
    grid = spark.range(n * n).selectExpr(
        f"CAST(id DIV {n} AS BIGINT) AS px", f"CAST(id % {n} AS BIGINT) AS py"
    )
    fold = f"""
    aggregate(sequence(1, 100),
      named_struct('zr', (2L * px * 1048576L) DIV {n} - 1048576L,
                   'zi', (2L * py * 1048576L) DIV {n} - 1048576L,
                   'upd', 0L, 'done', false),
      (s, k) -> CASE
        WHEN s.done THEN s
        WHEN s.zr*s.zr + s.zi*s.zi > {esc}L THEN
          named_struct('zr', s.zr, 'zi', s.zi, 'upd', s.upd, 'done', true)
        ELSE
          named_struct('zr', shiftright(s.zr*s.zr - s.zi*s.zi, 20) + ({cr}L),
                       'zi', shiftright(2*s.zr*s.zi, 20) + ({ci}L),
                       'upd', s.upd + 1L, 'done', false)
      END) AS s
    """
    return grid.selectExpr("px", "py", fold).selectExpr(
        "px", "py", "CASE WHEN s.done THEN s.upd ELSE 99L END AS it"
    )
