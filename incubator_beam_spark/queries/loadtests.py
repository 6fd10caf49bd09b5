"""Load-test pipelines over the synthetic source (reference
``sdks/python/apache_beam/testing/load_tests/``: GroupByKey / CoGroupByKey
/ ParDo / Combine / SideInput load tests parameterized by
``SyntheticOptions`` — see BASELINE.md "Load-test suites").

The reference runs these for throughput numbers on synthetic data; here
each is ALSO a correctness gate: the generator is md5-deterministic
(``sources/synthetic.py``), so a DuckDB oracle can regenerate the stream
and the exact expected output. 100k records, 20% of traffic on 2 hot
keys — the skew profile exercises AQE skew handling while staying exact.

Scale notes: every pipeline below is shaped for 100 TB — generation is a
splittable zero-IO range scan; GBK/Combine shuffle (key, partial-agg)
only; the side-input join broadcasts the 100-row dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.synthetic import synthetic_bounded

N = 100_000

# DuckDB replica of synthetic_bounded(N, num_keys=100, hot_key_fraction=0.2,
# num_hot_keys=2): key_id per record + the record's numeric payload (first
# 8 hex chars of the value hash as an int — "vnum").
_SYN = f"""
  SELECT id,
         CASE WHEN b < 200000 THEN b % 2 ELSE 2 + (b % 98) END AS key_id,
         ('0x' || substr(md5('syn|val|' || CAST(id AS VARCHAR)), 1, 8))::BIGINT
           AS vnum,
         substr(repeat(md5('syn|val|' || CAST(id AS VARCHAR)), 1), 1, 16) AS value
  FROM (SELECT id,
               ('0x' || substr(md5('syn|k|' || CAST(id AS VARCHAR)), 1, 8))::BIGINT
                 % 1000000 AS b
        FROM (SELECT unnest(generate_series(0, {N - 1}))::BIGINT AS id))
"""


def _records(spark: SparkSession) -> DataFrame:
    df = synthetic_bounded(spark, N, num_keys=100, hot_key_fraction=0.2, num_hot_keys=2)
    vnum = F.conv(F.substring("value", 1, 8), 16, 10).cast("long")
    return df.select("id", "key_id", "value", vnum.alias("vnum"))


@query(
    "load_gbk",
    oracle=f"""
    WITH recs AS ({_SYN})
    SELECT key_id, count(*) AS n, min(id) AS min_id,
           CAST(sum(vnum) AS BIGINT) AS sum_v
    FROM recs GROUP BY key_id
    """,
)
def load_gbk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupByKey load test (reference load_tests/group_by_key_test.py):
    hot-key-skewed synthetic stream -> GBK -> per-key aggregates. Partial
    aggregation makes the hot keys a non-issue (map-side combine)."""
    return _records(spark).groupBy("key_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("min_id"),
        F.sum("vnum").alias("sum_v"),
    )


@query(
    "load_cogbk",
    oracle=f"""
    WITH a AS (SELECT key_id, count(*) AS n_a FROM ({_SYN}) GROUP BY key_id),
    b AS (SELECT key_id % 50 AS key_id, count(*) AS n_b FROM ({_SYN}) GROUP BY key_id % 50)
    SELECT coalesce(a.key_id, b.key_id) AS key_id,
           coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
    FROM a FULL OUTER JOIN b ON a.key_id = b.key_id
    """,
)
def load_cogbk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CoGroupByKey load test (load_tests/co_group_by_key_test.py): two
    keyed streams (the second folded onto 50 keys) co-grouped; both
    sides pre-aggregate before the join so the shuffle carries counts,
    not records."""
    r = _records(spark)
    a = r.groupBy("key_id").agg(F.count(F.lit(1)).alias("n_a"))
    b = (
        r.select((F.col("key_id") % 50).alias("key_id"))
        .groupBy("key_id")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, "key_id", "full_outer")
        .select(
            "key_id",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )


@query(
    "load_pardo",
    oracle=f"""
    WITH recs AS ({_SYN})
    SELECT id, substr(md5(md5(value) || CAST(key_id AS VARCHAR)), 1, 8) AS out
    FROM recs
    """,
)
def load_pardo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ParDo load test (load_tests/pardo_test.py, counter-free shape):
    a chained per-record transform stage — two hash stages fused into
    one zero-shuffle projection by Catalyst (the reference runs N
    sequential ParDos; whole-stage codegen collapses the chain)."""
    r = _records(spark)
    out = F.substring(
        F.md5(F.concat(F.md5(F.col("value")), F.col("key_id").cast("string"))), 1, 8
    )
    return r.select("id", out.alias("out"))


@query(
    "load_combine",
    oracle=f"""
    WITH recs AS ({_SYN})
    SELECT key_id, round(avg(vnum), 4) AS mean_v, max(vnum) AS max_v
    FROM recs GROUP BY key_id
    """,
)
def load_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combine load test (load_tests/combine_test.py): per-key mean+max —
    both lift to partial accumulators; the shuffle carries (sum, count,
    max) triples regardless of skew."""
    return _records(spark).groupBy("key_id").agg(
        F.round(F.avg("vnum"), 4).alias("mean_v"),
        F.max("vnum").alias("max_v"),
    )


@query(
    "load_sideinput",
    oracle=f"""
    WITH recs AS ({_SYN}),
    dim AS (SELECT DISTINCT key_id,
                   substr(md5('dim|' || CAST(key_id AS VARCHAR)), 1, 8) AS label
            FROM recs)
    SELECT label, count(*) AS n
    FROM recs JOIN dim USING (key_id) GROUP BY label
    """,
)
def load_sideinput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SideInput load test (load_tests/sideinput_test.py): enrich every
    record from a small dim — the dim (<=100 rows) is broadcast, the
    stream is never shuffled for the join."""
    r = _records(spark)
    dim = r.select("key_id").distinct().select(
        "key_id",
        F.substring(F.md5(F.concat(F.lit("dim|"), F.col("key_id").cast("string"))), 1, 8)
          .alias("label"),
    )
    return (
        r.join(F.broadcast(dim), "key_id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_skew_salted",
    oracle=f"""
    WITH recs AS ({_SYN}),
    dim AS (SELECT DISTINCT key_id,
                   substr(md5('dim|' || CAST(key_id AS VARCHAR)), 1, 8) AS label
            FROM recs)
    SELECT label, count(*) AS n, CAST(sum(vnum) AS BIGINT) AS sum_v
    FROM recs JOIN dim USING (key_id) GROUP BY label
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join under extreme skew: the synthetic stream puts
    20% of all rows on 2 hot keys, and the dim side is hinted merge (no
    broadcast escape hatch) — unsalted, two reducers would own 20% of
    the data. ``salted_join`` spreads each hot key over 8 reducers
    (deterministic xxhash64 salt scan-side on the big side, 8x explode
    of the 100-row dim); the oracle is the PLAIN join — proving salting
    changes the schedule, never the result."""
    from ..dataops.joins import salted_join

    r = _records(spark)
    dim = r.select("key_id").distinct().select(
        "key_id",
        F.substring(F.md5(F.concat(F.lit("dim|"), F.col("key_id").cast("string"))), 1, 8)
          .alias("label"),
    )
    joined = salted_join(r, dim.hint("merge"), on="key_id", n_salts=8)
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vnum").cast("long").alias("sum_v"),
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT s.s_nationkey AS s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l.l_quantity), 4) AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey < 5
    GROUP BY s.s_nationkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered shuffle join (the runtime-filter pattern Spark's
    `InjectRuntimeFilter` rule applies when statistics justify it;
    first-class in ``dataops/joins.py`` so the plan guarantees it):
    lineitem joins the nation<5 supplier subset, dim hinted merge (no
    broadcast escape), and every fact row is tested scan-side against a
    2^20-bit bitmap built distributedly from the dim keys — non-matching
    rows never reach the exchange. The oracle is the PLAIN join: the
    Bloom stage may pass false positives (the real join removes them)
    but never drops a match, so the result is exactly the unfiltered
    join's."""
    from ..catalog import table
    from ..dataops.joins import bloom_prefilter_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey", "s_nationkey")
    )
    joined = bloom_prefilter_join(li, sup.hint("merge"), on="s_suppkey")
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )
