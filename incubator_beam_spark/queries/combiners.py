"""Combiner/aggregation library + SQL analytic (OVER) functions.

Reference surface: ``sdks/python/apache_beam/transforms/combiners.py``
(Count/Mean/Top/Sample/ToList/ToSet/Latest/TupleCombineFn), ``stats.py``
(ApproximateUnique/ApproximateQuantiles), the SQL UDAFs
(``impl/udaf/{ArrayAgg,StringAgg}.java``, ``impl/transform/agg/*``) and
``BeamWindowRel``/``BeamBuiltinAnalyticFunctions.java`` (SURVEY.md §2.4,
§2.5, §2.8).

All lower to native Spark aggregates/window functions — single shuffle on
the grouping key, partial aggregation map-side. Collected lists are always
``sort_array``ed so results are deterministic (Beam's iterables are
unordered; we canonicalize instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "agg_count_per_element",
    oracle="""
    SELECT event_type AS element, count(*) AS n FROM events GROUP BY event_type
    """,
)
def agg_count_per_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count.PerElement (reference ``combiners.py:119``)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("element"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_mean_per_key",
    oracle="""
    SELECT event_type, round(avg(value), 4) AS mean_value FROM events GROUP BY event_type
    """,
)
def agg_mean_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean.PerKey (reference ``combiners.py:72``)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("mean_value"))
    )


@query(
    "agg_tuple_combine",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           round(avg(l_extendedprice), 4) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_tuple_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TupleCombineFn (reference ``combiners.py:641``): N combiners fused in
    one aggregation pass by Catalyst."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


@query(
    "agg_top_per_key_array",
    oracle="""
    SELECT event_type,
           array_to_string(
             list_transform((list_sort(array_agg(value), 'DESC'))[1:5],
                            x -> CAST(CAST(round(x * 100) AS BIGINT) AS VARCHAR)),
             ',') AS top5
    FROM events GROUP BY event_type
    """,
)
def agg_top_per_key_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top.PerKey as a bounded array (reference ``combiners.py:167``,
    ``TopCombineFn:386``): bundle-local heap + merge becomes
    sort_array(collect_list)[:n] — Catalyst keeps the collect grouped.

    Output is rendered as a fixed-point CSV string (round(x*100) as long)
    so the driver's canonicalizer — which cannot sort list cells — hashes
    a scalar identically on both engines."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_list("value"), asc=False), 1, 5),
                    lambda x: F.round(x * 100).cast("long").cast("string"),
                ),
            ).alias("top5")
        )
    )


@query(
    "agg_latest_per_key",
    oracle="""
    SELECT user_id, arg_max(value, ts) AS latest_value, max(ts) AS latest_ts
    FROM events GROUP BY user_id
    """,
)
def agg_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest.PerKey (reference ``combiners.py:842``) via max_by."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("latest_value"),
            F.max("ts").alias("latest_ts"),
        )
    )


@query(
    "agg_to_list_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(
             list_transform(list_sort(array_agg(l_quantity)),
                            x -> CAST(CAST(round(x * 100) AS BIGINT) AS VARCHAR)),
             ',') AS quantities
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_to_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ToList / GroupByKey iterable (reference ``combiners.py:673``),
    canonicalized by sorting and rendered as a fixed-point CSV string
    (list cells crash the driver's canonical sort)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("l_quantity")),
                    lambda x: F.round(x * 100).cast("long").cast("string"),
                ),
            ).alias("quantities")
        )
    )


@query(
    "agg_to_set",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list_distinct(array_agg(l_returnflag))), ',') AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_to_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ToSet (reference ``combiners.py:738``), rendered as a sorted CSV
    string so the driver canonicalizer hashes scalars."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias("flags"))
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT c_nationkey, string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey) AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG (reference ``impl/udaf/StringAgg.java``) with canonical
    order."""
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("c_mktsegment", "c_custkey"))
                    ),
                    lambda s: s.c_mktsegment,
                ),
                "|",
            ).alias("segments")
        )
    )


@query(
    "agg_count_if_any_value",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           any_value(event_type) AS sample_type
    FROM events GROUP BY event_type
    """,
)
def agg_count_if_any_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT_IF + ANY_VALUE (reference ``impl/transform/agg/CountIf.java``,
    ``BeamBuiltinAggregations.java:58-72``); any_value applied to the group
    key so it is deterministic."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).alias("n_big"),
            F.any_value("event_type").alias("sample_type"),
        )
    )


@query(
    "agg_variance_covariance",
    oracle="""
    SELECT l_returnflag,
           round(var_pop(l_quantity), 6)               AS vpop,
           round(var_samp(l_quantity), 6)              AS vsamp,
           round(stddev_pop(l_quantity), 6)            AS sdpop,
           round(covar_pop(l_quantity, l_discount), 6) AS cvpop,
           round(covar_samp(l_quantity, l_discount), 6) AS cvsamp,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_variance_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAR_POP/VAR_SAMP/COVAR_POP/COVAR_SAMP (reference
    ``impl/transform/agg/{VarianceFn,CovarianceFn}.java``) + CORR."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.var_pop("l_quantity"), 6).alias("vpop"),
        F.round(F.var_samp("l_quantity"), 6).alias("vsamp"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdpop"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("cvpop"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cvsamp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
    )


@query(
    "agg_bit_xor",
    oracle="SELECT l_returnflag, bit_xor(l_orderkey) AS x FROM lineitem GROUP BY l_returnflag",
)
def agg_bit_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT_XOR (reference ``BeamBuiltinAggregations.java:58-72``)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.bit_xor("l_orderkey").alias("x"))
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation."""
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query("agg_approx_count_distinct")
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproximateUnique (reference ``transforms/stats.py:90``) →
    approx_count_distinct (HLL++). No oracle: sketch estimates are
    engine-specific; accuracy asserted in tests instead."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"))
    )


@query("agg_approx_quantiles")
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproximateQuantiles (reference ``transforms/stats.py:284``) →
    percentile_approx. No oracle: buffer-based estimates are
    engine-specific; accuracy asserted in tests."""
    # rendered to JSON: the driver canonicalizer cannot hash array cells
    return table(spark, sf_dir, "lineitem").agg(
        F.to_json(
            F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000)
        ).alias("quartiles")
    )


@query(
    "agg_approx_quantiles_bounds",
    oracle="""
    SELECT q_bp, TRUE AS within_bounds,
           (SELECT count(*) FROM lineitem) AS n
    FROM (VALUES (2500), (5000), (7500), (9000)) t(q_bp)
    """,
)
def agg_approx_quantiles_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable accuracy gate for ApproximateQuantiles
    (``stats.py:284`` -> percentile_approx): the sketch value itself is
    engine-specific, but its GK error GUARANTEE is not — with
    accuracy=1000 the rank of the returned value must be within
    n/1000 of the target rank. The query computes the approximate
    quantiles, then the EXACT CDF position of each returned value with
    a second pass over the data (4-row broadcast join + conditional
    count), and emits one boolean per quantile. The oracle is the
    guarantee itself (all TRUE): a sketch regression flips a row and
    the value-hash goes red. Scale shape: one combiner-lifted sketch
    agg + one broadcast join — no extra shuffle of data rows."""
    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = [0.25, 0.5, 0.75, 0.9]
    quant = (
        li.agg(
            F.percentile_approx("l_extendedprice", qs, 1000).alias("vs"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.posexplode("vs").alias("i", "v"),
            "n",
        )
        .select(
            (F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("i") + 1)).alias("q"),
            "v",
            "n",
        )
    )
    joined = li.crossJoin(F.broadcast(quant))
    return (
        joined.groupBy("q", "n")
        .agg(
            (
                F.sum((F.col("l_extendedprice") <= F.col("v")).cast("long"))
                / F.col("n")
            ).alias("frac")
        )
        .select(
            F.round(F.col("q") * 10000).cast("int").alias("q_bp"),
            # GK rank-error bound 1/accuracy, plus 1-rank slack for ties
            (
                F.abs(F.col("frac") - F.col("q"))
                <= (F.lit(1.0 / 1000) + F.lit(1.0) / F.col("n"))
            ).alias("within_bounds"),
            F.col("n"),
        )
    )


@query(
    "agg_approx_distinct_bounds",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_n, TRUE AS within_bounds
    FROM orders
    """,
)
def agg_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable accuracy gate for ApproximateUnique
    (``stats.py:90`` -> approx_count_distinct): the HLL++ estimate is
    engine-specific but its relative-standard-deviation guarantee is
    not. One pass computes both the sketch estimate (rsd=0.02) and the
    exact distinct count; the emitted boolean asserts the estimate sits
    within 5 standard deviations. The oracle is the guarantee (TRUE) +
    the exact count — a sketch regression flips the row."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct("o_custkey").alias("exact_n"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_n"),
    ).select(
        "exact_n",
        (
            F.abs(F.col("approx_n") - F.col("exact_n"))
            <= F.lit(5 * 0.02) * F.col("exact_n")
        ).alias("within_bounds"),
    )


@query(
    "agg_hll_bounds",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS exact_n, TRUE AS within_bounds
    FROM lineitem
    """,
)
def agg_hll_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the zetasketch HllCount surface
    (``hll_sketch_agg`` / ``hll_sketch_estimate``): build the sketch at
    lgConfigK=14 (rsd ~ 1.04/sqrt(2^14) ~ 0.8%), estimate, and assert
    the estimate within 6 standard deviations of the exact distinct
    count computed in the same plan. Mergeability (MergePartial) is
    covered by the partial/final split of the agg itself."""
    li = table(spark, sf_dir, "lineitem")
    rsd = 1.04 / (2**14) ** 0.5
    return li.agg(
        F.count_distinct("l_partkey").alias("exact_n"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").alias("approx_n"),
    ).select(
        "exact_n",
        (
            F.abs(F.col("approx_n") - F.col("exact_n"))
            <= F.lit(6 * rsd) * F.col("exact_n")
        ).alias("within_bounds"),
    )


@query("agg_sample_fixed")
def agg_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.FixedSizeGlobally (reference ``combiners.py:522``): uniform
    reservoir sample. No oracle (randomness is engine-specific); size and
    uniqueness asserted in tests."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.rand(42))
        .limit(100)
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# Analytic (OVER-clause) functions — BeamWindowRel (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "win_rank_functions",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           CAST(round(percent_rank() OVER w * 1e6) AS BIGINT) AS prank_ppm,
           CAST(round(cume_dist()    OVER w * 1e6) AS BIGINT) AS cdist_ppm
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER/RANK/DENSE_RANK/PERCENT_RANK (+NTILE/CUME_DIST, which the
    reference lacks) — ``BeamBuiltinAnalyticFunctions.java:41-47``."""
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        # parts-per-million integers: round(x*1e6) dodges engine-specific
        # rounding of doubles landing exactly on a decimal .5 boundary
        F.round(F.percent_rank().over(w) * 1e6).cast("long").alias("prank_ppm"),
        F.round(F.cume_dist().over(w) * 1e6).cast("long").alias("cdist_ppm"),
    )


@query(
    "win_lead_lag",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER w AS prev_total,
           lead(o_totalprice) OVER w AS next_total,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG over a deterministic per-key order."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tp = F.col("o_totalprice")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lag(tp).over(w).alias("prev_total"),
        F.lead(tp).over(w).alias("next_total"),
        F.round(tp - F.coalesce(F.lag(tp).over(w), tp), 2).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with ROWS frame + FIRST_VALUE/LAST_VALUE."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_total"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey")
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("last_order"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window bounds) — ``BeamWindowRel`` RANGE
    support."""
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 0)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_similar"),
    )


@query(
    "agg_hotkey_fanout",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 2) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_hotkey_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key combiner fanout (reference ``core.py:2194``,
    ``_CombinePerKeyWithHotKeyFanout``): two-level combine via key
    salting. lineitem has only 3 return flags — the canonical hot-key
    shape: a plain groupBy would route ~1/3 of ALL rows to each of 3
    reducers. Level 1 aggregates (key, salt-of-16) — 48 parallel partial
    groups; level 2 merges 16 tiny accumulators per key.

    Catalyst's partial aggregation already handles sum/count skew; the
    explicit fanout pattern is for accumulators whose merge is cheap but
    whose per-row add is expensive, and it is the building block the
    Beam-API CombinePerKey(fanout=) sugar lowers to. Results are
    identical to the unsalted aggregation — the oracle is the plain
    GROUP BY.
    """
    li = table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)).alias("salt"),
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_quantity").alias("pq"),
        F.sum("l_extendedprice").alias("pp"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pq"), 2).alias("sum_qty"),
        F.round(F.sum("pp") / F.sum("pn"), 2).alias("avg_price"),
    )


@query("agg_count_min_sketch")
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per group (reference sketching extension
    ``SketchFrequencies.java``): Spark's count_min_sketch aggregate.
    Rows-only check — the sketch is an opaque mergeable binary (the
    estimate path is exercised in tests)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("count_min_sketch(l_partkey, 0.01d, 0.95d, 42)").alias("cms")
    )


@query("agg_hll_sketch")
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketches (reference zetasketch ``HllCount.java``):
    hll_sketch_agg per group, hll_union across groups, estimate extract —
    the Init/MergePartial/Extract triple. Rows-only (sketch encodings are
    engine-specific; estimate accuracy asserted in tests)."""
    li = table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sketch")
    )
    return per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_parts_est")
    )


@query(
    "combine_lifted_geomean",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def combine_lifted_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python CombineFn (geometric mean) with runner-style
    combiner LIFTING (reference core.py:778 + translations.py:1093):
    phase 1 folds into per-partition accumulators in mapInPandas (map-
    side combine), the shuffle moves one ~50-byte pickled accumulator
    per (partition, key) — never the elements; phase 2 merges+extracts.
    The oracle is the closed-form exp(avg(ln(x)))."""
    import math

    from ..core import CombineFn, combine_per_key_lifted

    class GeoMean(CombineFn):
        def create_accumulator(self):
            return (0.0, 0)  # (sum of logs, count)

        def add_input(self, acc, v):
            return (acc[0] + math.log(float(v)), acc[1] + 1)

        def merge_accumulators(self, accs):
            return (sum(a[0] for a in accs), sum(a[1] for a in accs))

        def extract_output(self, acc):
            return round(math.exp(acc[0] / acc[1]), 4) if acc[1] else None

    e = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    from pyspark.sql import types as T

    return combine_per_key_lifted(
        e, "event_type", "value", GeoMean(), output_field="geo_mean",
        output_type=T.DoubleType(),
    )


@query(
    "agg_sample_deterministic",
    oracle="""
    WITH pri AS (SELECT o_orderkey, o_custkey,
                        md5('samp|' || CAST(o_orderkey AS VARCHAR)) AS p
                 FROM orders)
    SELECT o_orderkey, o_custkey FROM pri ORDER BY p LIMIT 100
    """,
)
def agg_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.FixedSizeGlobally, deterministic variant: md5-priority
    top-k — statistically a uniform sample (hash priorities are iid
    uniform) but reproducible across engines/runs, so it carries an
    EXACT oracle (the random variant agg_sample_fixed stays rows-only).
    Plan is TakeOrderedAndProject: per-partition top-100 then a 100-row
    merge — no global sort, no shuffle of the corpus; the scalable
    sample shape at 100 TB."""
    o = table(spark, sf_dir, "orders")
    pri = F.md5(F.concat(F.lit("samp|"), F.col("o_orderkey").cast("string")))
    return (
        o.select("o_orderkey", "o_custkey", pri.alias("p"))
        .orderBy("p")
        .limit(100)
        .drop("p")
    )


@query(
    "agg_sample_per_key_deterministic",
    oracle="""
    SELECT o_orderpriority, o_orderkey FROM (
      SELECT o_orderpriority, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5('samp|' || CAST(o_orderkey AS VARCHAR)))
               AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def agg_sample_per_key_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.FixedSizePerKey, deterministic variant: per-key md5-priority
    top-n via row_number — one key shuffle, rank truncation map-side
    (WindowGroupLimit pushes the limit before the full sort at scale)."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    pri = F.md5(F.concat(F.lit("samp|"), F.col("o_orderkey").cast("string")))
    w = W.partitionBy("o_orderpriority").orderBy(pri)
    return (
        o.select("o_orderpriority", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey")
    )


@query(
    "win_navigation_suite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)      OVER w AS prev_order,
           lead(o_orderkey)     OVER w AS next_order,
           lag(o_orderkey, 2, -1)  OVER w AS prev2_or_default,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order,
           CAST(round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2)
                AS DOUBLE) AS price_delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def win_navigation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE (reference
    ``BeamBuiltinAnalyticFunctions.java:41-47``) + LEAD/LAG with offsets
    and defaults (the free Spark extras SURVEY §2.8 notes): per-customer
    order navigation — previous/next order ids, a 2-back lag with a
    default, first/last order in the partition (last over the FULL
    frame — the default running frame is the classic silent-wrong-answer
    for last_value), and the order-to-order price delta."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_or_default"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.round(
            F.col("o_totalprice")
            - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice")),
            2,
        ).alias("price_delta"),
    )


@query(
    "agg_count_min_bounds",
    oracle="""
    WITH truth AS (
        SELECT l_partkey AS key, count(*) AS true_n FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_keys,
           CAST(sum(true_n) AS BIGINT) AS n_rows,
           TRUE AS lower_ok,
           TRUE AS upper_ok
    FROM truth
    """,
)
def agg_count_min_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable accuracy gate for count-min frequency sketching
    (reference sketching extension ``SketchFrequencies.java``) — the last
    sketch family without a bounds-exact twin (round-4 review item 2).

    Spark's ``count_min_sketch`` aggregate returns an opaque binary with
    no SQL estimate function, so the sketch is built HERE as a Spark-first
    composition with the identical structure (depth x width counter table,
    per-row min): ``d`` independent xxhash64 bucketings stack per row, one
    map-side-combined groupBy builds the counter table (d*width cells — a
    broadcastable artifact regardless of N), and each key's estimate is
    the min over its d counters via a broadcast join. Everything stays in
    whole-stage codegen; the only full-data shuffle is the exact-count
    groupBy the gate needs anyway.

    The emitted booleans are the CMS guarantees, not the estimates (the
    estimate values depend on xxhash64, which DuckDB cannot replay):
    - ``lower_ok``: estimate >= true count for EVERY key — deterministic
      (a key's own rows always land in its counters).
    - ``upper_ok``: estimate <= true count + ceil(5 * N / width) for
      every key. Markov gives P(excess_i >= k*N/width) <= 1/k per hash
      row, so at k=5 and depth 3 a key violates with p <= 1/125 per row
      independently = 8e-3 overall; with the fixed seed the check is
      deterministic for any given fixture and holds at sf0.001-0.1 with
      ~2x margin (observed max excess <= 2.4*N/width).
    """
    d, width, seed = 3, 2048, 42
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("key"))

    # (hash row i, bucket) per input row: stack the d bucketings, then one
    # count aggregate with map-side partial — the shuffle moves at most
    # d*width partial cells per task, not rows.
    buckets = li.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64("key", F.lit(seed + i)), F.lit(width)).alias("b"),
                )
                for i in range(d)
            ])
        ).alias("ib")
    ).select("ib.i", "ib.b")
    counters = buckets.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))

    truth = li.groupBy("key").agg(F.count(F.lit(1)).alias("true_n"))
    keyed = truth.select(
        "key",
        "true_n",
        *[
            F.pmod(F.xxhash64("key", F.lit(seed + i)), F.lit(width)).alias(f"b{i}")
            for i in range(d)
        ],
    )
    est = keyed
    for i in range(d):
        ci = counters.filter(F.col("i") == i).select(
            F.col("b").alias(f"b{i}"), F.col("c").alias(f"c{i}")
        )
        est = est.join(F.broadcast(ci), f"b{i}")
    est = est.select(
        "key", "true_n", F.least(*[F.col(f"c{i}") for i in range(d)]).alias("est")
    )
    # one aggregate produces every output: N (= sum of true counts) and
    # the max excess both reduce in the same pass, so upper_ok derives
    # without re-scanning est.
    return est.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("true_n").alias("n_rows"),
        F.every(F.col("est") >= F.col("true_n")).alias("lower_ok"),
        F.max(F.col("est") - F.col("true_n")).alias("max_excess"),
    ).select(
        "n_keys",
        "n_rows",
        "lower_ok",
        (
            F.col("max_excess")
            <= F.ceil(F.lit(5.0) * F.col("n_rows") / F.lit(width))
        ).alias("upper_ok"),
    )
