"""Scalar function surface: strings, hashes, math/trig, datetime,
conditionals, regex, JSON, arrays.

Reference surface: Beam SQL built-in scalar UDFs
(``impl/udf/BuiltinStringFunctions.java:35-223``,
``BuiltinHashFunctions.java``, ``BuiltinTrigonometricFunctions.java``,
``IsInf.java``, ``IsNan.java``) plus the Calcite standard operator table
(``impl/CalciteQueryPlanner.java:114-148``) and the Regex/ToString element
transforms (``transforms/util.py:999,1088``). Spark SQL's catalog is a
strict superset; every expression here is JVM-side whole-stage codegen —
no UDFs anywhere (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS up,
           lower(p_brand)                      AS lo,
           length(p_name)                      AS len,
           reverse(p_type)                     AS rev,
           substr(p_name, 1, 8)                AS pre,
           lpad(p_brand, 12, '*')              AS lp,
           rpad(p_brand, 12, '#')              AS rp,
           replace(p_type, ' ', '_')           AS repl,
           concat(p_brand, '|', p_type)        AS joined,
           starts_with(p_type, 'STANDARD')     AS sw,
           contains(p_name, 'o')               AS has_o,
           strpos(p_type, 'ED')                AS pos_ed,
           left(p_name, 3)                     AS l3,
           right(p_name, 3)                    AS r3,
           repeat(p_brand, 2)                  AS rep2,
           translate(p_brand, '#', '@')        AS tr,
           ascii(p_name)                       AS asc0,
           md5(p_name)                         AS h_md5,
           sha256(p_name)                      AS h_sha256
    FROM part
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + hash scalar functions (ENDS_WITH/STARTS_WITH/LENGTH/REVERSE/
    LPAD/RPAD/MD5/SHA256 per ``BuiltinStringFunctions.java`` /
    ``BuiltinHashFunctions.java`` + Calcite string ops)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.reverse("p_type").alias("rev"),
        F.substring("p_name", 1, 8).alias("pre"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, "#").alias("rp"),
        F.regexp_replace("p_type", " ", "_").alias("repl"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.startswith("p_type", F.lit("STANDARD")).alias("sw"),
        F.contains("p_name", F.lit("o")).alias("has_o"),
        F.instr("p_type", "ED").alias("pos_ed"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.substring(F.col("p_name"), -3, 3).alias("r3"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.translate("p_brand", "#", "@").alias("tr"),
        F.ascii("p_name").alias("asc0"),
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)        AS a,
           CAST(ceil(l_quantity * 1.5) AS BIGINT)  AS c,
           CAST(floor(l_quantity / 3) AS BIGINT)   AS f,
           round(sqrt(l_extendedprice), 6)         AS sq,
           round(exp(l_discount), 6)               AS ex,
           round(ln(l_extendedprice), 6)           AS lg,
           round(log10(l_extendedprice), 6)        AS l10,
           round(pow(l_quantity, 2), 2)            AS p2,
           l_orderkey % 7                          AS m7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
           greatest(l_quantity, l_discount * 100)  AS gr,
           least(l_quantity, l_tax * 100)          AS le,
           round(sin(l_quantity), 6)               AS sn,
           round(cos(l_quantity), 6)               AS cs,
           round((exp(2*l_discount) - 1) / (exp(2*l_discount) + 1), 6) AS th,
           round((exp(l_discount) + exp(-l_discount)) / 2, 6)          AS ch,
           round((exp(l_discount) - exp(-l_discount)) / 2, 6)          AS sh,
           isnan(l_discount)                       AS nn,
           isinf(l_extendedprice)                  AS inf
    FROM lineitem
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + trig + IS_NAN/IS_INF (``BuiltinTrigonometricFunctions.java``,
    ``IsInf.java``, ``IsNan.java``, Calcite arithmetic)."""
    li = table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice")
    q = F.col("l_quantity")
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(d - 0.05), 6).alias("a"),
        F.ceil(q * 1.5).alias("c"),
        F.floor(q / 3).alias("f"),
        F.round(F.sqrt(ep), 6).alias("sq"),
        F.round(F.exp(d), 6).alias("ex"),
        F.round(F.log(ep), 6).alias("lg"),
        F.round(F.log10(ep), 6).alias("l10"),
        F.round(F.pow(q, 2), 2).alias("p2"),
        (F.col("l_orderkey") % 7).alias("m7"),
        F.signum(d - 0.05).alias("sg"),
        F.greatest(q, d * 100).alias("gr"),
        F.least(q, F.col("l_tax") * 100).alias("le"),
        F.round(F.sin(q), 6).alias("sn"),
        F.round(F.cos(q), 6).alias("cs"),
        F.round(F.tanh(d), 6).alias("th"),
        F.round(F.cosh(d), 6).alias("ch"),
        F.round(F.sinh(d), 6).alias("sh"),
        F.isnan(d).alias("nn"),
        (F.abs(ep) == F.lit(float("inf"))).alias("inf"),
    )


@query(
    "fn_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                              AS y,
           month(o_orderdate)                             AS m,
           day(o_orderdate)                               AS d,
           quarter(o_orderdate)                           AS q,
           weekofyear(o_orderdate)                        AS w,
           dayofweek(o_orderdate) + 1                     AS dw,
           date_trunc('month', o_orderdate)::TIMESTAMP    AS mon,
           last_day(o_orderdate)::TIMESTAMP               AS ld,
           o_orderdate + INTERVAL 2 MONTH                 AS plus2m,
           o_orderdate + INTERVAL 7 DAY                   AS plus7d,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to,
           epoch(o_orderdate)::BIGINT                     AS ep,
           strftime(o_orderdate, '%Y-%m')                 AS ym
    FROM orders
    """,
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime EXTRACT/FLOOR/arithmetic (Calcite
    ``EXTRACT/FLOOR/CEIL/DATETIME_PLUS`` via the standard operator table).
    Convention notes: Spark's dayofweek is 1=Sunday, DuckDB's is 0=Sunday;
    Spark last_day returns DATE (cast back to timestamp to match)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("w"),
        F.dayofweek(d).alias("dw"),
        F.date_trunc("month", d).alias("mon"),
        F.last_day(d).cast("timestamp").alias("ld"),
        (d + F.expr("INTERVAL 2 MONTH")).alias("plus2m"),
        (d + F.expr("INTERVAL 7 DAY")).alias("plus7d"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), d).alias("days_to"),
        F.unix_timestamp(d).alias("ep"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                      AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
           greatest(c_acctbal, 0.0)                  AS pos_bal,
           least(c_acctbal, 1000.0)                  AS capped,
           c_acctbal IS NULL                         AS is_null,
           c_nationkey IN (1, 2, 3)                  AS in_small
    FROM customer
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/IN — Calcite conditional operators."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("parity"),
        F.greatest(bal, F.lit(0.0)).alias("pos_bal"),
        F.least(bal, F.lit(1000.0)).alias("capped"),
        bal.isNull().alias("is_null"),
        F.col("c_nationkey").isin(1, 2, 3).alias("in_small"),
    )


@query(
    "fn_regex_suite",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                   AS first_word,
           len(regexp_extract_all(text, 'data'))                 AS n_data,
           regexp_matches(text, 'spark.*join')                   AS has_sj,
           regexp_replace(text, '[aeiou]', '', 'g')              AS novowel,
           array_to_string(string_split_regex(trim(text), '\\s+')[1:4], ',') AS first4
    FROM documents
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex.{matches,find,replace_all,split} (reference
    ``transforms/util.py:1088``) as native regexp expressions."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("data"), 0)).cast("long").alias("n_data"),
        F.col("text").rlike("spark.*join").alias("has_sj"),
        F.regexp_replace("text", "[aeiou]", "").alias("novowel"),
        F.array_join(F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 4), ",").alias(
            "first4"
        ),
    )


@query(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing')           AS missing
    FROM events
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JsonToRow / get_json_object (reference
    ``sdks/java/core/.../transforms/JsonToRow.java``)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@query(
    "fn_array_suite",
    oracle="""
    SELECT vec_id,
           len(embedding)                                         AS dim,
           round(list_sum(embedding::DOUBLE[]), 5)                AS total,
           round(list_max(embedding)::DOUBLE, 6)                  AS mx,
           round(list_min(embedding)::DOUBLE, 6)                  AS mn,
           array_to_string(list_transform(embedding[1:3],
                           x -> CAST(CAST(round(x::DOUBLE * 1000000) AS BIGINT) AS VARCHAR)),
                           ',') AS first3,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 5) AS l1
    FROM embeddings
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (ArrayType surface, SURVEY.md §1.2):
    size/aggregate/transform/slice — all codegen'd, no UDF."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 5).alias("total"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("mx"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("mn"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.round(x.cast("double") * 1000000).cast("long").cast("string"),
            ),
        ).alias("first3"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda a, x: a + F.abs(x)), 5
        ).alias("l1"),
    )


@query(
    "fn_unnest",
    oracle="""
    SELECT vec_id,
           unnest(generate_series(0, len(embedding) - 1)) AS pos,
           round(unnest(embedding)::DOUBLE, 6)            AS val
    FROM embeddings WHERE vec_id < 50
    """,
)
def fn_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST / BeamUncollectRel (SURVEY.md §2.8) via posexplode."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))


@query(
    "fn_tostring_kvs",
    oracle="""
    SELECT event_id, user_id || ':' || event_type AS kv
    FROM events
    """,
)
def fn_tostring_kvs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ToString.Kvs (reference ``transforms/util.py:999``)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")).alias("kv"),
    )


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255            AS b_and,
           o_orderkey | 4096           AS b_or,
           xor(o_orderkey, o_custkey)  AS b_xor,
           o_orderkey << 2             AS b_shl,
           o_orderkey >> 3             AS b_shr,
           bit_count(o_orderkey)       AS b_cnt,
           ~o_orderkey                 AS b_not
    FROM orders
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator suite (Calcite standard operator table + BIT_XOR
    family, SURVEY §2.8). DuckDB spells xor as a function (its ^ is
    power); Spark's ^ is bitxor — the oracle uses xor() for parity."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(4096)).alias("b_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
        F.bit_count(k).alias("b_cnt"),
        F.bitwise_not(k).alias("b_not"),
    )


@query(
    "sql_udtf_ngrams",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents WHERE doc_id < 20)
    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS ngram, (i - 1)::INT AS pos
    FROM w, unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
    """,
)
def sql_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through the SQL front door (Spark's table-function
    parity-plus over Beam SQL, which has no Python SQL UDF/UDTF at all —
    SURVEY §2.8): a bigram generator lateral-joined per document. Arrow-
    batched; at scale this is the mapInPandas fan-out expressed in SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string, pos: int")
    class NGrams:
        def eval(self, text: str, n: int):
            words = (text or "").split()
            for i in range(max(len(words) - n + 1, 0)):
                yield (" ".join(words[i : i + n]), i)

    spark.udtf.register("beam_ngrams", NGrams)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.ngram, t.pos "
        "FROM udtf_docs d, LATERAL beam_ngrams(d.text, 2) t"
    )


@query(
    "fn_map_suite",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type),
    entries AS (
      SELECT user_id,
             list_sort(list(ROW(event_type, n)::STRUCT(et VARCHAR, n BIGINT))) AS es
      FROM per_type GROUP BY user_id),
    mapped AS (
      SELECT user_id,
             map_from_entries(list_transform(es, e -> {'k': e.et, 'v': e.n})) AS m
      FROM entries)
    SELECT user_id,
           array_to_string(map_keys(m), ',') AS ks,
           array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS vs,
           m['purchase'][1] AS n_purchase,
           len(map_keys(m)) AS n_types
    FROM mapped
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType operators (schema.proto MapType -> Spark MapType, SURVEY
    §1.2; ToDict combiner §2.4): build a per-user event_type->count map
    from SORTED entries (deterministic key order), then keys/values/
    lookup/cardinality. Maps never cross the oracle boundary raw — the
    derived columns are engine-portable."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "n")))
    )
    return (
        per_type.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.array_join(F.map_keys(F.col("m")), ",").alias("ks"),
            F.concat_ws(
                ",", F.transform(F.map_values(F.col("m")), lambda v: v.cast("string"))
            ).alias("vs"),
            F.element_at(F.col("m"), "purchase").alias("n_purchase"),
            F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
        )
    )


@query(
    "fn_hof_suite",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding::DOUBLE[], x -> x > 0))::BIGINT AS n_pos,
           (len(list_filter(embedding::DOUBLE[], x -> x > 0.9)) > 0) AS any_big,
           (len(list_filter(embedding::DOUBLE[], x -> abs(x) <= 1.0))
              = len(embedding)) AS all_unit,
           CAST(round(list_sum(list_transform(
                 list_zip(embedding[1:8], embedding[9:16]),
                 p -> p[1]::DOUBLE * p[2]::DOUBLE)) * 1000000) AS BIGINT)
             AS dot8_e6
    FROM embeddings
    """,
)
def fn_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function surface (filter/exists/forall/zip_with —
    the lambda-expression layer SURVEY §1.2 maps ArrayType onto): count
    of positive components, existence of a large one, a forall unit
    bound, and a zip_with dot product over two slices — every lambda
    codegen'd, zero UDFs."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter(dbl, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(dbl, lambda x: x > 0.9).alias("any_big"),
        F.forall(dbl, lambda x: F.abs(x) <= 1.0).alias("all_unit"),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(dbl, 1, 8), F.slice(dbl, 9, 8), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * 1e6
        )
        .cast("long")
        .alias("dot8_e6"),
    )
