"""Driver gates for the core-API surface pieces that previously had only
unit tests: element-wise sugar chains, Partition, Reshuffle, schema
surgery, LookupJoin, and the TFRecord round-trip. Each runs the REAL
PTransform classes end-to-end and hash-matches an exact DuckDB oracle —
lifting those SURVEY §2 components from tests-only to driver-green.

Scale notes: every gate here lowers to plain Catalyst (shared scans for
Partition's n filters, broadcast hash join for LookupJoin, repartition
for Reshuffle); the TFRecord gate moves bytes through the real CRC32C
framing codec executor-side, one shard per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


def _pc(spark, df):
    from ..core import PCollection, Pipeline

    return PCollection(df, Pipeline(spark))


@query(
    "core_elementwise_chain",
    oracle="""
    SELECT CAST(floor(round(value * 0.908, 2) / 100) AS BIGINT) AS element,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def core_elementwise_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map -> WithKeys -> KvSwap -> KvSwap -> Keys as one pipeline
    (reference ``core.py:1535``, ``util.py:225-241,760``): currency-adjust
    each value, key it by its 100-bucket, swap twice (identity —
    proving KvSwap composes), then project the keys. All Column-path:
    the whole chain is a single codegen'd projection."""
    from ..core import Keys, KvSwap, Map, WithKeys

    e = table(spark, sf_dir, "events").select("value")
    pc = _pc(spark, e)
    out = (
        pc
        | Map(F.round(F.col("value") * 0.908, 2))
        | WithKeys(F.floor(F.col("element") / 100).cast("long"))
        | KvSwap()
        | KvSwap()
        | Keys()
    )
    return out.df.groupBy("element").agg(F.count(F.lit(1)).alias("n"))


@query(
    "core_partition_fanout",
    oracle="""
    SELECT CASE event_type WHEN 'purchase' THEN 0 WHEN 'click' THEN 1 ELSE 2 END
             AS part,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def core_partition_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition(fn, 3) -> per-partition aggregate -> Flatten back
    (reference ``core.py:2586`` + ``core.py:2850``): the three filters
    share one scan (Catalyst), and the reunion is a union of three
    1-row aggregates."""
    from ..core import Flatten, Partition

    e = table(spark, sf_dir, "events").select("event_type", "value")
    part_expr = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
    )
    parts = _pc(spark, e) | Partition(part_expr, 3)
    aggs = [
        _pc(
            spark,
            p.df.agg(
                F.lit(i).cast("int").alias("part"),
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            ),
        )
        for i, p in enumerate(parts)
    ]
    return (aggs[0] | Flatten(aggs[1], aggs[2])).df.filter(F.col("n") > 0)


@query(
    "core_reshuffle_stability",
    oracle="""
    SELECT event_type, count(*) AS n, min(event_id) AS min_id
    FROM events GROUP BY event_type
    """,
)
def core_reshuffle_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshuffle (reference ``util.py:714``): a full redistribution
    must be content-neutral — the oracle is the aggregate WITHOUT the
    reshuffle. Also the durability-barrier shape: everything downstream
    reads shuffle output, never the source."""
    from ..core import Reshuffle

    e = table(spark, sf_dir, "events").select("event_type", "event_id")
    out = _pc(spark, e) | Reshuffle(64)
    return out.df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.min("event_id").alias("min_id")
    )


@query(
    "schema_surgery_roundtrip",
    oracle="""
    SELECT o_orderkey AS order_id,
           CAST(o_custkey AS VARCHAR) AS cust,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def schema_surgery_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AddFields -> CastFields -> RenameFields -> DropFields ->
    SelectFields (reference ``schemas/transforms/`` — the Java schema
    surgery suite): every step is a native projection; the chain
    collapses to one Project in the plan."""
    from ..transforms import AddFields, CastFields, DropFields, RenameFields, SelectFields

    o = table(spark, sf_dir, "orders")
    pc = _pc(spark, o.filter(F.col("o_orderstatus") == "O"))
    out = (
        pc
        | AddFields(price_cents=F.round(F.col("o_totalprice") * 100).cast("long"))
        | CastFields(o_custkey="string")
        | RenameFields(o_orderkey="order_id", o_custkey="cust")
        | DropFields("o_orderdate", "o_orderpriority", "o_totalprice", "o_orderstatus")
        | SelectFields("order_id", "cust", "price_cents")
    )
    return out.df


@query(
    "join_lookup_broadcast",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_lookup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupJoin against a seekable bounded table (reference
    ``BeamSideInputLookupJoinRel.java``): the big side probes a
    broadcast-hashed nation table per row — no shuffle of the probe
    side (plan asserted in test_transforms_api)."""
    from ..transforms import LookupJoin

    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"), "c_acctbal"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = _pc(spark, c) | LookupJoin(table=n, on="n_nationkey", how="inner")
    return out.df.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "io_tfrecord_roundtrip",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(length(text)) AS BIGINT) AS sum_len,
           CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS sum_md5
    FROM documents
    """,
)
def io_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord write+read round-trip (reference ``io/tfrecordio.py:233,292``)
    through the real CRC32C framing: every document's text crosses the
    codec as bytes and must come back byte-identical — the oracle
    recomputes count/length/md5 fingerprints from the SOURCE table, so a
    single corrupted byte (bad length, wrong mask, swapped CRC) fails
    the hash."""
    import tempfile

    from ..sources.tfrecord import read_tfrecord, write_tfrecord

    d = table(spark, sf_dir, "documents").select(
        F.encode(F.col("text"), "UTF-8").alias("element")
    )
    out_dir = tempfile.mkdtemp(prefix="tfrec_gate_")
    write_tfrecord(d, out_dir)
    back = read_tfrecord(spark, out_dir)
    txt = back.select(F.decode(F.col("element"), "UTF-8").alias("text"))
    return txt.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).cast("long").alias("sum_len"),
        F.sum(F.conv(F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 8), 16, 10).cast("long"))
        .cast("long")
        .alias("sum_md5"),
    )
