"""Table catalog over the driver-generated parquet fixtures.

Mirrors the reference's ``TableProvider`` catalogs
(``sdks/java/extensions/sql/.../meta/provider/TableProvider.java``): names
resolve to sources; here every table is a parquet directory under a
scale-factor dir and resolution is a ``spark.read.parquet`` — DataSource V2
gives predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor we target
# (region/nation are bounded by geography; at 100 TB they are still tiny).
BROADCAST_SAFE = {"region", "nation"}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make a FOREIGN SparkSession (e.g. the driver's vanilla one) able to
    read the fixtures correctly. Both confs are runtime-settable:
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark's
      reader rejects outright without this flag;
    - UTC session timezone: unix_timestamp()/window() interpret naive
      timestamps in the session zone — anything else shifts epoch values
      away from the (UTC-naive) DuckDB oracle.
    """
    try:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf API unavailable (shouldn't happen); session.py covers ours


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Legacy fixture layout: ts stored as TIMESTAMP(NANOS), read as
        # epoch-nanos long (see nanosAsLong above); restore event-time
        # semantics at microsecond precision. Integer DIV: epoch-nanos
        # exceeds double's 2^53 mantissa, so float division would round
        # the microsecond digit.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Current fixtures store timestamp[us] with isAdjustedToUTC=false, which
    # this Spark reads as TIMESTAMP_NTZ. Event-time APIs (withWatermark,
    # unix_micros, window) require the instant-based TIMESTAMP type, so
    # normalize every NTZ column here — the cast reinterprets the naive
    # value in the session timezone, which _ensure_session_confs pins to
    # UTC, making it exact w.r.t. the (UTC-naive) DuckDB oracle.
    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for the SQL front door)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
