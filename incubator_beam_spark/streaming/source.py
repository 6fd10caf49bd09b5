"""Streaming sources over the fixture tables.

The reference's unbounded sources are SDFs (``io/iobase.py:1239``); Spark's
DataSource V2 micro-batch planner fills that role (SURVEY.md §2.7) — a
file-stream source here, Kafka/rate in production (``sources/io.py``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_table(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Read a fixture table as an unbounded stream (file source).

    Schema comes from a bounded peek (streaming reads require an explicit
    schema); the nanos->timestamp normalization matches catalog.table.
    """
    from ..catalog import table

    path = os.path.join(sf_dir, f"{name}.parquet")
    bounded = spark.read.parquet(path)
    # FileStreamSource requires a directory; fixtures are single files.
    # Stage a symlink in a temp dir (no data copy) and stream that dir.
    stage = tempfile.mkdtemp(prefix=f"stream_{name}_")
    os.symlink(path, os.path.join(stage, f"{name}.parquet"))
    reader = spark.readStream.schema(bounded.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage)
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # TIMESTAMP_NTZ -> TIMESTAMP under the pinned UTC session tz (exact);
    # withWatermark/window/session_window require the instant-based type.
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_table(spark, sf_dir, "events")


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "append"):
    """Drain a bounded file-backed stream through a memory sink and return
    the result table (micro-batch execution of the same logical plan).

    Test/driver utility: production sinks are in ``sources/io.py``.
    """
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def periodic_impulse(
    spark: SparkSession, fire_interval_sec: float = 1.0, rows_per_second: int | None = None
) -> DataFrame:
    """PeriodicImpulse (reference ``transforms/periodicsequence.py:137``):
    an unbounded stream of (timestamp, value) ticks at a fixed interval —
    the standard "poll something every N seconds" driver. Maps to Spark's
    ``rate`` source: rowsPerSecond = 1/interval; the ``value`` column is
    the monotone tick index exactly like the reference's sequence
    output."""
    rps = rows_per_second if rows_per_second is not None else max(1, round(1.0 / fire_interval_sec))
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(F.col("timestamp").alias("ts"), F.col("value"))
    )
