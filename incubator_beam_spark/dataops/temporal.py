"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Reference parity: Beam has no as-of/range join primitive either — these
are the compositions a Beam user hand-writes with GroupByKey + sorted
state (and what kdb/Flink expose natively). First-class here because
training-data pipelines constantly align facts to the latest dimension
snapshot (feature backfill, point-in-time correctness).

Scale design:
- ``asof_join`` is ONE shuffle: union both sides, hash-partition by key,
  sort by (ts, side) inside each partition, and carry the latest right
  payload forward with ``last(..., ignoreNulls=True)``. No range
  explosion, no per-key driver loop. Skew caveat: a window partition
  cannot be split (AQE skew handling does not apply to Window), so one
  pathological key's rows land on one task — bounded by that task's sort
  spill, not memory (see the hot-key stress test); time-bucket the key
  (key, ts_bucket) with per-bucket seeding if a single key exceeds task
  disk.
- ``range_join`` buckets time so the non-equi predicate becomes an
  equi-join on bucket id + a residual filter — a cartesian becomes
  |buckets-overlapped| replicated rows. Pick ``bucket`` near the typical
  interval length: each interval lands in O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def _instant_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize TIMESTAMP_NTZ timestamp columns to instant-based TIMESTAMP.

    ``unix_micros`` (and every event-time API) rejects NTZ; under a UTC
    session timezone the cast is exact. Callers going through
    ``catalog.table`` are already normalized — this guards direct inputs.
    """
    ntz = [c for c in cols if isinstance(df.schema[c].dataType, T.TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_ms: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward') within the same key — a LEFT
    as-of join (unmatched left rows keep NULL right columns).

    Ties on ``right_ts`` resolve to the row that sorts last on the
    remaining right columns (deterministic). ``tolerance_ms`` bounds the
    match distance like pandas ``merge_asof``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left = _instant_ts(left, left_ts)
    right = _instant_ts(right, right_ts)

    rpay = [c for c in right.columns if c not in keys]
    lcols = left.columns
    # Null-timestamp right rows would sort to an end of the partition and
    # pollute matches (they are not "earliest"/"latest" facts); drop them.
    right = right.filter(F.col(right_ts).isNotNull())
    # One struct column carries the whole right payload through the sort.
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpay]).alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols if c not in keys],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in keys],
    )
    u = r_tagged.unionByName(l_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts => <= semantics
        order = [F.col("__t").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc()]
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    matched = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    # null-timestamp LEFT rows always emit unmatched (under desc/forward
    # ordering they would otherwise sort last and grab an arbitrary match)
    matched = matched.withColumn(
        "__m", F.when(F.col("__t").isNotNull(), F.col("__m"))
    )
    if tolerance_ms is not None:
        dist = F.abs(
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col(f"__m.{right_ts}"))
        )
        matched = matched.withColumn(
            "__m",
            F.when(dist <= tolerance_ms * 1000, F.col("__m")),
        )
    out_left = [F.col(k) for k in keys] + [
        F.col(f"__l_{c}").alias(c) for c in lcols if c not in keys
    ]
    out_right = [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    return matched.select(*out_left, *out_right)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` WITHOUT a cartesian product: both sides map
    to time-bucket ids (intervals explode to the O(len/bucket) buckets
    they overlap), equi-join on bucket, then apply the exact range
    filter. Each qualifying (point, interval) pair appears exactly once
    because a point lives in exactly one bucket."""
    if how != "inner":
        raise ValueError("only inner range_join is supported")
    points = _instant_ts(points, point_ts)
    intervals = _instant_ts(intervals, start_col, end_col)
    us = 1000 * bucket_ms
    pb = points.withColumn("__b", (F.unix_micros(F.col(point_ts)) / us).cast("long"))
    # degenerate intervals (null bounds, end <= start) can never match —
    # and a reversed pair would make sequence() DESCEND; drop them early
    intervals = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    )
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / us).cast("long"),
                (F.unix_micros(F.col(end_col)) / us).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )
