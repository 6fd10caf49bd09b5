"""Refreshing side inputs for streams (SURVEY.md hardness #5).

Beam re-reads a side-input view per window/firing
(``pvalue.py:475-633`` views over a windowed PCollection); Spark's
broadcast is static for the lifetime of a query. The idiomatic bridge is
``foreachBatch``: the side table is re-loaded (and re-broadcast) at
every micro-batch, so slowly-changing dimensions — the dominant Beam
use of windowed side inputs — stay fresh with micro-batch granularity.

At scale this is the standard pattern for stream-dim joins with mutable
dims: the per-batch reload is one small scan (broadcast-sized by
contract, same as Beam's AsDict/AsMap views), and the join itself is a
broadcast hash join in every batch plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def join_with_refreshing_side_input(
    stream_df: DataFrame,
    side_loader: Callable[[SparkSession], DataFrame],
    join_fn: Callable[[DataFrame, DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
):
    """Run ``stream_df`` with a side input that is re-read every
    micro-batch.

    ``side_loader(spark)`` loads the current side table (re-evaluated per
    batch); ``join_fn(batch_df, side_df)`` builds the joined output (the
    side is pre-wrapped in ``F.broadcast``); ``sink(out_df, batch_id)``
    lands the result. Returns the started StreamingQuery.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        side = F.broadcast(side_loader(spark))
        sink(join_fn(batch_df, side), batch_id)

    return stream_df.writeStream.foreachBatch(handle).start()
