"""Stateful streaming kernel: per-key state cells + timer-like semantics
on ``applyInPandasWithState``.

Reference surface (SURVEY.md §2.7): user state cells
(``transforms/userstate.py:73-100``), Deduplicate
(``transforms/deduplicate.py:43,111``), streaming GroupIntoBatches
(``transforms/util.py:787``), and the trigger machinery
(``transforms/trigger.py``) — here the ``AfterCount`` shape as the first
kernel client.

Design: one state struct per key holds all cells (the reference stores
cells per (key, window) the same way); Arrow batches in/out; timeouts via
Spark's GroupStateTimeout. At scale, state lives in the state store
(RocksDB/HDFS) partitioned by key — the shuffle is on the key only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def deduplicate_stream(
    df: DataFrame,
    id_cols: list[str],
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Streaming Deduplicate (reference ``deduplicate.py:111``): keep the
    first element per id within the time horizon.

    ``within`` (e.g. "10 minutes") bounds state exactly like the
    reference's processing_time_duration; unbounded dedup keeps state
    forever (only use with finite keyspaces).
    """
    if within and event_time_col:
        return df.withWatermark(event_time_col, within).dropDuplicatesWithinWatermark(id_cols)
    return df.dropDuplicates(id_cols)


def per_key_counter(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running per-key element count — the ReadModifyWriteState
    (``userstate.py:73``) hello-world; emits the updated count once per
    key per micro-batch."""
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("total", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("count", T.LongType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"key": [key[0]], "total": [count]})

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(fn, out_schema, state_schema, "Update", "NoTimeout")
    )


def group_into_batches_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
    batch_size: int,
) -> DataFrame:
    """Streaming GroupIntoBatches (reference ``util.py:787``): per-key
    batches of exactly ``batch_size`` (the remainder stays buffered in
    state as a BagState until more elements arrive)."""
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("batch", T.ArrayType(T.StringType())),
            T.StructField("batch_size", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("buffer", T.ArrayType(T.StringType()))])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        buffer: list[str] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            buffer.extend(str(v) for v in pdf[value_col])
        batches = []
        while len(buffer) >= batch_size:
            batches.append(buffer[:batch_size])
            buffer = buffer[batch_size:]
        state.update((buffer,))
        if batches:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(batches),
                    "batch": batches,
                    "batch_size": [len(b) for b in batches],
                }
            )

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(fn, out_schema, state_schema, "Append", "NoTimeout")
    )


def after_count_trigger(
    df: DataFrame,
    key_col: str,
    value_col: str,
    count_n: int,
    accumulating: bool = False,
) -> DataFrame:
    """AfterCount(n) trigger kernel (reference ``trigger.py:638``): per key,
    fire a pane every ``count_n`` elements. ``accumulating`` reproduces
    AccumulationMode.ACCUMULATING (``trigger.py:72``): panes include all
    elements so far; discarding resets per pane.

    This is the first client of the general (key, window)-state trigger
    VM (SURVEY.md §2.6 'trigger kernel'); combinators land on the same
    state layout.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("pane_index", T.IntegerType()),
            T.StructField("pane_count", T.LongType()),
            T.StructField("pane_sum", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pending_count", T.LongType()),
            T.StructField("pending_sum", T.DoubleType()),
            T.StructField("acc_count", T.LongType()),
            T.StructField("acc_sum", T.DoubleType()),
            T.StructField("pane_index", T.IntegerType()),
        ]
    )

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        pend_n, pend_s, acc_n, acc_s, pane = (
            state.get if state.exists else (0, 0.0, 0, 0.0, 0)
        )
        out_rows = []
        for pdf in pdfs:
            for v in pdf[value_col]:
                pend_n += 1
                pend_s += float(v)
                acc_n += 1
                acc_s += float(v)
                if pend_n >= count_n:
                    if accumulating:
                        out_rows.append((key[0], pane, acc_n, round(acc_s, 6)))
                    else:
                        out_rows.append((key[0], pane, pend_n, round(pend_s, 6)))
                    pane += 1
                    pend_n, pend_s = 0, 0.0
        state.update((pend_n, pend_s, acc_n, acc_s, pane))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["key", "pane_index", "pane_count", "pane_sum"]
            )

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(fn, out_schema, state_schema, "Append", "NoTimeout")
    )


def deduplicate_stream_processing_time(
    df: DataFrame,
    id_col: str,
    within_seconds: float,
    emit_cols: list[str],
) -> DataFrame:
    """Processing-time-domain Deduplicate (reference ``deduplicate.py:43``
    with processing_time_duration): emit the first element per id; after
    ``within_seconds`` of processing time the id may be emitted again.

    Expiry is LAZY — state stores ``seen_at`` and each delivery compares
    against the current processing time — rather than timer-driven: an
    armed ProcessingTimeTimeout makes Structured Streaming schedule
    micro-batches continuously to poll for timed-out keys (measured:
    hundreds of empty epochs per minute), which burns cluster time and
    never lets ``processAllAvailable`` settle. Lazy expiry keeps the
    exact same emission semantics; per-key state is one float (GC of
    cold keys is the state-TTL concern production configures on the
    state store)."""
    from .userstate import StatefulContext, stateful_pardo

    assert emit_cols[0] == id_col, "output schema must lead with the id column"
    out_schema = T.StructType([df.schema[c] for c in emit_cols])

    def process(key, rows, ctx: StatefulContext):
        seen_at = ctx.read("seen_at")
        if seen_at is not None and ctx.processing_time - seen_at < within_seconds:
            return []
        ctx.write("seen_at", ctx.processing_time)
        first = rows.iloc[0]
        return [tuple(first[c] for c in emit_cols)]

    return stateful_pardo(df, id_col, out_schema, process, timer_domain="none")
