"""Stateful ParDo with user state cells and multiple named timers.

Reference surface (SURVEY.md §2.7): state cells
``ReadModifyWriteStateSpec/BagStateSpec/SetStateSpec/CombiningValueStateSpec``
(``transforms/userstate.py:73,82,91,100``) and ``TimerSpec`` +
``@on_timer`` with event-time and processing-time families
(``userstate.py:162,186``).

Spark's ``applyInPandasWithState`` gives exactly ONE timeout per key;
Beam allows any number of named timers per key. The adapter multiplexes:
all pending timers live in the state blob as a name->instant map, the
Spark timeout is armed at the MINIMUM pending instant, and on wake-up
(or on any data delivery) every timer whose instant has passed fires in
instant order. That is the reference's own trick for runners with a
single-timer primitive (min-heap over timer families).

State cells are a JSON dict per key: value cells hold scalars, bag cells
lists, combining cells the accumulator. At scale this rides Spark's
state store (RocksDB) partitioned by key; cell payloads must stay
small-ish (bags are for bounded buffers, exactly as in Beam — unbounded
aggregation belongs in a CombiningValue cell).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_TIME = "event"
PROCESSING_TIME = "processing"


class StatefulContext:
    """What a DoFn sees: state cells + timers + clocks (reference
    ``DoFn.StateParam`` / ``DoFn.TimerParam``)."""

    def __init__(self, cells: dict, timers: dict, watermark: float, processing_time: float):
        self._cells = cells
        self._timers = timers
        self.watermark = watermark
        self.processing_time = processing_time

    # state cells ---------------------------------------------------------
    def read(self, cell: str, default: Any = None) -> Any:
        return self._cells.get(cell, default)

    def write(self, cell: str, value: Any) -> None:
        self._cells[cell] = value

    def clear(self, cell: str) -> None:
        self._cells.pop(cell, None)

    def bag_add(self, cell: str, value: Any) -> None:
        self._cells.setdefault(cell, []).append(value)

    def bag_read(self, cell: str) -> list:
        return self._cells.get(cell, [])

    # SetState (reference ``userstate.py:91``): JSON cells can't hold a
    # Python set, so the cell is a sorted unique list — contains/add stay
    # O(1)-amortized via a dict-backed membership check.
    def set_add(self, cell: str, value: Any) -> None:
        vals = self._cells.setdefault(cell, [])
        if value not in vals:
            vals.append(value)

    def set_contains(self, cell: str, value: Any) -> bool:
        return value in self._cells.get(cell, [])

    def set_read(self, cell: str) -> list:
        return sorted(self._cells.get(cell, []))

    # CombiningValueState (reference ``userstate.py:100``): the cell holds
    # ONLY the accumulator — adds fold in eagerly, so a million adds cost
    # one accumulator of state, never a buffer (the scale contract that
    # distinguishes this cell from a bag).
    def combining_add(self, cell: str, value: Any, fn: "CombineFn | Callable") -> None:
        from ..core import CombineFn

        if isinstance(fn, CombineFn):
            acc = self._cells.get(cell)
            if acc is None:
                acc = fn.create_accumulator()
            self._cells[cell] = fn.add_input(acc, value)
        else:  # plain 2-arg reducer, e.g. operator.add
            acc = self._cells.get(cell)
            self._cells[cell] = value if acc is None else fn(acc, value)

    def combining_read(self, cell: str, fn: "CombineFn | Callable | None" = None):
        from ..core import CombineFn

        acc = self._cells.get(cell)
        if acc is not None and isinstance(fn, CombineFn):
            return fn.extract_output(acc)
        return acc

    # timers --------------------------------------------------------------
    def set_timer(self, name: str, instant: float) -> None:
        self._timers[name] = instant

    def clear_timer(self, name: str) -> None:
        self._timers.pop(name, None)


def stateful_pardo(
    df: DataFrame,
    key_col: str,
    output_schema: T.StructType,
    process: Callable[[Any, pd.DataFrame, StatefulContext], list],
    on_timer: Callable[[Any, str, StatefulContext], list] | None = None,
    timer_domain: str = EVENT_TIME,
    time_sorted_by: str | None = None,
):
    """Beam-style stateful ParDo on a keyed stream.

    ``process(key, rows_pdf, ctx) -> list[tuple]`` handles each delivered
    bundle; ``on_timer(key, timer_name, ctx) -> list[tuple]`` handles each
    fired timer. Both emit output rows matching ``output_schema`` (which
    must lead with the key column). ``timer_domain`` picks the Spark
    timeout conf: EVENT_TIME requires an upstream ``withWatermark``;
    ``"none"`` disables timer wake-ups (pending timers then only fire on
    data delivery — lazy evaluation).

    CAVEAT: PROCESSING_TIME timeouts make Structured Streaming poll with
    continuous micro-batches while any timer is armed (the engine cannot
    know a key's deadline without running the state fn), so
    ``processAllAvailable`` never settles and idle clusters stay busy.
    Prefer lazy ``"none"``-domain checks against ``ctx.processing_time``
    when the semantics allow (see deduplicate_stream_processing_time).

    ``time_sorted_by``: Beam's ``RequiresTimeSortedInput``
    (reference ``fn_runner.py:256-280`` enforces per-key
    timestamp-sorted delivery before the DoFn). Here each delivered
    per-key bundle is sorted by that column before ``process`` sees it.
    Like Beam, ordering holds only among elements already delivered —
    elements later than the watermark can still arrive in a future
    bundle; buffer in a bag cell + event-time timer for a total order.
    """
    has_watermark = "EventTimeWatermark" in df._jdf.queryExecution().analyzed().toString()
    if timer_domain == EVENT_TIME and not has_watermark:
        raise ValueError("event-time timers require withWatermark upstream")
    timeout = {
        EVENT_TIME: "EventTimeTimeout",
        PROCESSING_TIME: "ProcessingTimeTimeout",
        "none": "NoTimeout",
    }[timer_domain]

    state_schema = T.StructType([T.StructField("blob", T.StringType())])
    out_cols = [f.name for f in output_schema.fields]

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        blob = json.loads(state.get[0]) if state.exists else {"cells": {}, "timers": {}}
        wm = state.getCurrentWatermarkMs() / 1000.0 if has_watermark else float("-inf")
        pt = state.getCurrentProcessingTimeMs() / 1000.0
        ctx = StatefulContext(blob["cells"], blob["timers"], wm, pt)
        out_rows: list = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf):
                    if time_sorted_by is not None:
                        pdf = pdf.sort_values(time_sorted_by, kind="mergesort").reset_index(
                            drop=True
                        )
                    out_rows.extend(process(key[0], pdf, ctx) or [])
        # fire every due timer in instant order (the multiplexer)
        now = wm if timer_domain == EVENT_TIME else pt
        while blob["timers"]:
            name = min(blob["timers"], key=blob["timers"].get)
            instant = blob["timers"][name]
            if instant > now:
                break
            del blob["timers"][name]
            if on_timer:
                out_rows.extend(on_timer(key[0], name, ctx) or [])
        state.update((json.dumps(blob),))
        if blob["timers"] and timer_domain != "none":
            nxt = min(blob["timers"].values())
            if timer_domain == EVENT_TIME:
                state.setTimeoutTimestamp(max(int(nxt * 1000), int(wm * 1000) + 1))
            else:
                state.setTimeoutDuration(max(int((nxt - pt) * 1000), 1))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(fn, output_schema, state_schema, "Append", timeout)
    )


# -- declarative state/timer spec classes (API-parity spellings) -----------
# reference ``transforms/userstate.py:73,82,91,100,162``: Beam DoFns
# DECLARE state cells and timers as class attributes; this engine's
# StatefulContext addresses cells by name at use time. These spec classes
# give ported DoFns the familiar declaration spelling — each is a named
# handle whose methods delegate to the ctx cell of the same name.


class _Spec:
    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover
        return f"{type(self).__name__}({self.name!r})"


class ReadModifyWriteStateSpec(_Spec):
    """Value cell (reference ``userstate.py:73``)."""

    def read(self, ctx: StatefulContext, default=None):
        return ctx.read(self.name, default)

    def write(self, ctx: StatefulContext, value) -> None:
        ctx.write(self.name, value)

    def clear(self, ctx: StatefulContext) -> None:
        ctx.clear(self.name)


class BagStateSpec(_Spec):
    """Bag cell (reference ``userstate.py:82``)."""

    def add(self, ctx: StatefulContext, value) -> None:
        ctx.bag_add(self.name, value)

    def read(self, ctx: StatefulContext) -> list:
        return ctx.bag_read(self.name)

    def clear(self, ctx: StatefulContext) -> None:
        ctx.clear(self.name)


class SetStateSpec(_Spec):
    """Set cell (reference ``userstate.py:91``)."""

    def add(self, ctx: StatefulContext, value) -> None:
        ctx.set_add(self.name, value)

    def contains(self, ctx: StatefulContext, value) -> bool:
        return ctx.set_contains(self.name, value)

    def read(self, ctx: StatefulContext) -> list:
        return ctx.set_read(self.name)


class CombiningValueStateSpec(_Spec):
    """Combining cell (reference ``userstate.py:100``): holds ONLY the
    accumulator; adds fold eagerly."""

    def __init__(self, name: str, combine_fn):
        super().__init__(name)
        self.combine_fn = combine_fn

    def add(self, ctx: StatefulContext, value) -> None:
        ctx.combining_add(self.name, value, self.combine_fn)

    def read(self, ctx: StatefulContext):
        return ctx.combining_read(self.name, self.combine_fn)


class TimerSpec(_Spec):
    """Named timer family (reference ``userstate.py:162``); domain is a
    property of the enclosing ``stateful_pardo`` call."""

    def set(self, ctx: StatefulContext, instant: float) -> None:
        ctx.set_timer(self.name, instant)

    def clear(self, ctx: StatefulContext) -> None:
        ctx.clear_timer(self.name)
