"""Beam-shaped WindowFn surface, including CUSTOM MERGING window fns.

Reference: ``transforms/window.py`` — WindowFn (:119, with ``merge``),
GlobalWindows (:254), FixedWindows (:284), SlidingWindows (:325),
Sessions (:364). Spark has native tumble/slide/session via
``F.window``/``F.session_window``; what it lacks is the USER-DEFINED
merging window fn, which SURVEY.md §2.6 flags as the hard gap.

Spark-first design:
- ``assign`` returns proto-window (start, end) **Column expressions**
  evaluated JVM-side during the scan — a custom window fn is code-gen'd
  arithmetic, not a Python callback per element (Beam runs WindowFn.assign
  in the worker loop; we compile it into the plan).
- Merging runs per key with the gaps-and-islands pattern: order windows
  by start, open a new merged window whenever start exceeds the running
  max end of everything before it (plus an optional ``slack``), then a
  running sum of those breaks numbers the islands. Two analytic passes
  over ONE shuffle on the key — no UDF, no state. ``slack > 0`` merges
  DISJOINT windows whose gap is within slack (e.g. coalescing tumbling
  proto-windows across quiet periods), which overlap-only merging can
  never do.
- Fully-general ``WindowFn.merge`` (arbitrary user merge logic over the
  window set, reference ``window.py:119``): override ``merge`` and the
  engine runs it per key inside ``applyInPandas`` over the DISTINCT
  proto-window set — the Python callback sees O(#windows-per-key)
  tuples, never O(rows), and groups distribute across executors, so the
  slow path costs Arrow batching + a small per-key list, not a per-row
  UDF.
- Non-merging fns just explode their assignment arrays.

The merged result carries ``window_start``/``window_end`` epoch-second
columns; downstream groupBys use them as ordinary grouping keys (windows
ARE keys once assigned — same as the reference's WindowedValue pairing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .core import PCollection, PTransform

__all__ = [
    "WindowFn",
    "GlobalWindows",
    "FixedWindows",
    "SlidingWindows",
    "Sessions",
    "WindowInto",
    "merge_proto_windows",
    "merge_proto_windows_general",
]


class WindowFn:
    """reference ``window.py:119``. ``assign`` maps an event-time Column
    (epoch seconds, double) to one proto-window or a list of them;
    ``merging`` declares whether proto-windows coalesce per key.

    Merge contract (mirroring the reference's ``WindowFn.merge`` +
    ``MergeContext``): by default the engine coalesces windows that
    overlap, or whose gap is at most ``slack`` seconds — both run as
    native analytic passes. For arbitrary merge logic, override
    ``merge``: it receives the key's DISTINCT proto-windows sorted by
    (start, end) and returns merge directives
    ``[(members, (new_start, new_end)), ...]`` where ``members`` is a
    list of (start, end) tuples replaced by the new window; windows not
    named in any directive stay as themselves. Called once per key per
    WindowInto (the reference's MergeContext likewise completes all
    merging in one invocation per GroupByKey)."""

    merging: bool = False
    #: max gap (seconds) between windows that still merge; 0 = overlap-only
    slack: float = 0.0

    def assign(self, ts: Column) -> "tuple[Column, Column] | list[tuple[Column, Column]]":
        raise NotImplementedError

    def merge(
        self, windows: "list[tuple[float, float]]"
    ) -> "list[tuple[list[tuple[float, float]], tuple[float, float]]]":
        """Override for fully-general merging (disjoint, conditional,
        element-count-independent — anything). Default: engine-side
        overlap/slack merge.

        The directives must be the FINAL FIXPOINT in this single
        invocation: returned windows are applied as-is and are NOT
        re-merged against each other (unlike Beam's MergeContext, which
        may call merge repeatedly). Directives may only name windows
        from the input list — unknown members raise ValueError."""
        raise NotImplementedError


class GlobalWindows(WindowFn):
    """reference ``window.py:254``: one window covering all time."""

    def assign(self, ts: Column):
        inf = float(2**62)
        return (F.lit(-inf), F.lit(inf))


class FixedWindows(WindowFn):
    """reference ``window.py:284``: tumbling windows of ``size`` seconds."""

    def __init__(self, size: float, offset: float = 0.0):
        self.size, self.offset = float(size), float(offset)

    def assign(self, ts: Column):
        start = F.floor((ts - self.offset) / self.size) * self.size + self.offset
        return (start, start + self.size)


class SlidingWindows(WindowFn):
    """reference ``window.py:325``: ``size``-second windows every
    ``period`` seconds; each element lands in size/period windows."""

    def __init__(self, size: float, period: float, offset: float = 0.0):
        self.size, self.period, self.offset = float(size), float(period), float(offset)

    def assign(self, ts: Column):
        n = int(self.size // self.period)
        last_start = (
            F.floor((ts - self.offset) / self.period) * self.period + self.offset
        )
        return [
            (last_start - i * self.period, last_start - i * self.period + self.size)
            for i in range(n)
        ]


class Sessions(WindowFn):
    """reference ``window.py:364``: per-element proto-window
    [ts, ts+gap); merging coalesces overlaps into sessions."""

    merging = True

    def __init__(self, gap: float):
        self.gap = float(gap)

    def assign(self, ts: Column):
        return (ts, ts + self.gap)


def merge_proto_windows(
    df: DataFrame, key_cols: list[str], slack: float = 0.0
) -> DataFrame:
    """Coalesce (window_start, window_end) proto-windows per key — the
    WindowFn.merge step, as two native analytic passes:

    1. break flag: start > max(end) + slack over all EARLIER rows
       (strictly preceding frame) opens a new island — slack=0 merges
       overlap-only; slack>0 also merges DISJOINT windows whose gap is
       within slack;
    2. island id: running sum of break flags;
    then the merged bounds are min(start)/max(end) per island, attached
    back to every row (matching the reference, where merging rewrites
    each element's window in place).
    """
    order = W.partitionBy(*key_cols).orderBy("window_start", "window_end")
    prev_max_end = F.max("window_end").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull()
            | (F.col("window_start") > prev_max_end + F.lit(float(slack))),
            1,
        ).otherwise(0),
    )
    islanded = flagged.withColumn(
        "__island",
        F.sum("__new_island").over(order.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("__new_island")
    bounds = W.partitionBy(*key_cols, "__island")
    return (
        islanded.withColumn("window_start", F.min("window_start").over(bounds))
        .withColumn("window_end", F.max("window_end").over(bounds))
        .drop("__island")
    )


def merge_proto_windows_general(
    df: DataFrame, key_cols: list[str], windowfn: WindowFn
) -> DataFrame:
    """Run a user-defined ``WindowFn.merge`` per key: one shuffle on the
    key (applyInPandas), then the Python callback sees only the DISTINCT
    sorted proto-window tuples for that key — O(#windows), never O(rows)
    — and every row's window is rewritten through the returned mapping.
    At 100 TB the per-key window set stays driver-artifact-sized (it is
    bounded by the key's session structure, not its row count); rows
    move through Arrow batches with no per-row Python."""
    schema = df.schema
    cols = [f.name for f in schema.fields]

    def apply_merge(pdf):
        wins = sorted(set(zip(pdf["window_start"], pdf["window_end"])))
        winset = {(float(s), float(e)) for s, e in wins}
        mapping = {}
        for members, merged in windowfn.merge(wins):
            for m in members:
                key = (float(m[0]), float(m[1]))
                if key not in winset:
                    raise ValueError(
                        f"WindowFn.merge directive names window {key} which is "
                        f"not among this key's distinct windows; merge() must "
                        f"only reference windows it was given"
                    )
                mapping[key] = merged
        if mapping:
            new = [
                mapping.get((float(s), float(e)), (s, e))
                for s, e in zip(pdf["window_start"], pdf["window_end"])
            ]
            pdf = pdf.copy()
            pdf["window_start"] = [w[0] for w in new]
            pdf["window_end"] = [w[1] for w in new]
        return pdf[cols]

    return df.groupBy(*key_cols).applyInPandas(apply_merge, schema)


class WindowInto(PTransform):
    """reference ``core.py:3065`` WindowInto: stamp each element with its
    window(s). For merging fns, windows coalesce per ``key_cols``
    immediately (batch semantics — the reference merges lazily at the
    next GroupByKey, which is observationally identical)."""

    def __init__(self, windowfn: WindowFn, ts_col: str = "ts", key_cols: list[str] | None = None):
        self.windowfn = windowfn
        self.ts_col = ts_col
        self.key_cols = key_cols or []

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df
        ts = F.col(self.ts_col)
        if dict(df.dtypes).get(self.ts_col, "").startswith("timestamp"):
            # TIMESTAMP_NTZ has no direct numeric cast; hop through TIMESTAMP.
            # That hop reinterprets the naive value in the SESSION timezone at
            # execution time — exact epoch seconds only under UTC, so fail
            # loudly rather than shift silently on a foreign session.
            if dict(df.dtypes)[self.ts_col] == "timestamp_ntz":
                tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
                if tz != "UTC":
                    raise ValueError(
                        f"WindowInto on a TIMESTAMP_NTZ column requires "
                        f"spark.sql.session.timeZone=UTC (got {tz!r}); the "
                        f"NTZ->TIMESTAMP hop would shift epoch values"
                    )
            ts = ts.cast("timestamp").cast("double")
        assigned = self.windowfn.assign(ts)
        if isinstance(assigned, list):  # multi-assignment (sliding)
            windows = F.array(
                *[F.struct(s.alias("s"), e.alias("e")) for s, e in assigned]
            )
            df = (
                df.withColumn("__w", F.explode(windows))
                .withColumn("window_start", F.col("__w.s"))
                .withColumn("window_end", F.col("__w.e"))
                .drop("__w")
            )
        else:
            s, e = assigned
            df = df.withColumn("window_start", s).withColumn("window_end", e)
        if self.windowfn.merging:
            if not self.key_cols:
                raise ValueError("merging WindowFn needs key_cols to merge within")
            if type(self.windowfn).merge is not WindowFn.merge:
                df = merge_proto_windows_general(df, self.key_cols, self.windowfn)
            else:
                df = merge_proto_windows(
                    df, self.key_cols, slack=self.windowfn.slack
                )
        return PCollection(df, pcoll.pipeline)
