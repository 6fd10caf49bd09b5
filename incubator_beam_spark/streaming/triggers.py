"""The trigger VM: Beam's windowing-strategy trigger semantics as a
reusable per-(key, window) kernel.

Reference surface (SURVEY.md §2.6): ``transforms/trigger.py`` —
DefaultTrigger (:313), AfterWatermark (:510), AfterProcessingTime (:362),
AfterCount (:638), Repeatedly (:695), AfterAny/AfterAll/AfterEach
(:835,852,863), AccumulationMode (:72), and the runner-side
GeneralTriggerDriver (:1341) / trigger_manager.py. This is the one piece
of the streaming model Spark has no counterpart for (Spark fires exactly
once per watermark close in append mode); everything else in §2.6 rides
on native watermarks + window functions.

Design: the kernel is PURE PYTHON and deterministic — elements,
watermark advances, and processing-time advances are explicit inputs,
outputs are Pane records. That makes the semantics unit-testable as
scripted transcripts (the reference validates against
``testing/data/trigger_transcripts.yaml`` the same way). The Spark
adapter (``triggered_window_agg``) embeds the kernel in
``applyInPandasWithState``: one state cell per key holds all of that
key's open windows; watermark/processing-time come from GroupState.

Scale: state per (key, window) is O(#trigger nodes) counters plus the
running SUM/COUNT accumulator — elements are never buffered (combining
happens eagerly, as Beam's combiner-lifted CombinePerKey does), so a
hot key with a million elements per window holds ~100 bytes of state.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

# --------------------------------------------------------------------------
# Trigger specs (mirrors transforms/trigger.py class-for-class)
# --------------------------------------------------------------------------


class Trigger:
    """Base trigger. Subclasses implement the 4 VM hooks over a dict
    state cell (JSON-serializable so Spark state can hold it)."""

    def new_state(self) -> dict:
        return {}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        pass

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        raise NotImplementedError

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        """Reset/advance state after firing; returns True if FINISHED."""
        return True

    def merge_states(self, states: list[dict]) -> dict:
        """Combine the trigger states of merging windows (Sessions):
        mirrors the reference's ``Trigger.on_merge`` (trigger.py). Only
        triggers with a defined merge story implement this; others raise
        so a merging WindowFn cannot silently corrupt state."""
        raise NotImplementedError(
            f"{type(self).__name__} does not define merging semantics"
        )


@dataclass(frozen=True)
class AfterWatermark(Trigger):
    """Fire once when the watermark passes end-of-window; optional early
    (before) and late (after) sub-triggers (reference trigger.py:510).
    With no late trigger the window finishes at the on-time pane."""

    early: "Trigger | None" = None
    late: "Trigger | None" = None

    def new_state(self) -> dict:
        st: dict = {"on_time_fired": False}
        if self.early:
            st["early"] = self.early.new_state()
        if self.late:
            st["late"] = self.late.new_state()
        return st

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        if not st["on_time_fired"] and self.early:
            self.early.on_element(st["early"], ctx)
        elif st["on_time_fired"] and self.late:
            self.late.on_element(st["late"], ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        if not st["on_time_fired"]:
            if ctx.watermark >= ctx.window_end:
                return True
            return bool(self.early) and self.early.should_fire(st["early"], ctx)
        return bool(self.late) and self.late.should_fire(st["late"], ctx)

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        if not st["on_time_fired"]:
            if ctx.watermark >= ctx.window_end:
                st["on_time_fired"] = True
                return self.late is None
            # early firing: restart the early trigger (Repeatedly semantics)
            if self.early.on_fire(st["early"], ctx):
                st["early"] = self.early.new_state()
            return False
        if self.late.on_fire(st["late"], ctx):
            st["late"] = self.late.new_state()
        return False

    def merge_states(self, states: list[dict]) -> dict:
        """Beam on_merge: if any merging window already fired on time the
        result window has not (its end moved later), so the on-time state
        resets; sub-trigger states merge recursively (trigger.py:510)."""
        st: dict = {"on_time_fired": False}
        if self.early:
            st["early"] = self.early.merge_states([s["early"] for s in states])
        if self.late:
            st["late"] = self.late.merge_states([s["late"] for s in states])
        return st


class DefaultTrigger(AfterWatermark):
    """Beam's default (trigger.py:313): on-time at the watermark, then one
    late pane per incoming late bundle (== AfterWatermark(late=Always))."""

    def __init__(self) -> None:
        object.__setattr__(self, "early", None)
        object.__setattr__(self, "late", Always())


@dataclass(frozen=True)
class AfterCount(Trigger):
    """Fire when >= n elements arrived since the last firing
    (trigger.py:638). One-shot unless wrapped in Repeatedly."""

    n: int

    def new_state(self) -> dict:
        return {"seen": 0}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        st["seen"] += 1

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return st["seen"] >= self.n

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        st["seen"] = 0
        return True

    def merge_states(self, states: list[dict]) -> dict:
        # element counts are a combining state: merging sums them
        # (reference AfterCount rides on a COUNT CombiningValueStateSpec)
        return {"seen": sum(s["seen"] for s in states)}


@dataclass(frozen=True)
class AfterProcessingTime(Trigger):
    """Fire when processing time reaches first-element-time + delay
    (trigger.py:362). One-shot unless wrapped in Repeatedly."""

    delay: float = 0.0

    def new_state(self) -> dict:
        return {"deadline": None}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        if st["deadline"] is None:
            st["deadline"] = ctx.processing_time + self.delay

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return st["deadline"] is not None and ctx.processing_time >= st["deadline"]

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        st["deadline"] = None
        return True

    def merge_states(self, states: list[dict]) -> dict:
        # reference AfterProcessingTime.on_merge: the merged window keeps
        # the EARLIEST pending fire time (a set timer is never delayed by
        # a merge); all-None stays unarmed until the next element.
        pending = [s["deadline"] for s in states if s.get("deadline") is not None]
        return {"deadline": min(pending) if pending else None}


class Always(Trigger):
    """Fire on every bundle with pending input (trigger.py:414)."""

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return ctx.pending > 0

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return False

    def merge_states(self, states: list[dict]) -> dict:
        return {}


class _Never(Trigger):
    """Only the final (GC-time) firing emits (trigger.py:458)."""

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return False

    def merge_states(self, states: list[dict]) -> dict:
        return {}


@dataclass(frozen=True)
class Repeatedly(Trigger):
    """Re-arm the sub-trigger forever (trigger.py:695)."""

    sub: Trigger

    def new_state(self) -> dict:
        return {"sub": self.sub.new_state()}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        self.sub.on_element(st["sub"], ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return self.sub.should_fire(st["sub"], ctx)

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        if self.sub.on_fire(st["sub"], ctx):
            st["sub"] = self.sub.new_state()
        return False

    def merge_states(self, states: list[dict]) -> dict:
        return {"sub": self.sub.merge_states([s["sub"] for s in states])}


@dataclass(frozen=True)
class AfterAny(Trigger):
    """Fire when ANY sub-trigger fires; finish when any finishes
    (trigger.py:835)."""

    subs: tuple

    def new_state(self) -> dict:
        return {"subs": [s.new_state() for s in self.subs]}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        for s, ss in zip(self.subs, st["subs"]):
            s.on_element(ss, ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return any(s.should_fire(ss, ctx) for s, ss in zip(self.subs, st["subs"]))

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        finished = False
        for s, ss in zip(self.subs, st["subs"]):
            if s.should_fire(ss, ctx):
                finished = s.on_fire(ss, ctx) or finished
        return finished

    def merge_states(self, states: list[dict]) -> dict:
        # composite on_merge (reference ParallelTriggerFn.on_merge):
        # merge each sub-trigger's states position-wise, recursively.
        return {
            "subs": [
                s.merge_states([st["subs"][i] for st in states])
                for i, s in enumerate(self.subs)
            ]
        }


@dataclass(frozen=True)
class AfterAll(Trigger):
    """Fire when ALL sub-triggers are ready; finish when all finish
    (trigger.py:852)."""

    subs: tuple

    def new_state(self) -> dict:
        return {"subs": [s.new_state() for s in self.subs], "fin": [False] * len(self.subs)}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        for s, ss in zip(self.subs, st["subs"]):
            s.on_element(ss, ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return all(
            fin or s.should_fire(ss, ctx)
            for s, ss, fin in zip(self.subs, st["subs"], st["fin"])
        )

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        for i, (s, ss) in enumerate(zip(self.subs, st["subs"])):
            if not st["fin"][i]:
                st["fin"][i] = s.on_fire(ss, ctx)
        return all(st["fin"])

    def merge_states(self, states: list[dict]) -> dict:
        # sub-states merge position-wise; a sub counts as finished in the
        # merged window only if it finished in EVERY merging window (the
        # merge brought in data the unfinished copies still owe a fire
        # for — the conservative reading of ParallelTriggerFn.on_merge).
        return {
            "subs": [
                s.merge_states([st["subs"][i] for st in states])
                for i, s in enumerate(self.subs)
            ],
            "fin": [
                all(st["fin"][i] for st in states) for i in range(len(self.subs))
            ],
        }


@dataclass(frozen=True)
class AfterEach(Trigger):
    """Run sub-triggers in sequence, advancing as each finishes
    (trigger.py:863)."""

    subs: tuple

    def new_state(self) -> dict:
        return {"idx": 0, "sub": self.subs[0].new_state()}

    def _cur(self, st: dict) -> "Trigger | None":
        return self.subs[st["idx"]] if st["idx"] < len(self.subs) else None

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        cur = self._cur(st)
        if cur:
            cur.on_element(st["sub"], ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        cur = self._cur(st)
        return bool(cur) and cur.should_fire(st["sub"], ctx)

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        cur = self._cur(st)
        if cur and cur.on_fire(st["sub"], ctx):
            st["idx"] += 1
            nxt = self._cur(st)
            st["sub"] = nxt.new_state() if nxt else {}
        return st["idx"] >= len(self.subs)

    def merge_states(self, states: list[dict]) -> dict:
        # the merged window resumes from the LEAST-advanced sequence
        # position (merging cannot skip a pending sub-trigger's fire);
        # only windows sitting AT that position contribute sub-state —
        # further-advanced windows no longer hold state for it.
        idx = min(s["idx"] for s in states)
        if idx >= len(self.subs):
            return {"idx": idx, "sub": {}}
        at = [s["sub"] for s in states if s["idx"] == idx]
        return {"idx": idx, "sub": self.subs[idx].merge_states(at)}


@dataclass(frozen=True)
class OrFinally(Trigger):
    """``main.or_finally(until)`` (reference trigger.py:944 ``_OrFinally``):
    behave as ``main`` until ``until`` is ready, at which point fire one
    last pane and FINISH the trigger (the window then only emits its
    GC-time pane, if any)."""

    main: Trigger
    until: Trigger

    def new_state(self) -> dict:
        return {"main": self.main.new_state(), "until": self.until.new_state()}

    def on_element(self, st: dict, ctx: "TriggerContext") -> None:
        self.main.on_element(st["main"], ctx)
        self.until.on_element(st["until"], ctx)

    def should_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        return self.until.should_fire(st["until"], ctx) or self.main.should_fire(
            st["main"], ctx
        )

    def on_fire(self, st: dict, ctx: "TriggerContext") -> bool:
        if self.until.should_fire(st["until"], ctx):
            return True  # finished: the 'until' firing is terminal
        return self.main.on_fire(st["main"], ctx)

    def merge_states(self, states: list[dict]) -> dict:
        return {
            "main": self.main.merge_states([s["main"] for s in states]),
            "until": self.until.merge_states([s["until"] for s in states]),
        }


def _or_finally(self: Trigger, until: Trigger) -> OrFinally:
    return OrFinally(self, until)


Trigger.or_finally = _or_finally  # fluent form, like the reference API


# --------------------------------------------------------------------------
# The driver (reference GeneralTriggerDriver, trigger.py:1341)
# --------------------------------------------------------------------------

EARLY, ON_TIME, LATE = "EARLY", "ON_TIME", "LATE"
DISCARDING, ACCUMULATING = "DISCARDING", "ACCUMULATING"


@dataclass
class TriggerContext:
    window_end: float
    watermark: float
    processing_time: float
    pending: int


@dataclass
class Pane:
    window_start: float
    index: int
    timing: str
    count: int
    sum: float
    is_final: bool = False
    # set only when the driver runs with track_values / a timestamp
    # combiner (the transcript-conformance surface); None otherwise
    values: "tuple | None" = None
    output_ts: "float | None" = None
    nonspeculative_index: "int | None" = None
    window_end: "float | None" = None


@dataclass
class WindowState:
    trigger_state: dict
    pane_index: int = 0
    on_time_done: bool = False
    pending_count: int = 0
    pending_sum: float = 0.0
    acc_count: int = 0
    acc_sum: float = 0.0
    closed: bool = False
    #: window end; None means "derive as start + window_size" (fixed mode).
    #: None (not 0.0) is the sentinel: a merged session ending exactly at
    #: timestamp 0 is a real end (negative-timestamp elements).
    end: float | None = None
    pending_values: list = field(default_factory=list)
    acc_values: list = field(default_factory=list)
    #: per-pane watermark holds (element output times eligible to hold)
    holds: list = field(default_factory=list)
    #: count of non-EARLY panes already emitted (PaneInfo.nonspeculative_index)
    nonspec_count: int = 0


class TriggerDriver:
    """Per-key trigger VM over fixed windows with a SUM/COUNT combiner.

    Deterministic inputs: ``on_elements`` (event-time values),
    ``advance_watermark``, ``advance_processing_time``. Output: ``Pane``
    records. Window assignment is fixed-size tumbling (the general
    WindowFn case composes upstream — this kernel only needs window
    boundaries).
    """

    def __init__(
        self,
        window_size: float,
        trigger: Trigger | None = None,
        accumulation: str = DISCARDING,
        allowed_lateness: float = 0.0,
        slide: float | None = None,
        session_gap: float | None = None,
        timestamp_combiner: str | None = None,
        output_time_transform=None,
        track_values: bool = False,
    ) -> None:
        """``session_gap`` switches assignment to merging session windows
        (Sessions, window.py:537) — ``window_size`` is ignored for
        assignment then. ``timestamp_combiner`` ('EOW' | 'EARLIEST' |
        'LATEST') computes per-pane output timestamps with Beam
        watermark-hold semantics (an element behind the watermark at
        arrival cannot hold, so the pane falls back to end-of-window);
        ``output_time_transform`` maps element ts -> hold ts first (the
        WindowFn.get_transformed_output_time hook). ``track_values``
        collects the element timestamps per pane — the transcript
        conformance surface; production paths leave it off (the kernel
        stays a ~100-byte combining state)."""
        self.window_size = window_size
        self.slide = slide if slide is not None else window_size
        if self.slide > window_size:
            raise ValueError("slide must be <= window_size")
        if session_gap is not None and slide is not None:
            raise ValueError("session_gap and slide are mutually exclusive")
        self.session_gap = session_gap
        self.trigger = trigger or DefaultTrigger()
        self.accumulation = accumulation
        self.allowed_lateness = allowed_lateness
        self.timestamp_combiner = timestamp_combiner
        self.output_time_transform = output_time_transform
        self.track_values = track_values
        self.windows: dict[float, WindowState] = {}
        self.watermark = float("-inf")
        self.processing_time = 0.0

    def _end(self, ws: float, st: WindowState) -> float:
        return st.end if st.end is not None else ws + self.window_size

    # -- input hooks --------------------------------------------------------

    def on_elements(self, ts_values: list[tuple[float, float]]) -> list[Pane]:
        """Add (event_ts, value) elements; returns panes fired by them."""
        panes: list[Pane] = []
        touched: list[float] = []
        for ts, v in ts_values:
            if self.session_gap is not None:
                ws = self._add_session(ts, v)
                if ws is not None and ws not in touched:
                    touched.append(ws)
                continue
            for ws in self._assign(ts):
                end = ws + self.window_size
                if self.watermark >= end + self.allowed_lateness:
                    continue  # expired: dropped (trigger.py GC / lateness horizon)
                st = self.windows.get(ws)
                if st is None:
                    st = self.windows[ws] = WindowState(self.trigger.new_state())
                if st.closed:
                    continue
                self._add_to_window(ws, st, ts, v)
                if ws not in touched:
                    touched.append(ws)
        for ws in touched:
            if ws in self.windows:
                panes.extend(self._maybe_fire(ws))
        return panes

    def _add_to_window(self, ws: float, st: WindowState, ts: float, v: float) -> None:
        st.pending_count += 1
        st.pending_sum += v
        st.acc_count += 1
        st.acc_sum += v
        if self.track_values:
            st.pending_values.append(ts)
            st.acc_values.append(ts)
        if self.timestamp_combiner in ("EARLIEST", "LATEST"):
            hold = (
                self.output_time_transform(ts)
                if self.output_time_transform
                else ts
            )
            # Beam watermark-hold rule: an element at/behind the input
            # watermark cannot hold the output watermark; the pane then
            # falls back to end-of-window.
            if ts >= self.watermark:
                st.holds.append(hold)
        self.trigger.on_element(st.trigger_state, self._ctx(ws, st))

    def _add_session(self, ts: float, v: float) -> float | None:
        """Sessions assignment with merging (window.py:537 + the
        WindowFn.merge contract): the element's proto-window
        [ts, ts+gap) coalesces with every overlapping open window. If
        the merged extent equals an existing window's, the element is
        absorbed (pane numbering continues); otherwise the merged window
        is NEW — pane index and on-time status restart, trigger states
        merge via Trigger.merge_states, values/counters combine."""
        gap = self.session_gap
        if self.watermark >= ts + gap + self.allowed_lateness:
            return None  # expired
        lo, hi = ts, ts + gap
        overlapping = [
            (ws, st)
            for ws, st in self.windows.items()
            if not st.closed and ws < hi and self._end(ws, st) > lo
        ]
        if len(overlapping) == 1:
            ws, st = overlapping[0]
            if ws <= lo and self._end(ws, st) >= hi:
                # fully contained: absorb, window identity unchanged
                self._add_to_window(ws, st, ts, v)
                return ws
        new_lo = min([lo] + [ws for ws, _ in overlapping])
        new_hi = max([hi] + [self._end(ws, st) for ws, st in overlapping])
        merged = WindowState(
            trigger_state=self.trigger.merge_states(
                [st.trigger_state for _, st in overlapping]
            )
            if overlapping
            else self.trigger.new_state(),
            pane_index=0,
            on_time_done=False,
            pending_count=sum(st.pending_count for _, st in overlapping),
            pending_sum=sum(st.pending_sum for _, st in overlapping),
            acc_count=sum(st.acc_count for _, st in overlapping),
            acc_sum=sum(st.acc_sum for _, st in overlapping),
            end=new_hi,
        )
        for _, st in overlapping:
            merged.pending_values.extend(st.pending_values)
            merged.acc_values.extend(st.acc_values)
            merged.holds.extend(st.holds)
        for ws, _ in overlapping:
            del self.windows[ws]
        self.windows[new_lo] = merged
        self._add_to_window(new_lo, merged, ts, v)
        return new_lo

    def advance_watermark(self, wm: float) -> list[Pane]:
        self.watermark = wm
        panes: list[Pane] = []
        for ws in sorted(self.windows):
            panes.extend(self._maybe_fire(ws))
            panes.extend(self._maybe_gc(ws))
        return panes

    def advance_processing_time(self, pt: float) -> list[Pane]:
        self.processing_time = pt
        panes: list[Pane] = []
        for ws in sorted(self.windows):
            panes.extend(self._maybe_fire(ws))
        return panes

    # -- internals -----------------------------------------------------------

    def _assign(self, ts: float) -> list[float]:
        """WindowFn.assign (reference window.py:119): tumbling -> one
        window; sliding -> size/slide windows per element, exactly like
        SlidingWindows.assign (window.py:463) and F.window(ts, size,
        slide)."""
        last_start = (ts // self.slide) * self.slide
        starts = []
        s = last_start
        while s > ts - self.window_size:
            starts.append(s)
            s -= self.slide
        return starts

    def _ctx(self, ws: float, st: WindowState) -> TriggerContext:
        return TriggerContext(
            window_end=self._end(ws, st),
            watermark=self.watermark,
            processing_time=self.processing_time,
            pending=st.pending_count,
        )

    def _timing(self, ws: float, st: WindowState) -> str:
        if self.watermark < self._end(ws, st):
            return EARLY
        return LATE if st.on_time_done else ON_TIME

    def _pane_output_ts(self, ws: float, st: WindowState) -> float | None:
        """Per-pane output timestamp under the configured combiner
        (window.py:95 TimestampCombiner + watermark-hold fallback)."""
        if self.timestamp_combiner is None:
            return None
        eow = self._end(ws, st) - 1  # max_timestamp for integral bounds
        if self.timestamp_combiner == "EOW" or not st.holds:
            return eow
        if self.timestamp_combiner == "EARLIEST":
            return min(st.holds)
        return max(st.holds)  # LATEST

    def _emit(
        self, ws: float, st: WindowState, timing: str, count: int,
        total: float, is_final: bool,
    ) -> Pane:
        values = None
        if self.track_values:
            values = tuple(
                st.acc_values if self.accumulation == ACCUMULATING
                else st.pending_values
            )
        nonspec = -1 if timing == EARLY else st.nonspec_count
        pane = Pane(
            ws, st.pane_index, timing, count, total, is_final,
            values=values,
            output_ts=self._pane_output_ts(ws, st),
            nonspeculative_index=nonspec,
            window_end=self._end(ws, st),
        )
        st.pane_index += 1
        if timing != EARLY:
            st.nonspec_count += 1
        st.holds.clear()
        return pane

    def _maybe_fire(self, ws: float) -> list[Pane]:
        st = self.windows.get(ws)
        panes: list[Pane] = []
        if st is None or st.closed:
            return panes
        # loop: a single advance can justify several firings (e.g. AfterEach)
        # — but only while each firing makes STATE PROGRESS. A repeated
        # level-triggered condition (Repeatedly(AfterWatermark()) once the
        # watermark passed the end, Repeatedly(AfterProcessingTime(0)), …)
        # resets to an identical state with should_fire still true; Beam's
        # runners fire such triggers once per stimulus (element bundle /
        # timer), not in a busy loop, so a revisited state breaks out.
        seen_states: set[str] = set()
        while not st.closed and self.trigger.should_fire(
            st.trigger_state, self._ctx(ws, st)
        ):
            state_key = json.dumps(st.trigger_state, sort_keys=True)
            if state_key in seen_states:
                break
            seen_states.add(state_key)
            timing = self._timing(ws, st)
            if self.accumulation == ACCUMULATING:
                count, total = st.acc_count, st.acc_sum
            else:
                count, total = st.pending_count, st.pending_sum
            finished = self.trigger.on_fire(st.trigger_state, self._ctx(ws, st))
            if count > 0 or timing == ON_TIME:
                panes.append(self._emit(ws, st, timing, count, total, finished))
            if timing == ON_TIME:
                st.on_time_done = True
            st.pending_count, st.pending_sum = 0, 0.0
            st.pending_values.clear()
            if finished:
                st.closed = True
        return panes

    def _maybe_gc(self, ws: float) -> list[Pane]:
        st = self.windows.get(ws)
        if st is None:
            return []
        if self.watermark >= self._end(ws, st) + self.allowed_lateness:
            del self.windows[ws]
            if not st.closed and st.pending_count > 0:
                # closing behavior: emit the final pane with leftovers
                count = st.acc_count if self.accumulation == ACCUMULATING else st.pending_count
                total = st.acc_sum if self.accumulation == ACCUMULATING else st.pending_sum
                return [self._emit(ws, st, self._timing(ws, st), count, total, True)]
        return []

    def next_deadline(self) -> float | None:
        """Earliest event-time instant at which an open window needs a
        wake-up even without new data: its end (on-time pane) or its GC
        horizon (final pane / cleanup)."""
        deadlines = [
            self._end(ws, st)
            if not st.on_time_done
            else self._end(ws, st) + self.allowed_lateness
            for ws, st in self.windows.items()
            if not st.closed or not st.on_time_done
        ]
        # closed windows still need GC, but nothing will fire: include them
        deadlines += [
            self._end(ws, st) + self.allowed_lateness
            for ws, st in self.windows.items()
            if st.closed
        ]
        return min(deadlines) if deadlines else None

    # -- state (de)serialization for the Spark adapter ----------------------

    def dump(self) -> str:
        return json.dumps(
            {
                "wm": self.watermark if self.watermark != float("-inf") else None,
                "windows": {
                    str(ws): {
                        "t": st.trigger_state,
                        "p": st.pane_index,
                        "o": st.on_time_done,
                        "pc": st.pending_count,
                        "ps": st.pending_sum,
                        "ac": st.acc_count,
                        "as": st.acc_sum,
                        "c": st.closed,
                        "e": st.end,
                        "pv": st.pending_values,
                        "av": st.acc_values,
                        "h": st.holds,
                        "ns": st.nonspec_count,
                    }
                    for ws, st in self.windows.items()
                },
            }
        )

    def load(self, blob: str) -> "TriggerDriver":
        d = json.loads(blob)
        self.watermark = d["wm"] if d["wm"] is not None else float("-inf")
        self.windows = {
            float(ws): WindowState(
                trigger_state=s["t"],
                pane_index=s["p"],
                on_time_done=s["o"],
                pending_count=s["pc"],
                pending_sum=s["ps"],
                acc_count=s["ac"],
                acc_sum=s["as"],
                closed=s["c"],
                end=s.get("e"),
                pending_values=s.get("pv", []),
                acc_values=s.get("av", []),
                holds=s.get("h", []),
                nonspec_count=s.get("ns", 0),
            )
            for ws, s in d["windows"].items()
        }
        return self


# --------------------------------------------------------------------------
# Spark adapter
# --------------------------------------------------------------------------


def triggered_window_agg(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_size: float,
    trigger: Trigger | None = None,
    accumulation: str = DISCARDING,
    allowed_lateness: float = 0.0,
):
    """Windowed SUM/COUNT per key under full Beam trigger semantics, as a
    streaming transform (``applyInPandasWithState``).

    Output rows: (key, window_start, pane_index, timing, n, total) — one
    per pane, exactly as the kernel fires them. Spark's own watermark
    (``withWatermark`` upstream) feeds the kernel via
    ``GroupState.getCurrentWatermarkMs``; processing time via
    ``getCurrentProcessingTimeMs``. With a watermark, the adapter arms an
    EventTimeTimeout at the kernel's next deadline so on-time/GC panes
    fire even when the key receives no further data (Spark only invokes
    the state fn for keys present in a micro-batch otherwise).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # EventTimeTimeout is only legal when the stream has a watermark;
    # detect it from the analyzed plan.
    has_watermark = "EventTimeWatermark" in df._jdf.queryExecution().analyzed().toString()
    timeout = "EventTimeTimeout" if has_watermark else "NoTimeout"

    # key field derives from the input schema (ADVICE round 1: a
    # hardcoded LongType corrupts string/other key types at runtime)
    key_field = T.StructField("key", df.schema[key_col].dataType)
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("window_start", T.DoubleType()),
            T.StructField("pane_index", T.IntegerType()),
            T.StructField("timing", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("blob", T.StringType())])

    def fn(key, pdfs, state):
        driver = TriggerDriver(window_size, trigger, accumulation, allowed_lateness)
        if state.exists:
            driver.load(state.get[0])
        driver.processing_time = state.getCurrentProcessingTimeMs() / 1000.0
        wm = state.getCurrentWatermarkMs() / 1000.0 if has_watermark else float("-inf")
        panes: list[Pane] = []
        if not state.hasTimedOut:
            elems: list[tuple[float, float]] = []
            for pdf in pdfs:
                ts_s = pdf[ts_col].astype("int64") / 1e9  # epoch seconds
                elems.extend(zip(ts_s, pdf[value_col].astype(float)))
            panes.extend(driver.on_elements(elems))
        if wm > driver.watermark:
            panes.extend(driver.advance_watermark(wm))
        panes.extend(driver.advance_processing_time(driver.processing_time))
        state.update((driver.dump(),))
        if timeout == "EventTimeTimeout":
            deadline = driver.next_deadline()
            if deadline is not None:
                # timestamps must be strictly beyond the current watermark
                state.setTimeoutTimestamp(max(int(deadline * 1000), int(wm * 1000) + 1))
        if panes:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(panes),
                    "window_start": [p.window_start for p in panes],
                    "pane_index": [p.index for p in panes],
                    "timing": [p.timing for p in panes],
                    "n": [p.count for p in panes],
                    "total": [p.sum for p in panes],
                }
            )

    return (
        df.groupBy(F.col(key_col))
        .applyInPandasWithState(fn, out_schema, state_schema, "Append", timeout)
    )
