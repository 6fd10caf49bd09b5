"""Property-based fuzz of the trigger VM (streaming/triggers.py).

The reference validates its trigger driver two ways: the
trigger_transcripts.yaml corpus (we run it directly —
test_trigger_transcripts.py) and targeted unit cases (test_triggers.py).
This file adds the third leg the reference's TriggerTest also leans on:
randomized scripts. Hypothesis drives random element/watermark/
processing-time interleavings through random trigger trees and asserts
the semantics that hold for EVERY trigger:

- panes never doublecount in DISCARDING mode (per-window pane sums are
  disjoint element subsets),
- accumulating panes are monotone supersets,
- pane indexes are gapless per window, with at most one ON_TIME pane,
- the VM never throws and its per-window trigger state stays
  JSON-serializable (the Spark state-cell contract), and
- DefaultTrigger over fixed windows reproduces an independently written
  20-line model exactly (one on-time pane per non-empty window at
  watermark crossing, one late pane per late bundle).

Sessions (merging windows) are fuzzed with the full composite grammar,
which pins the round-4 ADVICE fix: merge_states is defined for
composites/AfterProcessingTime, so random merges must never raise.
"""

from __future__ import annotations

import json
import math
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_beam_spark.streaming.triggers import (
    ACCUMULATING,
    DISCARDING,
    ON_TIME,
    AfterAll,
    AfterAny,
    AfterCount,
    AfterEach,
    AfterProcessingTime,
    AfterWatermark,
    DefaultTrigger,
    Repeatedly,
    TriggerDriver,
)

# -- strategies -------------------------------------------------------------

leaf_triggers = st.one_of(
    st.just(DefaultTrigger()),
    st.integers(1, 3).map(AfterCount),
    st.just(AfterWatermark()),
    st.floats(1.0, 5.0).map(AfterProcessingTime),
)

triggers = st.recursive(
    leaf_triggers,
    lambda sub: st.one_of(
        st.tuples(sub).map(lambda t: Repeatedly(t[0])),
        st.tuples(sub, sub).map(AfterAny),
        st.tuples(sub, sub).map(AfterAll),
        st.tuples(sub, sub).map(AfterEach),
        st.tuples(
            st.integers(1, 3).map(AfterCount) | st.none(),
            st.integers(1, 3).map(AfterCount) | st.none(),
        ).map(lambda el: AfterWatermark(early=el[0], late=el[1])),
    ),
    max_leaves=4,
)

# Scripts: a sequence of ops. Element batches carry integer timestamps
# (exactness) and POSITIVE integer values so "sum <= total" detects any
# doublecount. Watermark/processing-time advances are made monotone by
# construction (cumulative).
ops = st.lists(
    st.one_of(
        st.lists(
            st.tuples(st.integers(0, 39), st.integers(1, 5)),
            min_size=1,
            max_size=4,
        ).map(lambda b: ("elements", b)),
        st.integers(1, 15).map(lambda d: ("watermark", d)),
        st.floats(0.5, 5.0).map(lambda d: ("ptime", d)),
    ),
    min_size=1,
    max_size=12,
)


def run_script(driver: TriggerDriver, script) -> list:
    panes = []
    wm = -math.inf
    pt = 0.0
    for kind, arg in script:
        if kind == "elements":
            panes.extend(driver.on_elements([(float(t), float(v)) for t, v in arg]))
        elif kind == "watermark":
            wm = arg if wm == -math.inf else wm + arg
            panes.extend(driver.advance_watermark(float(wm)))
        else:
            pt += arg
            panes.extend(driver.advance_processing_time(pt))
    return panes


# -- universal invariants ---------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    trigger=triggers,
    script=ops,
    mode=st.sampled_from([DISCARDING, ACCUMULATING]),
    lateness=st.sampled_from([0.0, 5.0, 100.0]),
)
def test_fixed_window_invariants(trigger, script, mode, lateness):
    d = TriggerDriver(10, trigger, mode, allowed_lateness=lateness)
    panes = run_script(d, script)

    total_in = sum(v for kind, arg in script if kind == "elements" for _, v in arg)
    n_in = sum(len(arg) for kind, arg in script if kind == "elements")

    by_window = defaultdict(list)
    for p in panes:
        assert p.count >= 0 and p.sum >= 0
        by_window[p.window_start].append(p)

    for ws, ps in by_window.items():
        # gapless pane numbering, at most one on-time pane per window
        assert [p.index for p in ps] == list(range(len(ps))), ps
        assert sum(1 for p in ps if p.timing == ON_TIME) <= 1
        if mode == DISCARDING:
            # panes consume disjoint element subsets
            assert sum(p.count for p in ps) <= n_in
            assert sum(p.sum for p in ps) <= total_in + 1e-9
        else:
            # accumulating panes are monotone supersets
            counts = [p.count for p in ps]
            assert counts == sorted(counts), counts
            assert all(p.sum <= total_in + 1e-9 for p in ps)

    # Spark state-cell contract: per-window trigger state stays
    # JSON-serializable after any script
    for stw in d.windows.values():
        json.dumps(stw.trigger_state)


@settings(max_examples=150, deadline=None)
@given(
    trigger=triggers,
    script=ops,
    mode=st.sampled_from([DISCARDING, ACCUMULATING]),
    gap=st.sampled_from([3.0, 5.0]),
)
def test_session_merge_never_corrupts(trigger, script, mode, gap):
    """Random merging-session runs with the FULL composite grammar:
    merge_states must be defined (round-4 ADVICE fix) and the universal
    pane invariants must survive arbitrary merges."""
    d = TriggerDriver(10, trigger, mode, allowed_lateness=100.0, session_gap=gap)
    panes = run_script(d, script)
    total_in = sum(v for kind, arg in script if kind == "elements" for _, v in arg)
    for p in panes:
        assert p.count >= 0
        assert p.sum <= total_in + 1e-9
    for stw in d.windows.values():
        json.dumps(stw.trigger_state)


# -- exact differential vs an independent model -----------------------------


def default_trigger_model(script):
    """Independent 20-line model of DefaultTrigger / fixed(10) /
    DISCARDING / lateness=0: one ON_TIME pane per non-empty window when
    the watermark first reaches its end; elements arriving at/after
    wm >= end are dropped."""
    wm = -math.inf
    pending: dict[float, list[int]] = defaultdict(list)
    fired = set()
    out = []
    for kind, arg in script:
        if kind == "elements":
            for t, v in arg:
                ws = (t // 10) * 10
                if wm >= ws + 10:  # expired (lateness 0)
                    continue
                if ws not in fired:
                    pending[ws].append(v)
        elif kind == "watermark":
            wm = arg if wm == -math.inf else wm + arg
            for ws in sorted(pending):
                if wm >= ws + 10 and ws not in fired:
                    vals = pending.pop(ws)
                    fired.add(ws)
                    out.append((float(ws), 0, ON_TIME, len(vals), float(sum(vals))))
    return out


@settings(max_examples=200, deadline=None)
@given(script=ops)
def test_default_trigger_matches_model(script):
    d = TriggerDriver(10, DefaultTrigger(), DISCARDING, allowed_lateness=0.0)
    panes = run_script(d, script)
    got = [
        (p.window_start, p.index, p.timing, p.count, p.sum)
        for p in panes
        if p.timing == ON_TIME
    ]
    assert got == default_trigger_model(script)


def sessions_model(batches, gap):
    """Islands model for Sessions + DefaultTrigger + DISCARDING: union
    the per-element proto-windows [ts, ts+gap), one ON_TIME pane per
    merged island when the watermark passes its end."""
    ts = sorted(t for b in batches for t, _ in b)
    vals = defaultdict(list)
    for b in batches:
        for t, v in b:
            vals[t].append(v)
    islands = []
    for t in ts:
        if islands and t < islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], t + gap)
            islands[-1][2].append(t)
        else:
            islands.append([t, t + gap, [t]])
    out = []
    for lo, hi, members in islands:
        n = sum(len(vals[m]) for m in set(members))
        s = sum(v for m in set(members) for v in vals[m])
        out.append((float(lo), float(hi), n, float(s)))
    return sorted(out)


@settings(max_examples=200, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 39), st.integers(1, 5)),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    ),
    gap=st.sampled_from([2.0, 3.0, 5.0]),
)
def test_sessions_default_trigger_matches_islands_model(batches, gap):
    """Merging sessions, exact: deliver all elements (across several
    bundles, so merging happens incrementally), then close the world —
    the ON_TIME panes must be exactly the gap-islands of the timestamp
    multiset, each with the island's full count/sum and window extent."""
    d = TriggerDriver(10, DefaultTrigger(), DISCARDING, allowed_lateness=0.0,
                      session_gap=gap)
    panes = []
    for b in batches:
        panes.extend(d.on_elements([(float(t), float(v)) for t, v in b]))
    panes.extend(d.advance_watermark(10_000.0))
    got = sorted(
        (p.window_start, p.window_end, p.count, p.sum)
        for p in panes
        if p.timing == ON_TIME and p.count > 0
    )
    assert got == sessions_model(batches, gap)
