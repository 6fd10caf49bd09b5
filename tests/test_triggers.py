"""Trigger VM transcripts: scripted element/watermark/processing-time
sequences with exact expected panes — the analog of the reference's
``testing/data/trigger_transcripts.yaml`` corpus (driven by
``transforms/trigger_test.py:1299``).

Window size 10, keyless (the kernel is already per-key). Each pane is
asserted as (window_start, pane_index, timing, count, sum).
"""

from __future__ import annotations

import pytest

from incubator_beam_spark.streaming.triggers import (
    ACCUMULATING,
    DISCARDING,
    EARLY,
    LATE,
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
    _Never,
)


def pane_tuples(panes):
    return [(p.window_start, p.index, p.timing, p.count, p.sum) for p in panes]


def test_default_trigger_on_time_then_late():
    d = TriggerDriver(10, DefaultTrigger(), allowed_lateness=100)
    assert d.on_elements([(1, 1.0), (5, 2.0)]) == []
    assert pane_tuples(d.advance_watermark(10)) == [(0, 0, ON_TIME, 2, 3.0)]
    # late element -> late pane per bundle
    assert pane_tuples(d.on_elements([(3, 5.0)])) == [(0, 1, LATE, 1, 5.0)]
    assert pane_tuples(d.on_elements([(4, 1.0)])) == [(0, 2, LATE, 1, 1.0)]


def test_default_trigger_accumulating():
    d = TriggerDriver(10, DefaultTrigger(), ACCUMULATING, allowed_lateness=100)
    d.on_elements([(1, 1.0), (5, 2.0)])
    assert pane_tuples(d.advance_watermark(10)) == [(0, 0, ON_TIME, 2, 3.0)]
    assert pane_tuples(d.on_elements([(3, 5.0)])) == [(0, 1, LATE, 3, 8.0)]


def test_on_time_pane_fires_even_if_empty_after_early():
    d = TriggerDriver(10, AfterWatermark(early=AfterCount(2)), DISCARDING, 100)
    assert pane_tuples(d.on_elements([(1, 1.0), (2, 2.0)])) == [
        (0, 0, EARLY, 2, 3.0)
    ]
    # nothing pending, but the on-time pane still fires (empty, discarding)
    assert pane_tuples(d.advance_watermark(10)) == [(0, 1, ON_TIME, 0, 0.0)]


def test_after_watermark_no_late_closes_window():
    d = TriggerDriver(10, AfterWatermark(), DISCARDING, allowed_lateness=100)
    d.on_elements([(1, 1.0)])
    assert pane_tuples(d.advance_watermark(10)) == [(0, 0, ON_TIME, 1, 1.0)]
    # window finished: late data is discarded, no pane
    assert d.on_elements([(2, 9.0)]) == []


def test_lateness_horizon_drops_elements():
    d = TriggerDriver(10, DefaultTrigger(), allowed_lateness=5)
    d.on_elements([(1, 1.0)])
    d.advance_watermark(10)
    # watermark 16 > end(10) + lateness(5): window GC'd, element dropped
    d.advance_watermark(16)
    assert d.on_elements([(2, 9.0)]) == []


def test_early_firings_after_count():
    d = TriggerDriver(10, AfterWatermark(early=AfterCount(2)), DISCARDING, 100)
    assert d.on_elements([(1, 1.0)]) == []
    assert pane_tuples(d.on_elements([(2, 2.0)])) == [(0, 0, EARLY, 2, 3.0)]
    # early trigger restarts (Repeatedly semantics)
    assert d.on_elements([(3, 4.0)]) == []
    assert pane_tuples(d.on_elements([(4, 4.0)])) == [(0, 1, EARLY, 2, 8.0)]
    assert pane_tuples(d.advance_watermark(10)) == [(0, 2, ON_TIME, 0, 0.0)]


def test_early_and_late_accumulating():
    d = TriggerDriver(
        10,
        AfterWatermark(early=AfterCount(2), late=AfterCount(1)),
        ACCUMULATING,
        allowed_lateness=100,
    )
    d.on_elements([(1, 1.0), (2, 2.0)])
    assert pane_tuples(d.advance_watermark(10)) == [(0, 1, ON_TIME, 2, 3.0)]
    assert pane_tuples(d.on_elements([(5, 10.0)])) == [(0, 2, LATE, 3, 13.0)]


def test_after_count_one_shot_closes():
    d = TriggerDriver(10, AfterCount(2), DISCARDING, allowed_lateness=100)
    assert pane_tuples(d.on_elements([(1, 1.0), (2, 2.0), (3, 3.0)])) == [
        (0, 0, EARLY, 3, 6.0)
    ]
    # one-shot: finished -> window closed, later elements discarded
    assert d.on_elements([(4, 4.0), (5, 5.0)]) == []


def test_repeatedly_after_count():
    d = TriggerDriver(10, Repeatedly(AfterCount(2)), DISCARDING, 100)
    assert pane_tuples(d.on_elements([(1, 1.0), (2, 2.0)])) == [(0, 0, EARLY, 2, 3.0)]
    assert pane_tuples(d.on_elements([(3, 3.0), (4, 4.0)])) == [(0, 1, EARLY, 2, 7.0)]


def test_after_processing_time():
    d = TriggerDriver(10, AfterProcessingTime(30), DISCARDING, 100)
    d.processing_time = 100
    assert d.on_elements([(1, 1.0)]) == []
    assert d.advance_processing_time(120) == []
    assert pane_tuples(d.advance_processing_time(130)) == [(0, 0, EARLY, 1, 1.0)]


def test_after_any():
    t = AfterAny((AfterCount(3), AfterProcessingTime(30)))
    d = TriggerDriver(10, t, DISCARDING, 100)
    d.processing_time = 0
    assert d.on_elements([(1, 1.0)]) == []
    # proc-time leg fires first
    assert pane_tuples(d.advance_processing_time(30)) == [(0, 0, EARLY, 1, 1.0)]


def test_after_all():
    t = AfterAll((AfterCount(2), AfterProcessingTime(30)))
    d = TriggerDriver(10, t, DISCARDING, 100)
    d.processing_time = 0
    d.on_elements([(1, 1.0), (2, 2.0)])  # count ready, proc-time not
    assert d.advance_processing_time(20) == []
    assert pane_tuples(d.advance_processing_time(30)) == [(0, 0, EARLY, 2, 3.0)]


def test_after_each_sequence():
    t = AfterEach((AfterCount(1), AfterCount(2)))
    d = TriggerDriver(10, t, DISCARDING, 100)
    assert pane_tuples(d.on_elements([(1, 1.0)])) == [(0, 0, EARLY, 1, 1.0)]
    assert d.on_elements([(2, 2.0)]) == []
    assert pane_tuples(d.on_elements([(3, 3.0)])) == [(0, 1, EARLY, 2, 5.0)]
    # sequence exhausted -> finished, window closed
    assert d.on_elements([(4, 4.0)]) == []


def test_never_trigger_only_final_pane():
    d = TriggerDriver(10, _Never(), DISCARDING, allowed_lateness=0)
    d.on_elements([(1, 1.0), (2, 2.0)])
    assert d.advance_watermark(5) == []
    panes = d.advance_watermark(10)  # GC emits the final pane
    assert pane_tuples(panes) == [(0, 0, ON_TIME, 2, 3.0)]
    assert panes[0].is_final


def test_multiple_windows_independent():
    d = TriggerDriver(10, DefaultTrigger(), DISCARDING, 100)
    d.on_elements([(5, 1.0), (15, 2.0), (25, 3.0)])
    panes = d.advance_watermark(20)
    assert pane_tuples(panes) == [
        (0, 0, ON_TIME, 1, 1.0),
        (10, 0, ON_TIME, 1, 2.0),
    ]


def test_state_roundtrip_resumes_exactly():
    d1 = TriggerDriver(10, AfterWatermark(early=AfterCount(2), late=AfterCount(1)),
                       ACCUMULATING, allowed_lateness=100)
    d1.on_elements([(1, 1.0)])
    blob = d1.dump()
    d2 = TriggerDriver(10, AfterWatermark(early=AfterCount(2), late=AfterCount(1)),
                       ACCUMULATING, allowed_lateness=100).load(blob)
    assert pane_tuples(d2.on_elements([(2, 2.0)])) == [(0, 0, EARLY, 2, 3.0)]
    assert pane_tuples(d2.advance_watermark(10)) == [(0, 1, ON_TIME, 2, 3.0)]


def test_sliding_windows_multi_assignment():
    """SlidingWindows(size=10, slide=5): each element joins 2 windows;
    panes fire per window at its own end (window.py:463 semantics)."""
    d = TriggerDriver(10, DefaultTrigger(), DISCARDING, allowed_lateness=100, slide=5)
    d.on_elements([(7, 1.0)])  # windows [0,10) and [5,15)
    assert pane_tuples(d.advance_watermark(10)) == [(0, 0, ON_TIME, 1, 1.0)]
    assert pane_tuples(d.advance_watermark(15)) == [(5, 0, ON_TIME, 1, 1.0)]


def test_sliding_windows_with_early_trigger():
    d = TriggerDriver(
        10, AfterWatermark(early=AfterCount(2)), DISCARDING, 100, slide=5
    )
    # both elements land in [0,10) and [5,15): each window's early count
    # trigger fires independently
    panes = d.on_elements([(6, 1.0), (7, 2.0)])
    assert sorted(pane_tuples(panes)) == [
        (0, 0, EARLY, 2, 3.0),
        (5, 0, EARLY, 2, 3.0),
    ]


def test_or_finally_until_count_terminates():
    from incubator_beam_spark.streaming.triggers import OrFinally

    # repeatedly fire per element, but stop for good once 5 elements seen
    d = TriggerDriver(
        10, OrFinally(Repeatedly(AfterCount(1)), AfterCount(5)), DISCARDING, 100
    )
    assert pane_tuples(d.on_elements([(1, 1.0)])) == [(0, 0, EARLY, 1, 1.0)]
    assert pane_tuples(d.on_elements([(2, 2.0)])) == [(0, 1, EARLY, 1, 2.0)]
    # the bundle that reaches the until-count fires one terminal pane...
    assert pane_tuples(d.on_elements([(3, 1.0), (4, 1.0), (5, 1.0)])) == [
        (0, 2, EARLY, 3, 3.0)
    ]
    # ...and the window is closed to further input
    assert d.on_elements([(6, 9.0)]) == []


def test_or_finally_fluent_form():
    d = TriggerDriver(
        10, Repeatedly(AfterCount(1)).or_finally(AfterCount(3)), DISCARDING, 100
    )
    assert pane_tuples(d.on_elements([(1, 1.0)])) == [(0, 0, EARLY, 1, 1.0)]
    assert pane_tuples(d.on_elements([(2, 1.0), (3, 1.0)])) == [(0, 1, EARLY, 2, 2.0)]
    assert d.on_elements([(4, 1.0)]) == []


def test_or_finally_main_never_until_watermark():
    from incubator_beam_spark.streaming.triggers import OrFinally, _Never

    # emit nothing until the watermark passes end-of-window, then finish
    d = TriggerDriver(10, OrFinally(_Never(), AfterWatermark()), DISCARDING, 100)
    assert d.on_elements([(1, 1.0), (2, 2.0)]) == []
    assert pane_tuples(d.advance_watermark(15)) == [(0, 0, ON_TIME, 2, 3.0)]


# -- round-5 ADVICE fixes: merge_states for composites / AfterProcessingTime,
#    and the end==0.0 sentinel bug for negative-timestamp sessions ---------


def test_sessions_merge_after_processing_time_keeps_earliest_deadline():
    """Sessions + AfterProcessingTime: merging windows keeps the EARLIEST
    pending fire time (reference defines on_merge for every trigger; this
    combination used to raise NotImplementedError mid-stream)."""
    d = TriggerDriver(
        10, AfterProcessingTime(5.0), DISCARDING, 100, session_gap=10
    )
    d.advance_processing_time(0.0)
    assert d.on_elements([(0, 1.0)]) == []  # deadline armed at pt 5
    d.advance_processing_time(3.0)
    # second session [15,25) arms its own deadline at pt 8
    assert d.on_elements([(15, 2.0)]) == []
    # bridging element [8,18) merges both; merged deadline = min(5, 8)
    assert d.on_elements([(8, 4.0)]) == []
    panes = d.advance_processing_time(5.0)
    assert pane_tuples(panes) == [(0, 0, EARLY, 3, 7.0)]


def test_sessions_merge_composite_triggers():
    """AfterAny/AfterAll/OrFinally merge recursively under Sessions
    instead of raising."""
    for trig in (
        AfterAny((AfterCount(3), AfterProcessingTime(99.0))),
        AfterAll((AfterCount(3), Repeatedly(AfterCount(1)))),
        Repeatedly(AfterCount(1)).or_finally(AfterCount(99)),
    ):
        d = TriggerDriver(10, trig, DISCARDING, 100, session_gap=10)
        d.on_elements([(0, 1.0)])
        d.on_elements([(15, 1.0)])
        d.on_elements([(8, 1.0)])  # merge must not raise
        assert len(d.windows) == 1


def test_sessions_merge_after_count_sums_across_windows():
    """AfterAny(AfterCount(3)): two 1-element sessions merge; the bridging
    element makes 3 seen total, so the merged window fires immediately."""
    d = TriggerDriver(
        10, AfterAny((AfterCount(3), _Never())), DISCARDING, 100, session_gap=10
    )
    assert d.on_elements([(0, 1.0)]) == []
    assert d.on_elements([(15, 2.0)]) == []
    panes = d.on_elements([(8, 4.0)])
    assert pane_tuples(panes) == [(0, 0, EARLY, 3, 7.0)]


def test_after_each_merge_resumes_least_advanced_position():
    """AfterEach under Sessions: the merged window resumes at the least-
    advanced sequence index."""
    seq = AfterEach((AfterCount(2), AfterCount(1)))
    d = TriggerDriver(10, seq, DISCARDING, 100, session_gap=10)
    # session A fires its first sub-trigger (idx -> 1)
    assert pane_tuples(d.on_elements([(0, 1.0), (1, 1.0)])) == [
        (0, 0, EARLY, 2, 2.0)
    ]
    # session B still at idx 0 with 1 element seen
    assert d.on_elements([(15, 1.0)]) == []
    # merge: resumes at idx 0; bridging element makes 2 seen -> fires
    panes = d.on_elements([(8, 1.0)])
    assert len(panes) == 1 and panes[0].count == 2


def test_session_end_at_timestamp_zero_is_not_unset():
    """A merged session whose end lands exactly at 0.0 (negative-timestamp
    elements) keeps that end — end=None is the only 'derive it' sentinel
    now, so the watermark can close the window at its true end."""
    d = TriggerDriver(10, DefaultTrigger(), DISCARDING, 0, session_gap=10)
    assert d.on_elements([(-18.0, 1.0), (-10.0, 2.0)]) == []  # merge: [-18, 0)
    st = d.windows[-18.0]
    assert st.end == 0.0
    # watermark at exactly the true end closes the window; the buggy
    # fallback (ws + window_size = -8) would have fired this at wm -5
    assert d.advance_watermark(-5.0) == []
    panes = d.advance_watermark(0.0)
    assert pane_tuples(panes) == [(-18.0, 0, ON_TIME, 2, 3.0)]
