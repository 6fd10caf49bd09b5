"""WindowFn surface tests (reference model: ``window_test.py`` —
FixedWindows/SlidingWindows assignment, Sessions merging, custom
merging fns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import incubator_beam_spark.core as ibs
from incubator_beam_spark.windows import (
    FixedWindows,
    GlobalWindows,
    Sessions,
    SlidingWindows,
    WindowFn,
    WindowInto,
)


@pytest.fixture(scope="module")
def p(spark):
    return ibs.Pipeline(spark)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user", "etype", "ts"])


def test_fixed_windows_assignment(spark, p):
    df = _events(spark, [(1, "a", 5.0), (1, "a", 15.0), (1, "a", 25.0)])
    out = (ibs.PCollection(df, p) | WindowInto(FixedWindows(10), ts_col="ts")).df
    got = sorted((r.ts, r.window_start, r.window_end) for r in out.collect())
    assert got == [(5.0, 0.0, 10.0), (15.0, 10.0, 20.0), (25.0, 20.0, 30.0)]


def test_sliding_windows_multi_assignment(spark, p):
    df = _events(spark, [(1, "a", 25.0)])
    out = (ibs.PCollection(df, p) | WindowInto(SlidingWindows(30, 10), ts_col="ts")).df
    got = sorted((r.window_start, r.window_end) for r in out.collect())
    # 3 windows of size 30 every 10s contain t=25: [0,30) [10,40) [20,50)
    assert got == [(0.0, 30.0), (10.0, 40.0), (20.0, 50.0)]


def test_global_windows(spark, p):
    df = _events(spark, [(1, "a", 5.0), (2, "b", 1e9)])
    out = (ibs.PCollection(df, p) | WindowInto(GlobalWindows(), ts_col="ts")).df
    assert out.select("window_start", "window_end").distinct().count() == 1


def test_sessions_merge_overlapping(spark, p):
    # gap 10: events at 0, 5, 8 chain into one session [0, 18); 40 alone
    df = _events(spark, [(1, "a", 0.0), (1, "a", 5.0), (1, "a", 8.0), (1, "a", 40.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(Sessions(10), ts_col="ts", key_cols=["user"])
    ).df
    sessions = sorted(
        set((r.window_start, r.window_end) for r in out.collect())
    )
    assert sessions == [(0.0, 18.0), (40.0, 50.0)]


def test_sessions_do_not_merge_across_keys(spark, p):
    df = _events(spark, [(1, "a", 0.0), (2, "a", 5.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(Sessions(10), ts_col="ts", key_cols=["user"])
    ).df
    got = sorted((r.user, r.window_start, r.window_end) for r in out.collect())
    assert got == [(1, 0.0, 10.0), (2, 5.0, 15.0)]


def test_custom_merging_windowfn_element_dependent_gap(spark, p):
    class VipSessions(WindowFn):
        merging = True

        def assign(self, ts):
            gap = F.when(F.col("etype") == "vip", 100.0).otherwise(10.0)
            return (ts, ts + gap)

    # vip event at t=0 holds the session open 100s, so t=50 chains;
    # a normal event at t=0 would not reach t=50
    df = _events(spark, [(1, "vip", 0.0), (1, "a", 50.0), (2, "a", 0.0), (2, "a", 50.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(VipSessions(), ts_col="ts", key_cols=["user"])
    ).df
    n_windows = {
        r.user: r.n
        for r in out.groupBy("user")
        .agg(F.countDistinct("window_start").alias("n"))
        .collect()
    }
    assert n_windows == {1: 1, 2: 2}


def test_merging_requires_key_cols(spark, p):
    df = _events(spark, [(1, "a", 0.0)])
    with pytest.raises(ValueError, match="key_cols"):
        ibs.PCollection(df, p) | WindowInto(Sessions(10), ts_col="ts")


def test_merging_windowfn_plan_single_shuffle(spark, p):
    """The merge is analytic passes over ONE exchange on the key."""
    df = _events(spark, [(1, "a", 0.0), (1, "a", 5.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(Sessions(10), ts_col="ts", key_cols=["user"])
    ).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1
    assert "BatchEvalPython" not in plan  # no Python in the merge path


def test_slack_merges_disjoint_windows(spark, p):
    """slack>0 merges windows that do NOT overlap (reference
    window.py:119 general merge; overlap-only merging can never do
    this). Tumbling proto-windows [0,10) and [20,30) sit 10s apart:
    slack=10 coalesces them; [50,60) is 20s past and stays separate."""

    class CoalescingFixed(WindowFn):
        merging = True
        slack = 10.0

        def assign(self, ts):
            start = F.floor(ts / 10) * 10.0
            return (start, start + 10.0)

    df = _events(spark, [(1, "a", 5.0), (1, "a", 25.0), (1, "a", 55.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(CoalescingFixed(), ts_col="ts", key_cols=["user"])
    ).df
    got = sorted(set((r.window_start, r.window_end) for r in out.collect()))
    assert got == [(0.0, 30.0), (50.0, 60.0)]


def test_slack_merge_stays_jvm_side(spark, p):
    class CoalescingFixed(WindowFn):
        merging = True
        slack = 10.0

        def assign(self, ts):
            start = F.floor(ts / 10) * 10.0
            return (start, start + 10.0)

    df = _events(spark, [(1, "a", 5.0), (1, "a", 25.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(CoalescingFixed(), ts_col="ts", key_cols=["user"])
    ).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no FlatMapGroupsInPandas / BatchEvalPython


def test_general_merge_hook(spark, p):
    """Arbitrary WindowFn.merge: pair up adjacent distinct windows
    (1st+2nd, 3rd+4th, ...) regardless of distance — inexpressible as
    overlap or slack merging, and count-dependent on the window SET."""

    class PairwiseMerge(WindowFn):
        merging = True

        def assign(self, ts):
            start = F.floor(ts / 10) * 10.0
            return (start, start + 10.0)

        def merge(self, windows):
            out = []
            for i in range(0, len(windows) - 1, 2):
                a, b = windows[i], windows[i + 1]
                out.append(([a, b], (a[0], b[1])))
            return out

    df = _events(
        spark,
        [(1, "a", 5.0), (1, "a", 95.0), (1, "a", 205.0), (2, "b", 15.0)],
    )
    out = (
        ibs.PCollection(df, p)
        | WindowInto(PairwiseMerge(), ts_col="ts", key_cols=["user"])
    ).df
    got = sorted((r.user, r.ts, r.window_start, r.window_end) for r in out.collect())
    # user 1: windows [0,10),[90,100),[200,210) -> first two merge into
    # [0,100), odd one out stays; user 2: single window, no directive.
    assert got == [
        (1, 5.0, 0.0, 100.0),
        (1, 95.0, 0.0, 100.0),
        (1, 205.0, 200.0, 210.0),
        (2, 15.0, 10.0, 20.0),
    ]


def test_general_merge_rows_keep_all_columns(spark, p):
    class MergeAll(WindowFn):
        merging = True

        def assign(self, ts):
            return (ts, ts + 1.0)

        def merge(self, windows):
            if len(windows) < 2:
                return []
            return [(list(windows), (windows[0][0], windows[-1][1]))]

    df = _events(spark, [(1, "x", 0.0), (1, "y", 100.0)])
    out = (
        ibs.PCollection(df, p)
        | WindowInto(MergeAll(), ts_col="ts", key_cols=["user"])
    ).df
    rows = sorted((r.user, r.etype, r.ts, r.window_start, r.window_end) for r in out.collect())
    assert rows == [(1, "x", 0.0, 0.0, 101.0), (1, "y", 100.0, 0.0, 101.0)]


def test_general_merge_rejects_unknown_member(spark):
    """A merge directive naming a window not in the key's distinct set
    raises instead of being silently ignored (ADVICE r3)."""
    from incubator_beam_spark.windows import WindowFn, merge_proto_windows_general

    class BadFn(WindowFn):
        merging = True

        def merge(self, windows):
            return [([(999.0, 1000.0)], (0.0, 1.0))]

    df = spark.createDataFrame(
        [("u", 0.0, 10.0), ("u", 5.0, 15.0)], ["k", "window_start", "window_end"]
    )
    out = merge_proto_windows_general(df, ["k"], BadFn())
    import pytest as _pytest

    with _pytest.raises(Exception, match="not among"):
        out.collect()
