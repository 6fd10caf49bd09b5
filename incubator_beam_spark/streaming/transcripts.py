"""Trigger-transcript conformance runner.

Runs the reference's full trigger conformance corpus —
``sdks/python/apache_beam/testing/data/trigger_transcripts.yaml``, the
YAML matrix of (window_fn x trigger_fn x accumulation_mode x
timestamp_combiner x allowed_lateness) scripted element/watermark
sequences — directly against this engine's trigger VM
(:mod:`incubator_beam_spark.streaming.triggers`). The execution and
matching semantics mirror the reference driver
(``transforms/trigger_test.py:1299`` TriggerDriverTranscriptTest):

- ``input``: process a bundle at the current watermark, collect panes;
- ``watermark``: advance, collect on-time / GC panes;
- ``expect``: each expected pane must PARTIALLY match one pending
  actual pane (only the attributes named in the expectation are
  compared), which is then consumed — mismatch raises
  ``Unmatched output``;
- any pending unconsumed pane at the next action or at end of
  transcript raises ``Unexpected output``;
- ``state``: skipped (the reference driver also passes on it);
- a spec with ``error:`` asserts that running it raises that message.

Pane attributes are rendered exactly like the reference's
``_windowed_value_info``: ``window`` is [start, max_timestamp] (end-1
for integral bounds), ``values`` is the sorted element timestamps,
``timestamp`` the combiner output time, plus
index / nonspeculative_index / early / late / final flags.
"""

from __future__ import annotations

import re
from typing import Any

from .triggers import (
    ACCUMULATING,
    DISCARDING,
    EARLY,
    LATE,
    AfterAll,
    AfterAny,
    AfterCount,
    AfterEach,
    AfterProcessingTime,
    AfterWatermark,
    Always,
    DefaultTrigger,
    OrFinally,
    Repeatedly,
    TriggerDriver,
    _Never,
)

_GLOBAL_SIZE = 1e15  # effectively end-of-time for a GlobalWindows stand-in

_TRIGGER_NAMES = {
    "Default": DefaultTrigger,
    "DefaultTrigger": DefaultTrigger,
    "AfterWatermark": AfterWatermark,
    "AfterCount": AfterCount,
    "AfterProcessingTime": AfterProcessingTime,
    "Repeatedly": Repeatedly,
    "AfterAny": AfterAny,
    "AfterAll": AfterAll,
    "AfterEach": AfterEach,
    "OrFinally": OrFinally,
    "Always": Always,
    "_Never": _Never,
}


def _split_args(s: str) -> list[str]:
    """Split 'a, b, f(c, d)' at depth-0 commas (trigger_test.py:776)."""
    args, start, depth = [], 0, 0
    for ix, c in enumerate(s):
        if c in "({[":
            depth += 1
        elif c in ")}]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[start:ix].strip())
            start = ix + 1
    assert depth == 0, s
    if s[start:].strip():
        args.append(s[start:].strip())
    return args


def parse_trigger(s: str) -> Any:
    """Parse 'AfterWatermark(early=AfterCount(2), late=AfterCount(3))'
    style trigger expressions (the transcript corpus syntax)."""
    s = s.strip()
    if s in _TRIGGER_NAMES:
        obj = _TRIGGER_NAMES[s]
        return obj() if isinstance(obj, type) else obj
    m = re.match(r"^([A-Za-z_]\w*)\((.*)\)$", s, re.DOTALL)
    if m:
        callee = _TRIGGER_NAMES[m.group(1)]
        posargs, kwargs = [], {}
        for arg in _split_args(m.group(2)):
            if "=" in arg.split("(")[0]:
                k, v = arg.split("=", 1)
                kwargs[k.strip()] = parse_trigger(v)
            else:
                posargs.append(parse_trigger(arg))
        # variadic composites take a tuple of subs
        if callee in (AfterAny, AfterAll, AfterEach):
            return callee(tuple(posargs), **kwargs)
        return callee(*posargs, **kwargs)
    return int(s)


def _parse_window_fn(s: str) -> dict:
    """Window spec -> TriggerDriver kwargs. Supported corpus fns:
    FixedWindows(n), SlidingWindows(size, period), Sessions(gap),
    GlobalWindows, CustomTimestampingFixedWindowsWindowFn(n) (the
    trigger_test.py:76 fixture whose get_transformed_output_time is
    input_timestamp + 100)."""
    s = s.strip()
    m = re.match(r"^(\w+)(?:\((.*)\))?$", s)
    name, argstr = m.group(1), m.group(2) or ""
    args = [float(a) for a in _split_args(argstr)] if argstr else []
    if name == "FixedWindows":
        return {"window_size": args[0]}
    if name == "SlidingWindows":
        return {"window_size": args[0], "slide": args[1]}
    if name == "Sessions":
        return {"window_size": args[0], "session_gap": args[0]}
    if name == "GlobalWindows":
        return {"window_size": _GLOBAL_SIZE}
    if name == "CustomTimestampingFixedWindowsWindowFn":
        return {
            "window_size": args[0],
            "output_time_transform": lambda ts: ts + 100,
        }
    raise ValueError(f"unsupported window_fn: {s}")


def _pane_info(pane) -> dict:
    return {
        "window": [int(pane.window_start), int(pane.window_end) - 1],
        "values": sorted(int(v) for v in (pane.values or ())),
        "timestamp": int(pane.output_ts),
        "index": pane.index,
        "nonspeculative_index": pane.nonspeculative_index,
        "early": pane.timing == EARLY,
        "late": pane.timing == LATE,
        "final": pane.is_final,
    }


def run_transcript(spec: dict) -> None:
    """Execute one YAML transcript spec; raises AssertionError with the
    reference's message prefixes on any mismatch."""
    win_kwargs = _parse_window_fn(spec.get("window_fn", "GlobalWindows"))
    transform = win_kwargs.pop("output_time_transform", None)
    combiner = spec.get("timestamp_combiner", "OUTPUT_AT_EOW").upper()
    if combiner == "OUTPUT_AT_EARLIEST_TRANSFORMED":
        combiner, use_transform = "EARLIEST", transform
    else:
        combiner, use_transform = combiner.replace("OUTPUT_AT_", ""), None
    driver = TriggerDriver(
        trigger=parse_trigger(spec.get("trigger_fn", "Default")),
        # reference transcript default is ACCUMULATING (trigger_test.py:841);
        # the mode constants are their own names, so the upper-cased spec
        # string is the constant
        accumulation=spec.get("accumulation_mode", "accumulating").upper(),
        allowed_lateness=float(spec.get("allowed_lateness", 0.0)),
        timestamp_combiner=combiner,
        output_time_transform=use_transform,
        track_values=True,
        **win_kwargs,
    )

    output: list[dict] = []

    def check_no_pending(context: str) -> None:
        if output:
            raise AssertionError(
                f"Unexpected output: {output} before {context}"
            )

    for line in spec["transcript"]:
        ((action, params),) = line.items()
        if action != "expect":
            check_no_pending(f"{action}: {params}")
        if action == "input":
            panes = driver.on_elements([(float(t), float(t)) for t in params])
            # reference driver fires due timers after each bundle
            panes += driver.advance_watermark(driver.watermark)
            output.extend(_pane_info(p) for p in panes)
        elif action == "watermark":
            output.extend(
                _pane_info(p) for p in driver.advance_watermark(float(params))
            )
        elif action == "expect":
            for expected in params:
                for candidate in output:
                    if all(
                        candidate[k] == expected[k]
                        for k in candidate
                        if k in expected
                    ):
                        output.remove(candidate)
                        break
                else:
                    raise AssertionError(
                        f"Unmatched output {expected} in {output}"
                    )
        elif action == "state":
            # the reference transcript driver also skips state assertions
            # (trigger_test.py: 'TODO ... pass'); GC behavior is covered
            # by the lateness-horizon kernel tests instead
            pass
        else:
            raise ValueError(f"Unknown action: {action}")

    check_no_pending("end of transcript")
