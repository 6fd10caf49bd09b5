"""Structured Streaming layer: the unbounded half of the unified model.

The reference expresses boundedness as a property of the source
(``beam_runner_api.proto`` IsBounded; ``io/iobase.py:107``) and runs one
pipeline definition in both modes. Here the same contract holds: query
builders in ``queries/`` produce DataFrame plans that work identically on
``spark.read`` and ``spark.readStream`` inputs; this package adds the
streaming-only pieces — watermarks, stateful processing, the TestStream
harness, and sinks.
"""

from .source import stream_events, stream_table
from .stateful import deduplicate_stream, group_into_batches_stream, per_key_counter
from .teststream import TestStream
from .userstate import EVENT_TIME, PROCESSING_TIME, StatefulContext, stateful_pardo
from .triggers import (
    ACCUMULATING,
    DISCARDING,
    AfterAll,
    AfterAny,
    AfterCount,
    AfterEach,
    AfterProcessingTime,
    AfterWatermark,
    Always,
    DefaultTrigger,
    Repeatedly,
    TriggerDriver,
    triggered_window_agg,
)
