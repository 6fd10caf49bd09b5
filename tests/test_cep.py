"""MATCH_RECOGNIZE / CEP operator semantics (plans/cep.py).

Mirrors the reference's NFA test surface
(sdks/java/extensions/sql/.../impl/nfa/, BeamMatchRel) on synthetic
sequences: quantifiers, alternation, non-overlap (AFTER MATCH SKIP PAST
LAST ROW), per-partition isolation, and measures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incubator_beam_spark.plans.cep import _compile_pattern, match_recognize


def _events(spark, rows):
    """rows: list of (key, seq, etype, val)."""
    return spark.createDataFrame(rows, "key int, seq int, etype string, val double")


DEFINE = None  # built per test


def _run(spark, rows, pattern, measures=None):
    df = _events(spark, rows)
    return match_recognize(
        df,
        partition_by=["key"],
        order_by=["seq"],
        define={
            "A": F.col("etype") == "a",
            "B": F.col("etype") == "b",
            "C": F.col("etype") == "c",
        },
        pattern=pattern,
        measures=measures
        or {
            "start_seq": ("first", None, "seq"),
            "end_seq": ("last", None, "seq"),
        },
    ).collect()


def test_simple_sequence(spark):
    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "c", 0.0)]
    out = _run(spark, rows, "A B C")
    assert len(out) == 1
    assert (out[0].start_seq, out[0].end_seq, out[0].match_number) == (1, 3, 1)


def test_star_quantifier_zero_and_many(spark):
    rows = [
        (1, 1, "a", 0.0), (1, 2, "c", 0.0),          # A B* C with 0 b's
        (1, 3, "a", 0.0), (1, 4, "b", 0.0), (1, 5, "b", 0.0), (1, 6, "c", 0.0),
    ]
    out = sorted(_run(spark, rows, "A B* C"), key=lambda r: r.start_seq)
    assert [(r.start_seq, r.end_seq) for r in out] == [(1, 2), (3, 6)]
    assert [r.match_number for r in out] == [1, 2]


def test_plus_requires_one(spark):
    rows = [(1, 1, "a", 0.0), (1, 2, "c", 0.0)]
    assert _run(spark, rows, "A B+ C") == []


def test_optional_quantifier(spark):
    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "c", 0.0),
            (2, 1, "a", 0.0), (2, 2, "c", 0.0)]
    out = sorted(_run(spark, rows, "A B? C"), key=lambda r: r.key)
    assert [(r.key, r.start_seq, r.end_seq) for r in out] == [(1, 1, 3), (2, 1, 2)]


def test_alternation(spark):
    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0),
            (1, 3, "a", 0.0), (1, 4, "c", 0.0)]
    out = sorted(_run(spark, rows, "A (B|C)"), key=lambda r: r.start_seq)
    assert [(r.start_seq, r.end_seq) for r in out] == [(1, 2), (3, 4)]


def test_non_overlapping_skip_past_last_row(spark):
    # aba: greedy finds (a b a)? pattern A B A consumes rows 1-3; the
    # second potential match starting at row 3 must NOT fire (row consumed)
    rows = [(1, 1, "a", 0.0), (1, 2, "b", 0.0), (1, 3, "a", 0.0),
            (1, 4, "b", 0.0), (1, 5, "a", 0.0)]
    out = sorted(_run(spark, rows, "A B A"), key=lambda r: r.start_seq)
    assert [(r.start_seq, r.end_seq) for r in out] == [(1, 3)]


def test_unmatched_symbol_breaks_match(spark):
    # 'x' classifies to no symbol -> breaks contiguity
    rows = [(1, 1, "a", 0.0), (1, 2, "x", 0.0), (1, 3, "c", 0.0)]
    assert _run(spark, rows, "A C") == []


def test_partitions_are_isolated(spark):
    rows = [(1, 1, "a", 0.0), (2, 2, "c", 0.0)]
    assert _run(spark, rows, "A C") == []


def test_measures_first_last_count(spark):
    rows = [(1, 1, "a", 10.0), (1, 2, "b", 20.0), (1, 3, "b", 30.0),
            (1, 4, "c", 40.0)]
    out = _run(
        spark, rows, "A B* C",
        measures={
            "a_val": ("first", "A", "val"),
            "c_val": ("last", "C", "val"),
            "n_b": ("count", "B"),
        },
    )
    assert len(out) == 1
    assert (out[0].a_val, out[0].c_val, out[0].n_b) == (10.0, 40.0, 2)


def test_first_define_wins_classification(spark):
    # row matches both A and AA (etype == 'a'); declaration order decides
    df = _events(spark, [(1, 1, "a", 0.0), (1, 2, "c", 0.0)])
    out = match_recognize(
        df,
        partition_by=["key"],
        order_by=["seq"],
        define={
            "A": F.col("etype") == "a",
            "AA": F.col("etype") == "a",
            "C": F.col("etype") == "c",
        },
        pattern="AA C",
        measures={"s": ("first", None, "seq")},
    ).collect()
    assert out == []  # rows classified as A, never AA


def test_bad_pattern_symbol_raises(spark):
    df = _events(spark, [(1, 1, "a", 0.0)])
    with pytest.raises(ValueError, match="not in define"):
        match_recognize(
            df, ["key"], ["seq"], {"A": F.col("etype") == "a"}, "A Z",
            {"s": ("first", None, "seq")},
        )


def test_compile_pattern_tokens():
    sym = {"A": "A", "B": "B"}
    assert _compile_pattern("A B*", sym).pattern == "AB*"
    assert _compile_pattern("A (A|B)+", sym).pattern == "A(A|B)+"


SEQ_SCHEMA = "key long, seq long, etype string"


def test_match_recognize_stream_across_batches(spark):
    """Streaming CEP: a pattern whose rows arrive in DIFFERENT
    micro-batches still matches (state buffers the unconsumed tail);
    consumed rows never re-match."""
    from pyspark.sql import types as T

    from incubator_beam_spark.streaming import TestStream
    from incubator_beam_spark.plans.cep import match_recognize_stream

    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("etype", T.StringType()),
        ]
    )
    with TestStream(spark, schema) as ts:
        out = match_recognize_stream(
            ts.stream,
            partition_by="key",
            order_by="seq",
            define={
                "A": F.col("etype") == "a",
                "B": F.col("etype") == "b",
                "C": F.col("etype") == "c",
            },
            pattern="A B* C",
            measures={
                "start_seq": ("first", "A", "seq"),
                "end_seq": ("last", "C", "seq"),
                "n_b": ("count", "B"),
            },
        )
        ts.start(out, output_mode="append")
        ts.add_elements([(1, 1, "a"), (1, 2, "b")]).advance()
        assert ts.results().count() == 0  # incomplete: buffered in state
        ts.add_elements([(1, 3, "b"), (1, 4, "c")]).advance()
        rows = [(r.match_number, r.start_seq, r.end_seq, r.n_b)
                for r in ts.results().collect()]
        assert rows == [(1, 1, 4, 2)]
        # a second, fully-in-batch match gets the next match_number
        ts.add_elements([(1, 5, "a"), (1, 6, "c")]).advance()
        rows = sorted((r.match_number, r.start_seq, r.end_seq)
                      for r in ts.results().collect())
        assert rows == [(1, 1, 4), (2, 5, 6)]


def test_match_recognize_stream_rejects_trailing_quantifier(spark):
    from incubator_beam_spark.plans.cep import match_recognize_stream

    df = spark.createDataFrame([(1, 1, "a")], SEQ_SCHEMA)
    defines = {"A": F.col("etype") == "a", "B": F.col("etype") == "b",
               "C": F.col("etype") == "c"}
    for bad in ("A+", "A B*", "A (B|C)+", "A (C|B+)", "A (C|(B|A)*)"):
        with pytest.raises(ValueError, match="non-extendable"):
            match_recognize_stream(
                df, "key", "seq", defines, bad, {"s": ("first", None, "seq")}
            )
    # a plain trailing symbol — or a group of plain alternatives — is fine
    for ok in ("A+ B", "A (B|C)", "A B? C"):
        match_recognize_stream(
            df, "key", "seq", defines, ok, {"s": ("first", None, "seq")}
        )
