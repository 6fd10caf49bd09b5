"""Split-invariance fuzz for streaming MATCH_RECOGNIZE (plans/cep.py).

``match_recognize_stream`` claims: if the pattern ends at a
non-extendable position (``_ends_extendable`` is False), then running
the batch kernel incrementally — append chunk, finditer, emit, drop the
consumed prefix (AFTER MATCH SKIP PAST LAST ROW) — produces EXACTLY the
matches a single whole-sequence run produces, for every chunking.

That claim is the entire correctness argument for the streaming CEP
path, and it is pure string/regex logic, so hypothesis can attack it
directly without Spark: random patterns from the repo's
MATCH_RECOGNIZE grammar (quantifiers, bounded {n,m}, reluctant,
alternation groups), random symbol streams (including '.' rows that
match no define), random chunk boundaries. Patterns the guard rejects
(extendable ends) are skipped — they are exactly the ones the stream
API refuses at construction.

This mirrors the incremental loop of ``match_recognize_stream.fn``
(cep.py): same finditer, same consumed-prefix drop, same zero-length
skip. If someone edits the kernel's consumption logic, this fuzz breaks
unless whole-run equivalence still holds.
"""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from incubator_beam_spark.plans.cep import (
    _compile_pattern,
    _ends_extendable,
    _sym_chars,
)

SYMS = {"A": None, "B": None, "C": None}  # names only; chars via _sym_chars
CHARS = _sym_chars(SYMS)

atom = st.sampled_from(["A", "B", "C", "(A|B)", "(B|C)", "(A|B C)"])
quant = st.sampled_from(
    ["", "?", "*", "+", "*?", "+?", "??", "{2}", "{1,3}", "{2,}", "{1,3}?"]
)
patterns = st.lists(
    st.tuples(atom, quant).map("".join), min_size=1, max_size=4
).map(" ".join)

streams = st.text(alphabet="abc.", min_size=0, max_size=30)
# chunk sizes; consumed greedily until the stream is exhausted
chunkings = st.lists(st.integers(1, 8), min_size=1, max_size=30)


def whole_run(rx, s: str) -> list[tuple[int, int, int]]:
    out = []
    mn = 0
    for m in rx.finditer(s):
        if m.start() == m.end():
            continue
        mn += 1
        out.append((mn, m.start(), m.end()))
    return out


def incremental_run(pattern: str, s: str, sizes) -> list[tuple[int, int, int]]:
    """The REAL streaming consumption loop: per chunk arrival, run
    ``_stable_scan`` (the kernel's hold-until-decided scan) over the
    buffered tail, emit decided matches, drop the decided prefix."""
    from incubator_beam_spark.plans.cep import _stable_scan
    from incubator_beam_spark.plans.nfa import NFA

    nfa = NFA(pattern)
    out = []
    mn = 0
    buf = ""
    base = 0  # global offset of buf[0]
    pos = 0
    it = iter(sizes)
    while pos < len(s):
        try:
            k = next(it)
        except StopIteration:
            k = len(s) - pos  # final flush: deliver the rest
        buf += s[pos : pos + k]
        pos += k

        def can(sym, i, trail, b=buf):
            return b[i] == CHARS[sym]

        decided, boundary = _stable_scan(nfa, len(buf), can)
        for lo, hi, _assignment in decided:
            mn += 1
            out.append((mn, base + lo, base + hi))
        buf = buf[boundary:]
        base += boundary
    return out


@settings(max_examples=400, deadline=None)
@given(pattern=patterns, stream=streams, sizes=chunkings)
def test_stream_matches_equal_batch_matches(pattern, stream, sizes):
    """Split invariance of the kernel scan, for EVERY grammar pattern
    (including extendable ends the public constructor rejects): once a
    terminating no-match row arrives, the incremental emissions equal
    the whole-sequence run exactly; matches are never emitted that the
    whole run would not produce."""
    try:
        rx = _compile_pattern(pattern, CHARS)
    except ValueError:
        assume(False)
    s = stream.upper() + "."  # trailing no-match row decides every tail
    assert incremental_run(pattern, s, sizes) == whole_run(rx, s)


@settings(max_examples=200, deadline=None)
@given(pattern=patterns, stream=streams, sizes=chunkings)
def test_stream_never_emits_unconfirmed(pattern, stream, sizes):
    """Without a terminator, the held tail may delay matches but every
    emission must be a prefix of the whole-run match sequence."""
    try:
        rx = _compile_pattern(pattern, CHARS)
    except ValueError:
        assume(False)
    s = stream.upper()
    got = incremental_run(pattern, s, sizes)
    want = whole_run(rx, s)
    assert got == want[: len(got)]


# -- NFA vs host regex: grammar-wide differential ---------------------------
#
# test_cep.py pins 8 hand-picked quantifier shapes; this drives the SAME
# leftmost-greedy equivalence over hypothesis-generated pattern trees —
# every grammar production (bounded, reluctant, alternation over
# sequences, nested groups) against every random string.


@settings(max_examples=300, deadline=None)
@given(pattern=patterns, stream=streams)
def test_nfa_matches_host_regex_grammar_wide(pattern, stream):
    import re as _re

    from incubator_beam_spark.plans.nfa import NFA

    try:
        rx = _re.compile(_compile_pattern(pattern, CHARS))
        nfa = NFA(pattern)
    except ValueError:
        assume(False)
    s = stream.upper()

    def can(sym, i, trail, s=s):
        return s[i] == CHARS[sym]

    got = [(lo, hi) for lo, hi, _ in nfa.finditer(len(s), can)]
    want = [(m.start(), m.end()) for m in rx.finditer(s) if m.end() > m.start()]
    assert got == want, (pattern, s)
