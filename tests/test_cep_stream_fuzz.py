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


def incremental_run(rx, s: str, sizes) -> list[tuple[int, int, int]]:
    """The match_recognize_stream consumption loop, minus Spark: buffer
    unconsumed tail, finditer per chunk arrival, drop consumed prefix."""
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
        consumed = 0
        for m in rx.finditer(buf):
            if m.start() == m.end():
                continue
            mn += 1
            out.append((mn, base + m.start(), base + m.end()))
            consumed = m.end()
        buf = buf[consumed:]
        base += consumed
    return out


@settings(max_examples=400, deadline=None)
@given(pattern=patterns, stream=streams, sizes=chunkings)
def test_stream_matches_equal_batch_matches(pattern, stream, sizes):
    try:
        rx = _compile_pattern(pattern, CHARS)
    except ValueError:
        assume(False)
    # the streaming constructor rejects extendable ends; mirror it
    assume(not _ends_extendable(rx.pattern))
    s = stream.upper().replace(".", ".")  # defines map a/b/c rows; '.' = no symbol
    assert incremental_run(rx, s, sizes) == whole_run(rx, s)
