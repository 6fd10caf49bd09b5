"""Cross-symbol DEFINE conditions for SQL MATCH_RECOGNIZE.

Reference surface: the SQL standard's match-state-dependent DEFINE
predicates — ``B AS B.price < LAST(A.price)`` V-pattern chains —
which Calcite models as ``CEPCall`` navigation over the partial match
and the reference executes in its NFA (``sdks/java/extensions/sql/...
/impl/nfa/NFA.java``; the tested surface in ``BeamMatchRelTest.java``
never crosses symbols, so this closes a STANDARD-completeness gap, not
a reference-parity gap).

A condition that references another symbol cannot be a Catalyst
``Column``: its value depends on which rows the in-flight match has
bound to that symbol. The CEP kernel (``plans/cep.py``) already accepts
callable defines ``fn(arrs, i, bindings) -> bool`` for exactly this
case, so this module compiles the tight SQL grammar below into such a
callable:

    or:    and (OR and)*
    and:   not (AND not)*
    not:   NOT not | cmp
    cmp:   add (= | <> | != | < | <= | > | >=) add | add IS [NOT] NULL
    add:   mul ((+|-) mul)*
    mul:   unary ((*|/) unary)*
    unary: - unary | primary
    primary: number | 'string' | TRUE | FALSE | NULL | (or)
           | FIRST|LAST ( Sym.col [, n] )   -- logical navigation
           | PREV|NEXT ( add [, n] )        -- PHYSICAL-row navigation
           | Sym.col                        -- == LAST(Sym.col)
           | col                            -- current row's value

Semantics (SQL standard running semantics inside DEFINE):
- ``LAST(Sym.col, n)`` is the value on the (n+1)-th-from-last row the
  partial match has mapped to ``Sym``; ``FIRST`` counts from the start.
  The row under test is tentatively mapped to the symbol BEING defined,
  so self-navigation sees it; other symbols see only prior bindings.
  Fewer than n+1 mapped rows -> NULL.
- ``PREV(expr[, n])`` / ``NEXT(expr[, n])`` evaluate ``expr`` on the
  row n physical positions before/after the row under test (default
  n=1) — the streaming kernel's in-state analog of the batch front
  door's lag/lead lowering (reference ``impl/cep/CEPCall``: PREV
  addresses physical rows). Inside the argument, ``Sym.col`` for ANY
  symbol means the navigated row's column (the batch lowering strips
  symbol prefixes the same way); FIRST/LAST are rejected there.
  Navigation before the partition start is NULL. The compiled
  callable exposes ``fn.max_prev`` / ``fn.max_next`` — the worst-case
  physical excursions, computed as the MAX over nesting paths
  (offsets accumulate only through NESTED navigation; sibling
  ``PREV(a) AND PREV(b)`` needs 1 row of history, not 2) — so the
  streaming kernel retains exactly enough consumed history and holds
  back no more unresolved-lead rows than necessary.
- three-valued logic: a NULL operand makes a comparison UNKNOWN,
  AND/OR/NOT follow Kleene, and a row satisfies the DEFINE only when
  the condition is TRUE.

Anything outside the grammar raises a loud ValueError directing users
to the Python API's callable defines (which accept arbitrary Python).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd

_TOKEN = re.compile(
    r"\s+"
    r"|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<ident>[A-Za-z_]\w*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\+|-|\*|/|\(|\)|,|\.)"
)

_KEYWORDS = {
    "AND", "OR", "NOT", "TRUE", "FALSE", "NULL", "IS",
    "FIRST", "LAST", "PREV", "NEXT",
}

_NAV_OR_CROSS = re.compile(r"\b(?:FIRST|LAST)\s*\(", re.IGNORECASE)

_PHYS_NAV = re.compile(r"\b(?:PREV|NEXT)\s*\(", re.IGNORECASE)


def has_cross_refs(masked_cond: str, symbols: set[str], self_sym: str) -> bool:
    """Does a (quote-masked) DEFINE condition need the match-state
    kernel? True when it navigates with FIRST()/LAST() or dereferences
    a symbol other than the one being defined. (PREV/NEXT physical
    navigation is handled separately: batch lowers it to lag/lead
    columns BEFORE this check; streaming routes it here via
    ``_PHYS_NAV`` — see run_sql_stream.)"""
    if _NAV_OR_CROSS.search(masked_cond):
        return True
    for other in symbols:
        if other != self_sym and re.search(
            rf"\b{re.escape(other)}\s*\.", masked_cond
        ):
            return True
    return False


def _tokenize(cond: str) -> list[tuple[str, object]]:
    out, pos = [], 0
    while pos < len(cond):
        m = _TOKEN.match(cond, pos)
        if not m:
            raise ValueError(f"unsupported DEFINE syntax at: {cond[pos:]!r}")
        pos = m.end()
        if m.group("num"):
            t = m.group("num")
            out.append(("num", float(t) if "." in t else int(t)))
        elif m.group("str"):
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("ident"):
            name = m.group("ident")
            kw = name.upper()
            out.append(("kw", kw) if kw in _KEYWORDS else ("ident", name))
        elif m.group("op"):
            out.append(("op", m.group("op")))
    return out


def _isna(v) -> bool:
    return v is None or (not isinstance(v, str) and pd.isna(v))


def compile_condition(
    cond: str, self_sym: str, symbols: set[str]
) -> Callable:
    """Compile a cross-symbol SQL DEFINE condition for ``self_sym`` into
    the kernel's callable ``fn(arrs, i, bindings) -> bool``. ``symbols``
    is the full DEFINE symbol set (valid navigation targets)."""
    toks = _tokenize(cond)
    p = [0]  # cursor boxed so the closures below can advance it
    used_cols: set[str] = set()  # every column the condition touches —
    # exposed as fn.columns so the kernel can project/shuffle ONLY these
    # instead of the whole row (the 100-TB shuffle-width win)
    phys = [0]  # >0 while parsing inside a PREV()/NEXT() argument
    # Physical-navigation excursion FRAMES, one per nav-argument nesting
    # level: [r_lo, r_hi, h] where (r_lo, r_hi) bound the NET offsets
    # (relative to the frame's evaluation row) at which column READS
    # occur (None when the subtree reads nothing), and h >= 0 is the
    # worst backward HOP depth — each nav hop boundary-checks j < 0
    # hop-wise, so an intermediate backward hop needs retained history
    # even when the net read lands forward of it. ADVICE r9: siblings
    # take the MAX (they share one history window); only genuine
    # nesting accumulates, and opposite-direction nesting cancels for
    # the forward (NEXT-holdback) bound.
    exc: list[list] = [[None, None, 0]]

    def _note_read() -> None:
        top = exc[-1]
        top[0] = 0 if top[0] is None else min(top[0], 0)
        top[1] = 0 if top[1] is None else max(top[1], 0)

    def peek(k: int = 0):
        j = p[0] + k
        return toks[j] if j < len(toks) else (None, None)

    def take(kind=None, val=None):
        t = peek()
        if (kind and t[0] != kind) or (val is not None and t[1] != val):
            raise ValueError(
                f"unsupported DEFINE syntax near token {t[1]!r} in {cond!r} "
                "— use the Python API's callable defines for anything "
                "beyond comparisons/arithmetic of columns, literals and "
                "FIRST/LAST(Sym.col[, n]) navigation"
            )
        p[0] += 1
        return t

    def nav_fn(kind: str, sym: str, col: str, off: int):
        used_cols.add(col)
        include_self = sym == self_sym

        def fn(arrs, i, bindings):
            rows = bindings.get(sym, ())
            if include_self:
                rows = [*rows, i]
            if len(rows) <= off:
                return None
            idx = rows[off] if kind == "FIRST" else rows[-1 - off]
            v = arrs[col][idx]
            return None if _isna(v) else v

        return fn

    def parse_primary():
        kind, val = peek()
        if kind == "op" and val == "(":
            take()
            node = parse_or()
            take("op", ")")
            return node
        if kind == "op" and val == "-":
            take()
            inner = parse_primary()
            return lambda a, i, b: (
                None if (v := inner(a, i, b)) is None else -v
            )
        if kind == "num" or kind == "str":
            take()
            return lambda a, i, b: val
        if kind == "kw" and val in ("TRUE", "FALSE"):
            take()
            lit = val == "TRUE"
            return lambda a, i, b: lit
        if kind == "kw" and val == "NULL":
            take()
            return lambda a, i, b: None
        if kind == "kw" and val in ("PREV", "NEXT"):
            take()
            take("op", "(")
            phys[0] += 1
            exc.append([None, None, 0])  # fresh frame for the argument
            inner = parse_add()  # expression evaluated on the navigated row
            phys[0] -= 1
            off = 1
            if peek() == ("op", ","):
                take()
                off = take("num")[1]
                if not isinstance(off, int) or off < 0:
                    raise ValueError(
                        f"{val}() offset must be a non-negative integer"
                    )
            take("op", ")")
            shift = -off if val == "PREV" else off
            r_lo, r_hi, h = exc.pop()
            top = exc[-1]
            if r_lo is not None:
                # the argument evaluates at i+shift; its reads are
                # relative to THAT row, so they translate by shift
                lo, hi = r_lo + shift, r_hi + shift
                top[0] = lo if top[0] is None else min(top[0], lo)
                top[1] = hi if top[1] is None else max(top[1], hi)
            # hop depth: this hop reaches max(0, -shift); the
            # argument's hops sit shift further along the path
            top[2] = max(top[2], max(0, h - shift))

            def nav(a, i, b, inner=inner, shift=shift):
                j = i + shift
                if j < 0:
                    return None  # before the partition start: SQL NULL
                try:
                    return inner(a, j, b)
                except IndexError:
                    # beyond the buffer end — unreachable for scanned
                    # rows (the streaming kernel holds back max_next
                    # tail rows); in batch it is the partition end: NULL
                    return None

            return nav
        if kind == "kw" and val in ("FIRST", "LAST"):
            take()
            if phys[0]:
                raise ValueError(
                    f"{val}() (match-state navigation) is not valid "
                    "inside PREV()/NEXT() physical navigation"
                )
            take("op", "(")
            sym = take("ident")[1]
            take("op", ".")
            col = take("ident")[1]
            off = 0
            if peek() == ("op", ","):
                take()
                off = take("num")[1]
                if not isinstance(off, int) or off < 0:
                    raise ValueError(
                        f"{val}() offset must be a non-negative integer"
                    )
            take("op", ")")
            if sym not in symbols:
                raise ValueError(
                    f"{val}({sym}.{col}): {sym!r} is not a DEFINE symbol"
                )
            return nav_fn(val, sym, col, off)
        if kind == "ident":
            take()
            if peek() == ("op", "."):
                take()
                col = take("ident")[1]
                if val not in symbols:
                    raise ValueError(
                        f"{val}.{col}: {val!r} is not a DEFINE symbol "
                        "(table-qualified columns are not valid in DEFINE)"
                    )
                if val == self_sym or phys[0]:
                    # self-reference == the current row's value; inside
                    # PREV()/NEXT() every Sym.col means the NAVIGATED
                    # row's column (physical addressing — the batch
                    # lowering strips symbol prefixes the same way)
                    used_cols.add(col)
                    _note_read()

                    def cur(a, i, b, c=col):
                        v = a[c][i]
                        return None if _isna(v) else v

                    return cur
                # cross bare Sym.col == LAST(Sym.col)
                return nav_fn("LAST", val, col, 0)

            used_cols.add(val)
            _note_read()

            def cur(a, i, b, c=val):
                v = a[c][i]
                return None if _isna(v) else v

            return cur
        raise ValueError(
            f"unsupported DEFINE syntax near token {val!r} in {cond!r}"
        )

    def parse_mul():
        node = parse_primary()
        while peek()[0] == "op" and peek()[1] in ("*", "/"):
            op = take()[1]
            rhs = parse_primary()
            lhs = node
            if op == "*":
                node = lambda a, i, b, L=lhs, R=rhs: (
                    None
                    if (x := L(a, i, b)) is None or (y := R(a, i, b)) is None
                    else x * y
                )
            else:
                node = lambda a, i, b, L=lhs, R=rhs: (
                    None
                    if (x := L(a, i, b)) is None or (y := R(a, i, b)) is None
                    else x / y
                )
        return node

    def parse_add():
        node = parse_mul()
        while peek()[0] == "op" and peek()[1] in ("+", "-"):
            op = take()[1]
            rhs = parse_mul()
            lhs = node
            if op == "+":
                node = lambda a, i, b, L=lhs, R=rhs: (
                    None
                    if (x := L(a, i, b)) is None or (y := R(a, i, b)) is None
                    else x + y
                )
            else:
                node = lambda a, i, b, L=lhs, R=rhs: (
                    None
                    if (x := L(a, i, b)) is None or (y := R(a, i, b)) is None
                    else x - y
                )
        return node

    _CMP = {
        "=": lambda x, y: x == y,
        "<>": lambda x, y: x != y,
        "!=": lambda x, y: x != y,
        "<": lambda x, y: x < y,
        "<=": lambda x, y: x <= y,
        ">": lambda x, y: x > y,
        ">=": lambda x, y: x >= y,
    }

    def parse_cmp():
        node = parse_add()
        if peek() == ("kw", "IS"):
            take()
            negate = False
            if peek() == ("kw", "NOT"):
                take()
                negate = True
            take("kw", "NULL")
            lhs = node
            return lambda a, i, b, L=lhs, neg=negate: (L(a, i, b) is None) != neg
        if peek()[0] == "op" and peek()[1] in _CMP:
            op = _CMP[take()[1]]
            rhs = parse_add()
            lhs = node
            return lambda a, i, b, L=lhs, R=rhs, f=op: (
                None
                if (x := L(a, i, b)) is None or (y := R(a, i, b)) is None
                else bool(f(x, y))
            )
        return node

    def parse_not():
        if peek() == ("kw", "NOT"):
            take()
            inner = parse_not()
            return lambda a, i, b: (
                None if (v := inner(a, i, b)) is None else not v
            )
        return parse_cmp()

    def parse_and():
        node = parse_not()
        while peek() == ("kw", "AND"):
            take()
            rhs = parse_not()
            lhs = node

            def kleene_and(a, i, b, L=lhs, R=rhs):
                x = L(a, i, b)
                if x is False:
                    return False
                y = R(a, i, b)
                if y is False:
                    return False
                return None if x is None or y is None else True

            node = kleene_and
        return node

    def parse_or():
        node = parse_and()
        while peek() == ("kw", "OR"):
            take()
            rhs = parse_and()
            lhs = node

            def kleene_or(a, i, b, L=lhs, R=rhs):
                x = L(a, i, b)
                if x is True:
                    return True
                y = R(a, i, b)
                if y is True:
                    return True
                return None if x is None or y is None else False

            node = kleene_or
        return node

    root = parse_or()
    if p[0] != len(toks):
        raise ValueError(
            f"unsupported trailing DEFINE syntax at token "
            f"{toks[p[0]][1]!r} in {cond!r}"
        )

    def fn(arrs, i, bindings):
        return root(arrs, i, bindings) is True

    fn.columns = frozenset(used_cols)
    r_lo, r_hi, h = exc[0]
    # history must cover the deepest backward hop (every backward read
    # is reached through hops, so h already dominates -r_lo; keep the
    # max as a belt-and-braces bound); holdback covers only NET forward
    # reads — forward hops are not boundary-checked
    fn.max_prev = max(h, -(r_lo or 0))
    fn.max_next = max(0, r_hi or 0)
    return fn
