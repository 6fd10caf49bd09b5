"""SQL front door: Beam-SQL-dialect queries on Catalyst.

The reference routes SQL through Calcite and a Java expansion service
(reference ``sdks/java/extensions/sql/.../SqlTransform.java:116``,
``sdks/python/apache_beam/transforms/sql.py:34``). Here the string goes to
``spark.sql`` directly; the only dialect gap is Calcite's windowing
group-functions, which we rewrite at the source level (SURVEY.md §4.2,
``BeamAggregationRule.java:121-153``):

    TUMBLE(ts, INTERVAL '1' HOUR)      -> window(ts, '1 hour')
    HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)
                                       -> window(ts, '10 minute', '5 minute')
    SESSION(ts, INTERVAL '30' MINUTE)  -> session_window(ts, '30 minute')
    TUMBLE_START/.._END, HOP_START/.._END -> window.start / window.end
    SESSION_START/SESSION_END          -> session_window.start / .end

Everything else (aggregates, analytic OVER clauses, set ops, UNNEST,
subqueries) is already Spark SQL — Calcite's operator table is a subset of
Spark's catalog (SURVEY.md §2.8).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_INTERVAL = r"INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)"


def _iv(n: str, unit: str) -> str:
    return f"'{n} {unit.lower()}'"


def rewrite(query: str) -> str:
    """Rewrite Calcite windowing group-functions to Spark window functions."""
    q = query

    # start/end accessors first (longer tokens), then the grouping fns
    q = re.sub(
        rf"TUMBLE_(START|END)\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window.{m.group(1).lower()}",
        q,
        flags=re.IGNORECASE,
    )
    q = re.sub(
        rf"HOP_(START|END)\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window.{m.group(1).lower()}",
        q,
        flags=re.IGNORECASE,
    )
    q = re.sub(
        rf"SESSION_(START|END)\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"session_window.{m.group(1).lower()}",
        q,
        flags=re.IGNORECASE,
    )
    q = re.sub(
        rf"TUMBLE\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"window({m.group(1)}, {_iv(m.group(2), m.group(3))})",
        q,
        flags=re.IGNORECASE,
    )
    # Calcite HOP(ts, slide, size); Spark window(ts, size, slide)
    q = re.sub(
        rf"HOP\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*,\s*{_INTERVAL}\s*\)",
        lambda m: (
            f"window({m.group(1)}, {_iv(m.group(4), m.group(5))}, "
            f"{_iv(m.group(2), m.group(3))})"
        ),
        q,
        flags=re.IGNORECASE,
    )
    q = re.sub(
        rf"SESSION\s*\(\s*([\w.]+)\s*,\s*{_INTERVAL}\s*\)",
        lambda m: f"session_window({m.group(1)}, {_iv(m.group(2), m.group(3))})",
        q,
        flags=re.IGNORECASE,
    )
    # DDL: Beam's CREATE EXTERNAL TABLE ... TYPE fmt LOCATION 'p'
    # (reference parserImpls.ftl:149) -> Spark CREATE TABLE ... USING fmt
    q = re.sub(r"CREATE\s+EXTERNAL\s+TABLE", "CREATE TABLE", q, flags=re.IGNORECASE)
    q = re.sub(
        r"\bTYPE\s+(text|parquet|csv|json|avro)\b",
        lambda m: f"USING {m.group(1)}",
        q,
        flags=re.IGNORECASE,
    )
    return q


_MR_FROM = re.compile(
    r"FROM\s+([\w.]+)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE
)
_MR_MEASURE = re.compile(
    r"^(FIRST|LAST|COUNT)\s*\(\s*(?:(\w+)\s*\.\s*)?(\*|[\w]+)\s*\)\s+AS\s+(\w+)$",
    re.IGNORECASE,
)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _parse_match_recognize(query: str):
    """Extract the SQL-standard MATCH_RECOGNIZE clause (Calcite's
    ``BeamMatchRel`` surface, reference ``BeamMatchRule.java`` /
    ``impl/cep/``): returns (table, kwargs-for-match_recognize,
    query-with-clause-replaced-by-{MR}) or None when absent.

    Supported grammar: PARTITION BY / ORDER BY column lists, MEASURES
    of FIRST(Sym.col) | LAST(Sym.col) | COUNT(Sym.*) | COUNT(*) with
    mandatory AS aliases, ONE|ALL ROWS PER MATCH, AFTER MATCH SKIP
    PAST LAST ROW | TO NEXT ROW, PATTERN (...), DEFINE Sym AS
    <Spark boolean SQL>. PREV()/NEXT() navigation inside DEFINE is
    rejected with a pointer to the Python API's callable defines
    (match-state-dependent predicates need the NFA bindings hook)."""
    m = _MR_FROM.search(query)
    if m is None:
        return None
    table = m.group(1)
    # balance parens to find the clause body
    depth, i = 1, m.end()
    while i < len(query) and depth:
        if query[i] == "(":
            depth += 1
        elif query[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError("unbalanced parens in MATCH_RECOGNIZE clause")
    body = query[m.end() : i - 1]
    # the surrounding query keeps its shape (any trailing "AS alias"
    # simply aliases the replacement view)
    rest = query[:m.start()] + "FROM {MR}" + query[i:]
    kw: dict = {"after_match": "past last row", "all_rows": False}

    clauses = re.split(
        r"\b(PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW\s+PER\s+MATCH|"
        r"ALL\s+ROWS\s+PER\s+MATCH|AFTER\s+MATCH\s+SKIP|PATTERN|DEFINE)\b",
        body,
        flags=re.IGNORECASE,
    )
    it = iter(clauses[1:])
    for head, text in zip(it, it):
        head = re.sub(r"\s+", " ", head.upper())
        text = text.strip()
        if head == "PARTITION BY":
            kw["partition_by"] = [c.strip() for c in text.split(",")]
        elif head == "ORDER BY":
            kw["order_by"] = [c.strip() for c in text.split(",")]
        elif head == "MEASURES":
            measures = {}
            for item in _split_top_level(text):
                mm = _MR_MEASURE.match(re.sub(r"\s+", " ", item.strip()))
                if not mm:
                    raise ValueError(f"unsupported MEASURES item: {item!r}")
                kind, sym, col, name = mm.groups()
                kind = kind.lower()
                if kind == "count":
                    if col != "*":
                        raise ValueError(
                            "COUNT in MEASURES supports COUNT(*) / "
                            "COUNT(Sym.*) (row counting); COUNT(Sym.col) "
                            "non-null counting is not implemented"
                        )
                    measures[name] = ("count", sym)
                else:
                    if col == "*":
                        raise ValueError(f"{kind.upper()}(*) is not valid")
                    measures[name] = (kind, sym, col)
            kw["measures"] = measures
        elif head == "ALL ROWS PER MATCH":
            kw["all_rows"] = True
        elif head == "ONE ROW PER MATCH":
            pass
        elif head == "AFTER MATCH SKIP":
            mode = re.sub(r"\s+", " ", text.upper())
            m_sym = re.match(r"TO (FIRST|LAST) (\w+)", mode)
            if mode.startswith("PAST LAST ROW"):
                kw["after_match"] = "past last row"
            elif mode.startswith("TO NEXT ROW"):
                kw["after_match"] = "to next row"
            elif m_sym:
                # preserve the symbol's original case from the raw text
                raw = re.match(
                    r"\s*TO\s+(?:FIRST|LAST)\s+(\w+)", text, re.IGNORECASE
                )
                kw["after_match"] = (
                    f"to {m_sym.group(1).lower()} {raw.group(1)}"
                )
            else:
                raise ValueError(f"unsupported AFTER MATCH SKIP mode: {text!r}")
        elif head == "PATTERN":
            pat = text.strip()
            if not pat.startswith("("):
                raise ValueError("PATTERN must be parenthesized")
            kw["pattern"] = pat[1 : pat.rindex(")")].strip()
        elif head == "DEFINE":
            if re.search(r"\b(PREV|NEXT)\s*\(", text, re.IGNORECASE):
                raise ValueError(
                    "PREV()/NEXT() in DEFINE is not supported in the SQL "
                    "front door; use the Python API's callable defines "
                    "(plans/cep.py match_recognize) for match-state-"
                    "dependent predicates"
                )
            define = {}
            for item in _split_top_level(text):
                name, _, cond = re.split(r"\s+(AS)\s+", item, 1, re.IGNORECASE)
                define[name.strip()] = cond.strip()  # raw SQL; F.expr later
            kw["define"] = define
    for req in ("partition_by", "order_by", "pattern", "define"):
        if req not in kw:
            raise ValueError(f"MATCH_RECOGNIZE clause missing {req.upper()}")
    if kw["all_rows"]:
        if kw.get("measures"):
            raise ValueError("ALL ROWS PER MATCH does not take MEASURES here")
        kw["measures"] = {}
    elif "measures" not in kw:
        raise ValueError("ONE ROW PER MATCH requires a MEASURES clause")
    return table, kw, rest


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute a Beam-SQL-dialect query against registered temp views.

    Standard ``FROM t MATCH_RECOGNIZE (...)`` clauses lower to the CEP
    kernel (plans/cep.py) and re-enter the query as a temp view, so the
    surrounding SELECT/WHERE/ORDER BY stays ordinary Spark SQL."""
    mr = _parse_match_recognize(query)
    if mr is not None:
        import uuid

        from .cep import match_recognize

        from pyspark.sql import functions as F

        table, kw, rest = mr
        kw["define"] = {n: F.expr(c) for n, c in kw["define"].items()}
        view = f"__mr_{uuid.uuid4().hex[:10]}"
        match_recognize(spark.table(table), **kw).createOrReplaceTempView(view)
        return spark.sql(rewrite(rest.replace("{MR}", view)))
    return spark.sql(rewrite(query))
