"""Property-based checks (hypothesis) — the ValidatesRunner analog:
randomized inputs against independent reference implementations
(driver-side python, pandas). Example counts are small because each
example runs a Spark job; the properties target the operators with
hand-rolled distributed logic (CC, as-of join, lifted combiners) where
randomized coverage pays the most."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    n_edges = draw(st.integers(min_value=0, max_value=60))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(n_edges)
    ]
    return n, edges


@pytest.mark.deep  # ~19 s hypothesis sweep; CC stays covered by the
# default-tier contract test + in-window oracle gates
@given(graphs())
@SET
def test_connected_components_matches_union_find(spark, g):
    from incubator_beam_spark.dataops.dedup import connected_components

    n, edges = g
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {i: comp_min[find(i)] for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    if edges:
        e = spark.createDataFrame(edges, ["src", "dst"])
    else:
        e = spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.component for r in connected_components(e, nodes=nodes).collect()}
    assert got == expected


@st.composite
def asof_frames(draw):
    keys = ["a", "b"]
    nl = draw(st.integers(1, 12))
    nr = draw(st.integers(1, 12))
    ts = st.integers(0, 10_000)
    left = pd.DataFrame(
        {
            "k": [draw(st.sampled_from(keys)) for _ in range(nl)],
            "t": pd.to_datetime(
                sorted(draw(st.lists(ts, min_size=nl, max_size=nl, unique=True))),
                unit="s",
            ),
            "lv": list(range(nl)),
        }
    )
    right = pd.DataFrame(
        {
            "k": [draw(st.sampled_from(keys)) for _ in range(nr)],
            "t": pd.to_datetime(
                sorted(draw(st.lists(ts, min_size=nr, max_size=nr, unique=True))),
                unit="s",
            ),
            "rv": list(range(100, 100 + nr)),
        }
    )
    return left, right


@given(asof_frames())
@SET
def test_asof_join_matches_merge_asof(spark, frames):
    from incubator_beam_spark.dataops.temporal import asof_join

    left, right = frames
    expected = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k"
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="t",
        right_ts="t",
    ).toPandas()
    g = {r.lv: r.r_rv for r in got.itertuples()}
    e = {
        r.lv: (None if pd.isna(r.rv) else int(r.rv)) for r in expected.itertuples()
    }
    assert {k: (None if pd.isna(v) else int(v)) for k, v in g.items()} == e


@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.floats(0.1, 100.0)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 8),
)
@SET
def test_lifted_combine_per_key_matches_reduce(spark, kvs, parts):
    import math

    import incubator_beam_spark.core as ibs

    class GeoMean(ibs.CombineFn):
        def create_accumulator(self):
            return (0.0, 0)

        def add_input(self, acc, v):
            return (acc[0] + math.log(v), acc[1] + 1)

        def merge_accumulators(self, accs):
            return (sum(a for a, _ in accs), sum(n for _, n in accs))

        def extract_output(self, acc):
            return math.exp(acc[0] / acc[1]) if acc[1] else 0.0

    p = ibs.Pipeline(spark)
    pc = p | ibs.Create(kvs)
    pc = ibs.PCollection(pc.df.repartition(parts), p)
    got = {r.key: r.value for r in (pc | ibs.CombinePerKey(GeoMean())).df.collect()}

    expected = {}
    for k, v in kvs:
        s, n = expected.get(k, (0.0, 0))
        expected[k] = (s + math.log(v), n + 1)
    expected = {k: math.exp(s / n) for k, (s, n) in expected.items()}
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9 * max(1.0, expected[k])


@pytest.mark.deep  # ~13 s hypothesis sweep; join_bloom_prefilter stays
# oracle-checked (contract drive + bench) in every round
@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=0, max_size=40),
    st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=60),
    st.sampled_from([256, 4096, 1 << 17]),
)
@settings(max_examples=8, deadline=None)
def test_bloom_prefilter_join_matches_plain_join(spark, dim_keys, fact_keys, num_bits):
    """Property: for ANY key sets and ANY filter size (including
    deliberately saturated 256-bit), the bloom-prefiltered join equals
    the plain join exactly — false positives cancelled, no false
    negatives possible."""
    from pyspark.sql import functions as F

    from incubator_beam_spark.dataops.joins import bloom_prefilter_join

    dim = spark.createDataFrame(
        [(k, i) for i, k in enumerate(set(dim_keys))] or [(None, None)],
        "key long, v long",
    ).filter(F.col("key").isNotNull())
    fact = spark.createDataFrame([(k,) for k in fact_keys], "key long")
    got = sorted(
        (r.key, r.v) for r in bloom_prefilter_join(fact, dim, on="key", num_bits=num_bits).collect()
    )
    want = sorted((r.key, r.v) for r in fact.join(dim, "key").collect())
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # key
            st.floats(min_value=0, max_value=500),           # start
            st.floats(min_value=1, max_value=60),            # length
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([0.0, 5.0, 25.0]),
)
@settings(max_examples=10, deadline=None)
def test_slack_merge_matches_python_reference(spark, rows, slack):
    """Property: merge_proto_windows(slack) equals a brute-force Python
    interval-coalescing reference for arbitrary windows and slacks
    (slack=0 is overlap-only; slack>0 merges disjoint gaps <= slack)."""
    from pyspark.sql import functions as F

    from incubator_beam_spark.windows import merge_proto_windows

    data = [(k, float(s), float(s + ln)) for k, s, ln in rows]
    df = spark.createDataFrame(data, "key int, window_start double, window_end double")
    got = sorted(
        (r.key, r.window_start, r.window_end)
        for r in merge_proto_windows(df, ["key"], slack=slack).collect()
    )

    # python reference: per key, sort by (start, end), coalesce islands
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in data:
        by_key[k].append((s, e))
    expected = []
    for k, wins in by_key.items():
        wins.sort()
        islands = []
        for s, e in wins:
            if islands and s <= islands[-1][1] + slack:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        # every original window maps to its island's merged bounds
        for s, e in wins:
            for ms, me in islands:
                if ms <= s and e <= me:
                    expected.append((k, ms, me))
                    break
    assert got == sorted(expected)


@pytest.mark.deep  # ~22 s seeded-random sweep; the compiled DEFINE path
# stays exercised by the default-tier CEP suite + in-window CEP gates
def test_cepdefine_random_expressions_vs_catalyst(spark):
    """Seeded-random differential fuzz of the cross-symbol DEFINE
    compiler's scalar semantics against Catalyst: 80 generated
    conditions over numeric/string columns WITH nulls — the compiled
    callable (empty bindings) must keep exactly the rows Spark's
    filter keeps, including Kleene NULL behavior under NOT/AND/OR and
    null propagation through arithmetic. Division is excluded (ANSI
    div-by-zero) and tokens are space-joined (a bare '--' would lex as
    a SQL comment in BOTH engines, but avoiding it keeps conditions
    readable in failure output)."""
    import random

    from incubator_beam_spark.plans.cepdefine import compile_condition

    rng = random.Random(20260815)
    rows = []
    for i in range(24):
        v = rng.choice([None, -5.0, 0.0, 1.5, 3.0, 7.25, 100.0])
        w = rng.choice([None, -3, 0, 2, 9])
        t = rng.choice([None, "a", "b", "c"])
        rows.append((i, v, w, t))
    df = spark.createDataFrame(rows, "i int, v double, w bigint, t string")
    pdf = df.toPandas()
    arrs = {c: pdf[c].to_numpy() for c in pdf.columns}

    def num(depth=0):
        r = rng.random()
        if depth >= 2 or r < 0.4:
            return rng.choice(["v", "w", "1", "2", "3.5", "(0 - 2)"])
        op = rng.choice(["+", "-", "*"])
        return f"( {num(depth + 1)} {op} {num(depth + 1)} )"

    def cmp():
        if rng.random() < 0.2:
            col = rng.choice(["v", "w", "t"])
            return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        if rng.random() < 0.3:
            sop = rng.choice(["=", "<>", "<", ">"])
            return f"t {sop} '{rng.choice(['a', 'b', 'z'])}'"
        op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        return f"{num()} {op} {num()}"

    def boolean(depth=0):
        r = rng.random()
        if depth >= 2 or r < 0.45:
            return cmp()
        if r < 0.55:
            return f"NOT ( {boolean(depth + 1)} )"
        op = rng.choice(["AND", "OR"])
        return f"( {boolean(depth + 1)} {op} {boolean(depth + 1)} )"

    for _ in range(80):
        cond = boolean()
        fn = compile_condition(cond, "X", {"X"})
        mine = {int(arrs["i"][k]) for k in range(len(pdf)) if fn(arrs, k, {})}
        catalyst = {r.i for r in df.filter(cond).collect()}
        assert mine == catalyst, f"{cond!r}: {mine ^ catalyst}"


@pytest.mark.deep  # ~8 s seeded-random sweep; expression measures stay
# covered by the default-tier CEP measure tests + oracle gates
def test_measures_expression_fuzz_vs_materialized(spark):
    """Seeded-random differential fuzz of EXPRESSION MEASURES (verdict
    r7 item 6, extending the r7 cepdefine-vs-Catalyst pattern to the
    measures compiler): random arithmetic over random aggregate calls
    (FIRST/LAST with logical offsets, COUNT(Sym.col|Sym.*|*),
    SUM/AVG/MIN/MAX, SUBSET union symbols, optional FINAL mode) goes
    through the full SQL front door — ``_extract_agg_calls`` lowers
    each call to an internal ``__mK`` kernel measure and the arithmetic
    to a post-SELECT. The oracle is a WHOLE-MATCH MATERIALIZATION of
    the same pattern (ALL ROWS PER MATCH + per-row CLASSIFIER — a
    disjoint output path), with every aggregate recomputed in pandas
    per (k, match_number) from the matched rows and the arithmetic
    evaluated in Python with SQL null propagation. Any disagreement in
    call extraction, dedup, offset navigation, null handling, subset
    resolution, or the post-SELECT rewrite surfaces as a value diff."""
    import math
    import random

    from incubator_beam_spark.plans.sqlfront import run_sql

    rng = random.Random(20260816)
    rows = []
    for k in range(3):
        for o in range(60):
            qty = rng.randrange(10)
            price = (
                None
                if rng.random() < 0.15
                else rng.choice([0.25, 1.5, 2.0, 3.75, 5.0, 8.25])
            )
            rows.append((k, o, price, qty))
    df = spark.createDataFrame(rows, "k int, o int, price double, qty int")
    df.createOrReplaceTempView("mx_fuzz")

    tail = """ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B{1,3} C)
          SUBSET U = (A, B)
          DEFINE A AS qty >= 7, B AS qty <= 4, C AS qty >= 0"""

    # whole-match materialization: ALL ROWS emits every matched row with
    # its classifier — the independent view the oracle recomputes from
    mat = run_sql(
        spark,
        """SELECT k, match_number, classifier, o
           FROM mx_fuzz MATCH_RECOGNIZE (
             PARTITION BY k ORDER BY o
             ALL ROWS PER MATCH
             AFTER MATCH SKIP PAST LAST ROW
             PATTERN (A B{1,3} C)
             DEFINE A AS qty >= 7, B AS qty <= 4, C AS qty >= 0)""",
    ).toPandas()
    # the all-rows kernel emits (partition, order, match_number,
    # classifier); rejoin the payload columns by (k, o)
    src = df.toPandas()
    mat = mat.merge(src, on=["k", "o"], how="left")
    assert len(mat) > 30  # anti-vacuity: the fixture must produce matches
    groups = {
        key: g.sort_values("o") for key, g in mat.groupby(["k", "match_number"])
    }

    def _is_null(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    def call_value(g, kind, sym, col, off):
        if sym is None:
            sub = g
        elif sym == "U":
            sub = g[g.classifier.isin(["A", "B"])]
        else:
            sub = g[g.classifier == sym]
        if kind == "count":
            if col == "*":
                return float(len(sub))
            return float(sub[col].notna().sum())
        vals = list(sub[col])
        if kind in ("first", "last"):
            i = off or 0
            if i >= len(vals):
                return None
            v = vals[i] if kind == "first" else vals[len(vals) - 1 - i]
            return None if _is_null(v) else float(v)
        nn = [float(v) for v in vals if not _is_null(v)]
        if not nn:
            return None
        if kind == "sum":
            return float(sum(nn))
        if kind == "avg":
            return float(sum(nn) / len(nn))
        return float(min(nn)) if kind == "min" else float(max(nn))

    def gen_call():
        kind = rng.choice(["first", "last", "count", "sum", "avg", "min", "max"])
        mode = "FINAL " if rng.random() < 0.2 else ""
        if kind == "count" and rng.random() < 0.3:
            star_sym = rng.choice([None, "A", "B", "C", "U"])
            sql = (
                f"{mode}COUNT(*)"
                if star_sym is None
                else f"{mode}COUNT({star_sym}.*)"
            )
            return sql, ("count", star_sym, "*", None)
        sym = rng.choice(["A", "B", "C", "U"])
        col = rng.choice(["price", "qty"])
        off = rng.choice([None, None, 1, 2]) if kind in ("first", "last") else None
        inner = f"{sym}.{col}" + (f", {off}" if off is not None else "")
        return f"{mode}{kind.upper()}({inner})", (kind, sym, col, off)

    def gen_expr(depth=0):
        r = rng.random()
        if depth >= 2 or r < 0.45:
            if rng.random() < 0.75:
                sql, spec = gen_call()
                return sql, ("call", spec)
            lit = rng.choice([1, 2, 3, 10])
            return str(lit), ("lit", float(lit))
        op = rng.choice(["+", "-", "*"])
        ls, ln = gen_expr(depth + 1)
        rs, rn = gen_expr(depth + 1)
        return f"( {ls} {op} {rs} )", (op, ln, rn)

    def has_call(node):
        if node[0] == "call":
            return True
        if node[0] == "lit":
            return False
        return has_call(node[1]) or has_call(node[2])

    def eval_node(node, g):
        tag = node[0]
        if tag == "lit":
            return node[1]
        if tag == "call":
            return call_value(g, *node[1])
        a, b = eval_node(node[1], g), eval_node(node[2], g)
        if a is None or b is None:
            return None  # SQL null propagation
        return a + b if tag == "+" else a - b if tag == "-" else a * b

    checked = 0
    for _round in range(10):
        exprs = []
        while len(exprs) < 5:
            sql, node = gen_expr()
            if has_call(node):
                exprs.append((sql, node))
        items = ",\n                   ".join(
            f"{sql} AS e{i}" for i, (sql, _) in enumerate(exprs)
        )
        got = run_sql(
            spark,
            f"""SELECT * FROM mx_fuzz MATCH_RECOGNIZE (
                  PARTITION BY k
                  ORDER BY o
                  MEASURES {items},
                   MATCH_NUMBER() AS mn
                  {tail})""",
        ).toPandas()
        assert len(got) == len(groups)
        for _, row in got.iterrows():
            g = groups[(row.k, row.mn)]
            for i, (sql, node) in enumerate(exprs):
                want = eval_node(node, g)
                have = row[f"e{i}"]
                if _is_null(have):
                    assert want is None, f"{sql!r}: engine NULL, oracle {want}"
                else:
                    assert want is not None and math.isclose(
                        float(have), want, rel_tol=1e-9, abs_tol=1e-9
                    ), f"{sql!r}: engine {have}, oracle {want}"
                checked += 1
    assert checked == 50 * len(groups)


def test_measures_running_all_rows_fuzz_vs_prefix_oracle(spark):
    """Companion fuzz for the ALL ROWS PER MATCH measure path: RUNNING
    aggregate measures are PREFIX scans (the value at row i aggregates
    only the match rows mapped so far) while FINAL pins the whole-match
    value on every row. The oracle rebuilds both from the materialized
    per-row output itself: for each output row, recompute every RUNNING
    call over the classifier-tagged prefix and every FINAL call over
    the whole match in pandas. Catches off-by-one prefix windows,
    running-offset navigation (LAST(A.col, 1) over the prefix), and
    mode mix-ups that the one-row fuzz cannot see (there RUNNING ==
    FINAL by construction)."""
    import math
    import random

    from incubator_beam_spark.plans.sqlfront import run_sql

    rng = random.Random(20260817)
    rows = []
    for k in range(3):
        for o in range(50):
            qty = rng.randrange(10)
            price = (
                None
                if rng.random() < 0.15
                else rng.choice([0.25, 1.5, 2.0, 3.75, 5.0, 8.25])
            )
            rows.append((k, o, price, qty))
    df = spark.createDataFrame(rows, "k int, o int, price double, qty int")
    df.createOrReplaceTempView("mx_fuzz_ar")
    src = df.toPandas().set_index(["k", "o"])

    def _is_null(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    def prefix_value(prefix_rows, kind, sym, col, off):
        """prefix_rows: list of (classifier, price, qty) seen so far."""
        if sym is None:
            sub = prefix_rows
        elif sym == "U":
            sub = [r for r in prefix_rows if r[0] in ("A", "B")]
        else:
            sub = [r for r in prefix_rows if r[0] == sym]
        ci = 1 if col == "price" else 2
        if kind == "count":
            if col == "*":
                return float(len(sub))
            return float(sum(1 for r in sub if not _is_null(r[ci])))
        vals = [r[ci] for r in sub]
        if kind in ("first", "last"):
            i = off or 0
            if i >= len(vals):
                return None
            v = vals[i] if kind == "first" else vals[len(vals) - 1 - i]
            return None if _is_null(v) else float(v)
        nn = [float(v) for v in vals if not _is_null(v)]
        if not nn:
            return None
        if kind == "sum":
            return float(sum(nn))
        if kind == "avg":
            return float(sum(nn) / len(nn))
        return float(min(nn)) if kind == "min" else float(max(nn))

    def gen_call():
        kind = rng.choice(["first", "last", "count", "sum", "avg", "min", "max"])
        mode = rng.choice(["RUNNING", "FINAL", "", ""])  # bare == RUNNING here
        prefix = f"{mode} " if mode else ""
        if kind == "count" and rng.random() < 0.3:
            star_sym = rng.choice([None, "A", "B", "C", "U"])
            sql = (
                f"{prefix}COUNT(*)"
                if star_sym is None
                else f"{prefix}COUNT({star_sym}.*)"
            )
            return sql, ("count", star_sym, "*", None, mode or "RUNNING")
        sym = rng.choice(["A", "B", "C", "U"])
        col = rng.choice(["price", "qty"])
        off = rng.choice([None, None, 1]) if kind in ("first", "last") else None
        inner = f"{sym}.{col}" + (f", {off}" if off is not None else "")
        return (
            f"{prefix}{kind.upper()}({inner})",
            (kind, sym, col, off, mode or "RUNNING"),
        )

    for _round in range(6):
        calls = [gen_call() for _ in range(5)]
        items = ",\n                   ".join(
            f"{sql} AS m{i}" for i, (sql, _) in enumerate(calls)
        )
        got = run_sql(
            spark,
            f"""SELECT * FROM mx_fuzz_ar MATCH_RECOGNIZE (
                  PARTITION BY k
                  ORDER BY o
                  MEASURES {items}
                  ALL ROWS PER MATCH
                  AFTER MATCH SKIP PAST LAST ROW
                  PATTERN (A B{{1,3}} C)
                  SUBSET U = (A, B)
                  DEFINE A AS qty >= 7, B AS qty <= 4, C AS qty >= 0)""",
        ).toPandas()
        assert len(got) > 30
        for (k, mn), g in got.groupby(["k", "match_number"]):
            g = g.sort_values("o")
            trail = []
            whole = [
                (r.classifier, *src.loc[(k, r.o)][["price", "qty"]])
                for r in g.itertuples()
            ]
            for pos, r in enumerate(g.itertuples()):
                trail.append(whole[pos])
                for i, (sql, (kind, sym, col, off, mode)) in enumerate(calls):
                    scope = whole if mode == "FINAL" else trail
                    want = prefix_value(scope, kind, sym, col, off)
                    have = getattr(r, f"m{i}")
                    if _is_null(have):
                        assert want is None, (
                            f"{sql!r} row {r.o}: engine NULL, oracle {want}"
                        )
                    else:
                        assert want is not None and math.isclose(
                            float(have), want, rel_tol=1e-9, abs_tol=1e-9
                        ), f"{sql!r} row {r.o}: engine {have}, oracle {want}"
