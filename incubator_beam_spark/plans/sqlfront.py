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


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute a Beam-SQL-dialect query against registered temp views."""
    return spark.sql(rewrite(query))
