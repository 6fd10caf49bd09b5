"""Local replica of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB on the fixture tables (sf0.001 here for
speed; the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from incubator_beam_spark import registry

from .conftest import SF_DIR, assert_matches_oracle

ALL = registry.load_all()
WITH_ORACLE = sorted(n for n, q in ALL.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in ALL.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, name):
    q = ALL[name]
    df = q.fn(spark, SF_DIR)
    assert_matches_oracle(df, duck, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = ALL[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
