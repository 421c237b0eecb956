"""Every oracle-bearing catalog query must match DuckDB exactly —
this test is a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from odin_rs_spark.plans.catalog import CATALOG
from tests.oracle import compare, duckdb_con

ORACLE_SPECS = [s for s in CATALOG.values() if s.sql is not None]
ROWS_ONLY_SPECS = [s for s in CATALOG.values() if s.sql is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_match(spec, spark, sf_dir, con):
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, con, spec.sql)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spec, spark, sf_dir):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
