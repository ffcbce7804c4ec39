"""Every catalog entry with an oracle must hash-match DuckDB at sf0.001
(fast); the driver re-checks at sf0.01. This is the t2 gate run locally."""

from __future__ import annotations

import pytest

from sparkstreaming_realtime_project_spark.plans import catalog

from .oracle import compare, duck_connection

SPECS = [s for s in catalog.registry() if s.sql is not None]
ROWS_ONLY = [s for s in catalog.registry() if s.sql is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, sf_dir, duck, spec):
    df = spec.spark(spark, sf_dir)
    ok, msg = compare(df, duck, spec.sql)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize(
    "spec", ROWS_ONLY or [None], ids=[s.name for s in ROWS_ONLY] or ["none"]
)
def test_rows_only_runs(spark, sf_dir, spec):
    if spec is None:
        pytest.skip("no rows-only specs")
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
