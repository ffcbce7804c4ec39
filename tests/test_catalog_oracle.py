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


def test_registry_rotation_order():
    """The driver's CORRECTNESS window covers only the first 50 registry
    entries — registry() must float every entry WITHOUT a prior
    driver-verified green row ahead of all previously-verified ones
    (oldest-waiting first), or entries can starve outside the window
    forever."""
    from sparkstreaming_realtime_project_spark.plans.catalog import (
        _DRIVER_VERIFIED_R2,
        _DRIVER_VERIFIED_R3,
        _DRIVER_WINDOW_R4,
        registry,
    )

    names = [s.name for s in registry()]
    # the r4-window cohort counts as exposed (it occupied the round-4
    # driver window) even though its CORRECTNESS artifact never landed
    verified = _DRIVER_VERIFIED_R2 | _DRIVER_VERIFIED_R3 | _DRIVER_WINDOW_R4
    first_verified = min(
        (i for i, n in enumerate(names) if n in verified), default=len(names)
    )
    # no never-verified entry may appear after the first verified one
    stragglers = [n for n in names[first_verified:] if n not in verified]
    assert not stragglers, f"never-driver-verified entries queued behind verified: {stragglers}"
    # and the window itself is fully spent on never-verified entries
    # while more than 50 of them exist
    never = [n for n in names if n not in verified]
    if len(never) >= 50:
        assert all(n not in verified for n in names[:50])


def test_date_queries_tz_robust(spark, sf_dir):
    """The loader pins spark.sql.session.timeZone=UTC on every call
    (sources/batch.py), so date/hour-string outputs cannot drift with
    the host or session timezone. Probe: poison the session tz, run the
    most tz-sensitive entries through the loader, assert the pin put
    UTC back and the dt/hr values match the UTC goldens."""
    from sparkstreaming_realtime_project_spark.plans.catalog import registry

    reg = {s.name: s for s in registry()}
    tz_key = "spark.sql.session.timeZone"
    spark.conf.set(tz_key, "America/New_York")
    try:
        poisoned = sorted(
            tuple(r) for r in reg["a_dau_hourly"].spark(spark, sf_dir).collect()
        )
        assert spark.conf.get(tz_key) == "UTC"  # loader re-pinned
        clean = sorted(
            tuple(r) for r in reg["a_dau_hourly"].spark(spark, sf_dir).collect()
        )
        # identical hour-bucket rows whether or not the session tz was
        # poisoned before the load — the UTC pin, not the ambient tz,
        # decides the output
        assert poisoned == clean and len(clean) > 0
        compact = reg["p_cdc_compact"].spark(spark, sf_dir)
        assert compact.count() > 0  # epoch-us output, tz-free by contract
    finally:
        spark.conf.set(tz_key, "UTC")


def test_ansi_sql_surface_matches_dataframe_plans(spark, sf_dir):
    """The engine's SQL front door: ANSI-dialect catalog oracles run
    through spark.sql() on temp views must return exactly what the
    DataFrame plans return — the same declarative query planable either
    way (a reference user can keep writing SQL). Only dialect-portable
    entries qualify (no strftime/epoch_us/list_* DuckDB-isms)."""
    from sparkstreaming_realtime_project_spark.plans.catalog import registry
    from sparkstreaming_realtime_project_spark.sources.batch import load_table

    reg = {s.name: s for s in registry()}
    for t in ("customer", "orders", "lineitem", "supplier", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    try:
        for name in (
            "q13_order_count_dist",
            "q22_idle_rich_customers",
            "q19_disjunctive_predicates",
            "q21_waiting_suppliers",
            "q11_important_parts",
        ):
            via_sql = sorted(tuple(r) for r in spark.sql(reg[name].sql).collect())
            via_df = sorted(
                tuple(r) for r in reg[name].spark(spark, sf_dir).collect()
            )
            assert via_sql == via_df, f"{name}: spark.sql != DataFrame plan"
    finally:
        for t in ("customer", "orders", "lineitem", "supplier", "part"):
            spark.catalog.dropTempView(t)
