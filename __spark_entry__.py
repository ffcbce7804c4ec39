"""Driver contract: entry/queries/oracle_sql wired to the engine's query
catalog (sparkstreaming_realtime_project_spark/plans/catalog.py).

Every implemented SURVEY.md §2 operator has a catalog entry pairing the
Spark plan with its DuckDB-oracle SQL; entries whose semantics aren't
SQL-expressible (streaming-only paths) register with ``sql=None`` and get
the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkstreaming_realtime_project_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary aggregate over sf0.001 lineitem."""
    return catalog.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in catalog.registry()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.sql for spec in catalog.registry() if spec.sql is not None
    }
