"""Data-quality expectations: declarative constraint checking as ONE
aggregate pass (the deequ / Delta-expectations pattern, north-star
extension).

A pipeline feeding a 100 TB training run needs its inputs validated the
same way its outputs are deduplicated — declaratively, in one scan, with
a machine-readable report. ``expectations_report`` takes named violation
predicates and produces one row per check from a single aggregate over
the (optionally pre-joined) frame: no per-check scan, no driver-side
loop over rows, and referential checks fold in as just another predicate
on a left-joined frame instead of a separate anti-join pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row per check: (check_name, n_violations, n_rows, pass_rate).

    ``checks`` maps a check name to its VIOLATION predicate (true = the
    row fails the expectation). All checks evaluate in a single
    aggregate — conditional sums share the one scan — and the wide
    one-row result is exploded into the per-check report via an inline
    array of structs (a plan-local transpose, no shuffle beyond the
    aggregate's own).

    Referential integrity: left-join the reference table first and pass
    ``F.col("ref_key").isNull()`` as the predicate — the join IS the
    check, and it rides the same scan as every other expectation.
    """
    if not checks:
        raise ValueError("expectations_report: no checks given")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v_{name}")
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
            )
            for name in checks
        ]
    )
    return (
        wide.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.check_name").alias("check_name"),
            F.col("e.n_violations").alias("n_violations"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(
                1.0 - F.col("e.n_violations") / F.col("n_rows"), 6
            ).alias("pass_rate"),
        )
        .orderBy("check_name")
    )
