"""Date/time scalar functions (SURVEY.md §2.7 F1-F5, F8).

The reference formats epoch-millis with SimpleDateFormat per record inside
executor closures (DwdDauApp.scala:101,187-195) and splits datetime strings
by hand (DwdOrderApp.scala:148-155). Here each is a single built-in
expression, vectorized by Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column) -> Column:
    """F1/F2: epoch-millis long -> TimestampType."""
    return F.timestamp_millis(col)


def derive_dt_hr(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """F2: derive partition date ``dt`` ('yyyy-MM-dd') and zero-padded hour
    string ``hr`` ('HH') from a timestamp column (DwdDauApp.scala:187-195).
    """
    return df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd")).withColumn(
        "hr", F.date_format(ts_col, "HH")
    )


def age_years(birthday: Column, as_of: Column | None = None) -> Column:
    """F5: whole years between birthday and *as_of*.

    The reference uses wall-clock now (DwdDauApp.scala:158-165) which is
    non-deterministic; the rebuild takes an explicit as_of (SURVEY §7).
    """
    ref = as_of if as_of is not None else F.current_date()
    return F.floor(F.months_between(ref, F.to_date(birthday)) / 12).cast("int")
