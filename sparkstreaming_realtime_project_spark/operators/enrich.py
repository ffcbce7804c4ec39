"""Dimension enrichment as broadcast joins (SURVEY §2.4 J1/J2).

Reference: per-record Redis GETs — DIM:USER_INFO:<user_id> and
DIM:BASE_PROVINCE:<province_id> (DwdDauApp.scala:149-185,
DwdOrderApp.scala:112-146). That idiom is 1-2 network round-trips per
surviving record — the dominant cost at any scale (BASELINE.md).

Rebuild: stream/batch -> **broadcast hash join** against dim tables. Dims
are small by construction (users, provinces), so the build side ships once
per executor and the probe is a hash lookup inside whole-stage codegen —
zero per-record I/O, no shuffle of the fact side.

Fixes carried (SURVEY §2.9): province_iso_code is populated (reference
assigns area_code twice and never sets iso_code, DwdOrderApp.scala:143-146);
missing dims produce NULLs via left join (reference NPEs,
DwdDauApp.scala:153-155); age is computed against an explicit as_of date.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dates import age_years


def enrich_user(
    facts: DataFrame,
    dim_user: DataFrame,
    fact_key: str = "user_id",
    as_of: Column | None = None,
) -> DataFrame:
    """J1: left broadcast join on user dim; derives user_gender, user_age
    (DwdDauApp.scala:149-165)."""
    dim = dim_user.select(
        F.col("id").alias("__uid"),
        F.col("gender").alias("user_gender"),
        F.col("birthday").alias("__birthday"),
    )
    return (
        facts.join(F.broadcast(dim), facts[fact_key] == dim["__uid"], "left")
        .withColumn("user_age", age_years(F.col("__birthday"), as_of))
        .drop("__uid", "__birthday")
    )


def enrich_province(
    facts: DataFrame, dim_province: DataFrame, fact_key: str = "province_id"
) -> DataFrame:
    """J2: left broadcast join on province dim (DwdDauApp.scala:167-185)."""
    dim = dim_province.select(
        F.col("id").alias("__pid"),
        F.col("name").alias("province_name"),
        F.col("iso_code").alias("province_iso_code"),
        F.col("iso_3166_2").alias("province_3166_2"),
        F.col("area_code").alias("province_area_code"),
    )
    return facts.join(
        F.broadcast(dim), facts[fact_key] == dim["__pid"], "left"
    ).drop("__pid")
