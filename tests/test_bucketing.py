"""Bucketed-table co-located join: the at-rest layout contract for the
100 TB case. Writing both join sides bucketed (and sorted) by the join
key means the big fact-fact join — orders x lineitem here, the
order-wide join of the reference (DwdOrderApp.scala:170-175) at rest —
reads pre-partitioned buckets and joins WITHOUT shuffling either side:
the exchange that dominates a 100 TB join simply isn't in the plan.

Tables are written as EXTERNAL tables into tmp_path (in-memory catalog,
no Hive metastore) and dropped after, so the shared session and repo
stay clean."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "b_orders"))
            .mode("overwrite")
            .saveAsTable("b_orders_t")
        )
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "b_lineitem"))
            .mode("overwrite")
            .saveAsTable("b_lineitem_t")
        )
        bo, bl = spark.table("b_orders_t"), spark.table("b_lineitem_t")
        # merge hint pins sort-merge (the shape broadcast can't take at
        # fact-fact scale); bucketing must satisfy its distribution
        joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") == 2
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        n = joined.count()
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert n == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_t")
        spark.sql("DROP TABLE IF EXISTS b_lineitem_t")


def test_bucketed_groupby_reuses_layout(spark, tmp_path, sf_dir):
    """Aggregation on the bucket key also skips its exchange — the
    bucketed layout pays for itself across every downstream key use."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "b_li2"))
            .mode("overwrite")
            .saveAsTable("b_li2_t")
        )
        agg = (
            spark.table("b_li2_t")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li2_t")
