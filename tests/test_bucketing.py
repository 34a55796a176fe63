"""Bucketed co-located joins: the 100 TB shuffle-elimination story.

Writing both join sides bucketed by the join key lets Spark join them
with ZERO exchange — each bucket pairs up locally.  This is the design
the engine prescribes for the recurring fact⋈fact joins (orders ⋈
lineitem at every incremental run); the test pins that the plan really
has no shuffle, not just that results match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from square_etl_spark.io import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.format("parquet")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    # disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_section  # co-located: no shuffle to join
        expected = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        got = {r.o_orderstatus: r.n for r in joined.collect()}
        want = {r.o_orderstatus: r["count"] for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
