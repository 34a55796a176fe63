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


def test_bucketed_minhash_index_probe_zero_exchange_on_index(spark, sf_dir, tmp_path):
    """The incremental near-dup deployment story (r08 verdict item):
    the LSH bucket index written bucketed by (band, bhash) joins probe
    batches with ZERO Exchange on the index side — only the new batch
    shuffles; the stored corpus index never moves again.  Results must
    equal the unbucketed probe exactly."""
    from square_etl_spark.operators.dedup import (
        minhash_index,
        minhash_probe,
        write_minhash_index_bucketed,
    )

    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    sh, idx = minhash_index(old)
    # plain-parquet deployment of the same index, for the differential
    sh.write.mode("overwrite").parquet(str(tmp_path / "sh_p"))
    idx.write.mode("overwrite").parquet(str(tmp_path / "idx_p"))
    sh_p = spark.read.parquet(str(tmp_path / "sh_p"))
    idx_p = spark.read.parquet(str(tmp_path / "idx_p"))
    sh_b, idx_b = write_minhash_index_bucketed(
        sh, idx, str(tmp_path), "mh_test", num_buckets=16
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out_b = minhash_probe(sh_b, idx_b, new, threshold=0.5)
        out_p = minhash_probe(sh_p, idx_p, new, threshold=0.5)
        plan_b, plan_p = _plan(out_b), _plan(out_p)
        assert "Bucketed: true" in plan_b
        # bucketing removes EXACTLY the three index-side shuffles: the
        # candidate join's index side, the index hot-list aggregation,
        # and the exact-verify join's shingle-store side.  The batch's
        # own shuffles (it is new data — it must move once) remain.
        n_b = plan_b.count("Exchange hashpartitioning")
        n_p = plan_p.count("Exchange hashpartitioning")
        assert n_b == n_p - 3, f"bucketed {n_b} vs plain {n_p}\n{plan_b}"
        got = sorted(map(tuple, out_b.collect()))
        want = sorted(map(tuple, out_p.collect()))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS mh_test_buckets")
        spark.sql("DROP TABLE IF EXISTS mh_test_shingles")
    assert got == want and len(got) > 0


def test_bucketed_embedding_lsh_index_probe_zero_exchange_on_index(
    spark, sf_dir, tmp_path
):
    """r12: the embedding family's stored-index deployment mirrors the
    minhash one — the sign-LSH index written bucketed by
    (__tbl, __bucket) joins probe batches with ZERO Exchange on the
    index side; only the new batch shuffles.  Results must equal the
    plain-parquet probe exactly."""
    from square_etl_spark.operators.dedup import (
        embedding_lsh_index,
        embedding_lsh_probe,
        write_embedding_lsh_index,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = e.filter(F.col("vec_id") % 3 != 0)
    new = e.filter(F.col("vec_id") % 3 == 0)
    idx = embedding_lsh_index(old)
    idx.write.mode("overwrite").parquet(str(tmp_path / "eidx_p"))
    idx_p = spark.read.parquet(str(tmp_path / "eidx_p"))
    idx_b = write_embedding_lsh_index(
        idx, str(tmp_path), "emb_test", num_buckets=16
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out_b = embedding_lsh_probe(idx_b, new, threshold=0.35)
        out_p = embedding_lsh_probe(idx_p, new, threshold=0.35)
        plan_b, plan_p = _plan(out_b), _plan(out_p)
        assert "Bucketed: true" in plan_b
        # bucketing removes exactly the two index-side shuffles: the
        # candidate join's index side and the index hot-list
        # aggregation (single relation — no separate verify store)
        n_b = plan_b.count("Exchange hashpartitioning")
        n_p = plan_p.count("Exchange hashpartitioning")
        assert n_b == n_p - 2, f"bucketed {n_b} vs plain {n_p}\n{plan_b}"
        got = sorted(map(tuple, out_b.collect()))
        want = sorted(map(tuple, out_p.collect()))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS emb_test_emb_lsh")
    assert got == want and len(got) > 0
