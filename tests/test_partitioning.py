"""Partitioned layout: date-partition pruning + salted skew joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from square_etl_spark.io import load_table, write_partitioned
from square_etl_spark.operators.joins import salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    path = os.path.join(tmp_path, "events_part")
    write_partitioned(ev, path, ["dt"])
    # one directory per day
    days = [d for d in os.listdir(path) if d.startswith("dt=")]
    assert len(days) > 5

    scan = spark.read.parquet(path).filter(F.col("dt") == "2024-01-03")
    plan = _plan(scan)
    # the filter must prune partitions at planning time, not post-scan
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = ev.filter(F.to_date("ts") == "2024-01-03").count()
    assert scan.count() == expected


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, on="l_orderkey").groupBy("o_orderstatus").count()
    salted = (
        salted_join(li, o, on="l_orderkey", salt=4)
        .groupBy("o_orderstatus")
        .count()
    )
    want = {r.o_orderstatus: r["count"] for r in plain.collect()}
    got = {r.o_orderstatus: r["count"] for r in salted.collect()}
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    # one pathological key: every fact row shares it. After salting the
    # shuffle key space must contain `salt` distinct sub-keys.
    facts = spark.range(1000).select(
        F.lit("hot_tenant").alias("tenant_id"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame([("hot_tenant", "x")], "tenant_id string, name string")
    out = salted_join(facts, dim, on="tenant_id", salt=8)
    assert out.count() == 1000
    n_salts = (
        facts.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_skew_profile_detects_hot_key(spark):
    """A planted 50% hot key must show in max_key_share and depress
    entropy well below ln(n_keys)."""
    import math

    from pyspark.sql import functions as F

    from square_etl_spark.operators.sampling import skew_profile

    rows = [("hot",)] * 50 + [(f"u{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "user_id string")
    got = skew_profile(df, "user_id").collect()[0]
    assert got.n_rows == 100 and got.n_keys == 51
    assert got.max_key_share == 0.5
    assert got.skew_ratio == round(50 * 51 / 100, 6)
    # one-pass identity: H = ln T − (Σ round(c·ln c, 6))/T
    s_clnc = round(50 * math.log(50), 6) + 50 * round(1 * math.log(1), 6)
    expect = round(math.log(100) - s_clnc / 100, 6)
    assert got.entropy == expect
    assert got.entropy < math.log(51)  # far from uniform


def _py_morton(vals, bits):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    from pyspark.sql import functions as F

    from square_etl_spark.io import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 7), (65535, 65535)],
        "x long, y long",
    )
    got = df.select(
        "x", "y", zorder_key(["x", "y"], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.x & 0xFFFF, r.y & 0xFFFF], 16), (r.x, r.y)


def test_zorder_layout_tightens_rowgroup_stats_on_both_dims(spark, tmp_path):
    """Write the same 2-D data (a) sorted by x only and (b) sorted by
    the z-order key, with small row groups; the z-ordered layout's
    per-row-group extent on Y must shrink dramatically while X stays
    reasonable — the property that makes predicates on EITHER column
    prune row groups."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from square_etl_spark.io import zorder_key

    # 64x64 grid, one row per cell
    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
        )
    )
    px = os.path.join(tmp_path, "by_x")
    pz = os.path.join(tmp_path, "by_z")
    opts = {"parquet.block.size": str(16 * 1024)}  # many small row groups
    (df.coalesce(1).sortWithinPartitions("x", "y")
       .write.options(**opts).parquet(px))
    (df.coalesce(1).sortWithinPartitions(zorder_key(["x", "y"], bits=6))
       .write.options(**opts).parquet(pz))

    def mean_extent(path, col):
        f = [os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")][0]
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        exts = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            exts.append(st.max - st.min)
        assert md.num_row_groups >= 4  # the layout claim needs several groups
        return sum(exts) / len(exts)

    # x-sorted: y spans the full 0-63 range in every group
    assert mean_extent(px, "y") > 50
    # z-ordered: BOTH dims stay locally bounded (full range is 63;
    # the x-sorted layout leaves y unbounded at >50)
    assert mean_extent(pz, "y") <= 40
    assert mean_extent(pz, "x") <= 40


def test_stats_manifest_and_prune_files_skip_correctly(spark, tmp_path):
    """Footer-stats data skipping: files whose [min,max] range cannot
    contain the predicate are dropped from the read set; reading only
    the pruned set still returns exactly the right rows."""
    import os

    from pyspark.sql import functions as F

    from square_etl_spark.io import prune_files, stats_manifest

    path = os.path.join(tmp_path, "skiptab")
    # three disjoint value ranges → three files with disjoint stats
    for lo in (0, 1000, 2000):
        spark.range(lo, lo + 100).select(
            F.col("id").alias("v"), (F.col("id") % 7).alias("k")
        ).coalesce(1).write.mode("append").parquet(path)

    man = stats_manifest(spark, path, ["v"])
    assert man.count() >= 3  # one stats row per file for v

    keep = prune_files(man, "v", 1010, 1020)
    assert len(keep) == 1  # only the middle file can match
    got = spark.read.parquet(*keep).filter("v between 1010 and 1020")
    assert got.count() == 11

    # full-range predicate keeps every file
    assert len(prune_files(man, "v", 0, 3000)) == man.select("file").distinct().count()
    # out-of-range predicate proves every file skippable
    assert prune_files(man, "v", 5000, 6000) == []


def test_stats_manifest_distributed_equals_driver_loop(spark, tmp_path):
    """r07 verdict: the manifest build fans footer reads out to
    executors (mapInPandas over the file list) — the relation must be
    ROW-IDENTICAL to the former sequential driver loop, including
    multi-column requests, absent columns, and no-stats NULL rows."""
    import os

    from pyspark.sql import functions as F

    from square_etl_spark.io import _stats_manifest_driver, stats_manifest

    path = os.path.join(tmp_path, "eqtab")
    for lo in (0, 500, 1000, 1500, 2000):
        spark.range(lo, lo + 100).select(
            F.col("id").alias("v"),
            (F.col("id") % 7).alias("k"),
            F.col("id").cast("string").alias("s"),
        ).coalesce(1).write.mode("append").parquet(path)

    cols = ["v", "k", "s", "not_a_column"]
    # tiny files_per_task → genuinely multiple executor tasks
    dist = stats_manifest(spark, path, cols, files_per_task=2)
    drv = _stats_manifest_driver(spark, path, cols)
    key = ["file", "col"]
    assert sorted(map(tuple, dist.collect())) == sorted(
        map(tuple, drv.collect())
    )
    assert dist.select(*key).distinct().count() == drv.count()
    # empty directory → empty relation, same schema
    empty = stats_manifest(spark, os.path.join(tmp_path, "nofiles"), ["v"])
    assert empty.count() == 0 and empty.columns == dist.columns


def test_versioned_table_publish_read_timetravel_vacuum(spark, tmp_path):
    import os

    from square_etl_spark.io import (
        read_version,
        table_version,
        versioned_vacuum,
        versioned_write,
    )

    path = os.path.join(tmp_path, "vtab")
    assert table_version(path) == 0
    v1 = versioned_write(spark, spark.range(10), path)
    v2 = versioned_write(spark, spark.range(20), path)
    v3 = versioned_write(spark, spark.range(30), path)
    assert (v1, v2, v3) == (1, 2, 3)
    assert read_version(spark, path).count() == 30          # latest
    assert read_version(spark, path, 1).count() == 10       # time travel
    removed = versioned_vacuum(path, keep=2)
    assert removed == [1]
    assert read_version(spark, path).count() == 30          # latest intact
    assert read_version(spark, path, 2).count() == 20       # kept


def test_versioned_table_crashed_write_is_invisible_and_vacuumed(spark, tmp_path):
    import os

    from square_etl_spark.io import (
        read_version,
        table_version,
        versioned_vacuum,
        versioned_write,
    )

    path = os.path.join(tmp_path, "vtab2")
    versioned_write(spark, spark.range(5), path)
    # simulate a crash AFTER the snapshot write but BEFORE the pointer
    # flip: the orphan directory must not affect readers
    spark.range(99).write.parquet(os.path.join(path, "v=2"))
    assert table_version(path) == 1
    assert read_version(spark, path).count() == 5
    # a FRESH above-pointer snapshot is indistinguishable from an
    # in-flight write → the default grace period protects it
    assert versioned_vacuum(path, keep=5) == []
    assert read_version(spark, path, 2).count() == 99  # still on disk
    # owner-context vacuum (no write can be in flight) reclaims it
    assert versioned_vacuum(path, keep=5, orphan_grace_seconds=0) == [2]
    assert table_version(path) == 1


def test_versioned_write_retries_past_orphan_snapshot(spark, tmp_path):
    import os

    from square_etl_spark.io import read_version, versioned_write

    path = os.path.join(tmp_path, "vtab3")
    versioned_write(spark, spark.range(5), path)
    spark.range(99).write.parquet(os.path.join(path, "v=2"))  # crash orphan
    v = versioned_write(spark, spark.range(7), path)  # retry must not collide
    assert v == 3
    assert read_version(spark, path).count() == 7


def test_dynamic_partition_pruning_fires_on_dim_filtered_join(
    spark, sf_dir, tmp_path
):
    """DPP — the Catalyst feature that makes star joins scale on
    partitioned facts: with the fact partitioned on the join key and a
    selective dim filter, the fact scan's PartitionFilters carry a
    runtime dynamicpruning subquery, so only the dim-selected
    partitions are read (no manual predicate plumbing).  Pinned here
    because the 100 TB posture depends on it: a fact partitioned by
    the mixture/tenant/date key must never full-scan for a filtered
    dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    fact_path = os.path.join(tmp_path, "fact_by_flag")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("A", 0), ("N", 1), ("R", 0)], "flag string, grp int"
    )
    j = fact.join(
        dim.filter("grp = 0"), fact.l_returnflag == dim.flag
    ).agg(F.count("*").alias("n"))
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()
    # and the pruned result is exactly the filter-based answer
    want = li.filter(F.col("l_returnflag").isin(["A", "R"])).count()
    assert j.collect()[0].n == want
