"""Sketch operators (operators/sketches.py): count-min guarantee and
monoid merge, Bloom no-false-negatives, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from square_etl_spark.operators.sketches import (
    bloom_build,
    bloom_probe_keys,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_cms_never_underestimates(spark):
    data = _keys(spark, [1] * 50 + [2] * 7 + [3] * 1 + list(range(100, 140)))
    sketch = cms_build(data, "k", depth=4, width=16)  # narrow → collisions
    exact = data.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact.select("k"), "k", depth=4, width=16)
    rows = exact.join(est, "k").collect()
    assert len(rows) == 43
    assert all(r["cms_est"] >= r["exact"] for r in rows)
    # the heavy key's estimate is tight even in a 16-bucket sketch:
    # collisions add at most the light keys' mass
    heavy = [r for r in rows if r["k"] == 1][0]
    assert heavy["exact"] == 50 and heavy["cms_est"] < 100


def test_cms_merge_is_cellwise_sum(spark):
    a = _keys(spark, [1, 1, 2, 5])
    b = _keys(spark, [1, 2, 3, 9])
    merged = cms_merge(cms_build(a, "k"), cms_build(b, "k"))
    whole = cms_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_estimate_exact_when_no_collisions(spark):
    data = _keys(spark, [1, 1, 1, 2, 2, 3])
    sketch = cms_build(data, "k", depth=4, width=64)
    est = cms_estimate(
        sketch, data.select("k").distinct(), "k", depth=4, width=64
    )
    got = {r["k"]: r["cms_est"] for r in est.collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_bloom_has_no_false_negatives(spark):
    build = _keys(spark, list(range(0, 200, 2)))  # evens
    positions = bloom_build(build, "k", k=3, m=512)  # small m → some FPs
    probe = _keys(spark, list(range(200)))
    passing = {r["k"] for r in bloom_probe_keys(
        probe, "k", positions, k=3, m=512
    ).collect()}
    assert set(range(0, 200, 2)) <= passing  # every build key passes


def test_bloom_rejects_most_non_members_at_sane_sizing(spark):
    build = _keys(spark, list(range(100)))
    positions = bloom_build(build, "k", k=3, m=4096)
    probe = _keys(spark, list(range(100, 1100)))  # 1000 non-members
    n_pass = bloom_probe_keys(probe, "k", positions, k=3, m=4096).count()
    # kn/m ≈ 0.073 → FPR ≈ 4e-4; allow generous slack
    assert n_pass <= 10


def test_bloom_probe_tolerates_duplicated_probe_keys(spark):
    # regression: a key appearing d times used to yield d·k probe rows,
    # fail the n_hits == k filter, and silently drop a PRESENT key —
    # a false negative the Bloom contract forbids.  The operator now
    # dedups the probe side internally.
    build = _keys(spark, list(range(0, 100, 2)))
    positions = bloom_build(build, "k", k=3, m=512)
    dup_probe = _keys(spark, [4, 4, 4, 7, 7, 8])  # 4,8 members; 7 not
    passing = {r["k"] for r in bloom_probe_keys(
        dup_probe, "k", positions, k=3, m=512
    ).collect()}
    assert {4, 8} <= passing  # duplicated members still pass, once
    rows = bloom_probe_keys(dup_probe, "k", positions, k=3, m=512).count()
    assert rows == len(passing)  # distinct output, no duplicate rows


def test_bloom_positions_bounded_by_m(spark):
    build = _keys(spark, list(range(10_000)))
    positions = bloom_build(build, "k", k=3, m=256)
    assert positions.count() <= 256


def test_sketch_probe_plans_broadcast_the_sketch(spark):
    data = _keys(spark, list(range(500)))
    sketch = cms_build(data, "k")
    est = cms_estimate(sketch, data.select("k").distinct(), "k")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    positions = bloom_build(data, "k")
    passing = bloom_probe_keys(data.select("k").distinct(), "k", positions)
    plan2 = passing._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_dir):
    """The 256-bin midpoint estimate must sit within one bin width of
    the exact interpolated percentile — the bound the query's own
    abs_err column certifies per row."""
    from pyspark.sql import functions as F

    from square_etl_spark.io import load_table
    from square_etl_spark.queries import queries

    rows = queries()["quantile_sketch_orders"](spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    bin_w = (b[1] - b[0]) / 256.0
    assert len(rows) == 3
    for r in rows:
        assert r["abs_err"] <= bin_w
