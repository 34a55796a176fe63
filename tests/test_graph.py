"""Integer PageRank (operators/graph.py): mass routing, sink/source
handling, determinism, uniform fixed point."""

from __future__ import annotations

from square_etl_spark.operators.graph import SCALE, pagerank_fixed


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_ranks_the_hub_highest(spark):
    # star: everyone points at node 0; 0 points at 1
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)])
    pr = {r["node"]: r["pr_scaled"] for r in pagerank_fixed(e).collect()}
    assert pr[0] == max(pr.values())
    assert pr[1] > pr[2] == pr[3] == pr[4]  # 1 inherits the hub's mass


def test_pagerank_uniform_on_a_cycle(spark):
    # directed 4-cycle: symmetry → all ranks exactly equal
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    vals = {r["pr_scaled"] for r in pagerank_fixed(e, iters=5).collect()}
    assert len(vals) == 1
    # and equal to the uniform fixed point: base + 0.85 * pr = pr
    assert abs(next(iter(vals)) - SCALE // 4) <= 5  # integer-drift units


def test_pagerank_source_gets_base_mass_only(spark):
    # 0 → 1 → 2, 2 → 1: node 0 has no in-edges
    e = _edges(spark, [(0, 1), (1, 2), (2, 1)])
    pr = {r["node"]: r["pr_scaled"] for r in pagerank_fixed(e).collect()}
    assert pr[0] == 15 * SCALE // (100 * 3)
    assert pr[1] > pr[0] and pr[2] > pr[0]


def test_pagerank_deterministic_across_partitionings(spark):
    pairs = [(i, (2 * i + 1) % 40) for i in range(40)] + [
        (i, (i + 7) % 40) for i in range(40)
    ]
    e1 = _edges(spark, pairs).repartition(16)
    e2 = _edges(spark, pairs).coalesce(1)
    r1 = sorted(map(tuple, pagerank_fixed(e1).collect()))
    r2 = sorted(map(tuple, pagerank_fixed(e2).collect()))
    assert r1 == r2


def test_dense_index_is_a_bijection_and_partition_invariant(spark):
    from square_etl_spark.operators.graph import dense_index

    keys = spark.range(0, 500).selectExpr("id * 3 as user_id")
    idx = dense_index(keys, "user_id")
    rows = idx.collect()
    assert sorted(r["i"] for r in rows) == list(range(500))  # bijection
    # deterministic under any input partitioning
    again = dense_index(keys.repartition(13), "user_id").collect()
    assert {(r["user_id"], r["i"]) for r in rows} == {
        (r["user_id"], r["i"]) for r in again
    }


def test_dense_index_plan_has_no_single_partition_window(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import count_global_windows

    from square_etl_spark.operators.graph import dense_index

    keys = spark.range(0, 100).selectExpr("id as user_id")
    plan = (
        dense_index(keys, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert count_global_windows(plan) == 0


def test_ancestor_closure_resolves_roots_and_exact_depths(spark):
    from square_etl_spark.operators.graph import ancestor_closure

    # two trees: 1 ← 2 ← 4 ← 8 (chain) and 3 ← 6 (roots self-loop)
    parents = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 2), (8, 4), (3, 3), (6, 3)],
        "node long, parent long",
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in ancestor_closure(parents, doublings=3).collect()
    }
    assert got == {
        1: (1, 0), 2: (1, 1), 4: (1, 2), 8: (1, 3),
        3: (3, 0), 6: (3, 1),
    }


def test_ancestor_closure_depth_within_doubling_budget(spark):
    from square_etl_spark.operators.graph import ancestor_closure

    # chain 0←1←2←…←10: depth 10 needs 2^doublings >= 10 → 4 rounds
    parents = spark.createDataFrame(
        [(0, 0)] + [(i, i - 1) for i in range(1, 11)],
        "node long, parent long",
    )
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in ancestor_closure(parents, doublings=4).collect()
    }
    assert got == {i: (0, i) for i in range(11)}
