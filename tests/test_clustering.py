"""Fixed-iteration k-means (operators/clustering.py): separation,
Lloyd monotonicity, determinism, and the broadcast-assignment plan."""

from __future__ import annotations

from square_etl_spark.operators.clustering import kmeans_fixed, kmeans_summary


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_separates_obvious_clusters(spark):
    # ids 0,2,4 near the origin; ids 1,3,5 near (10,10) — seeds 0 and 1
    # land one in each blob, so one iteration already separates them
    vecs = [
        [0.0, 0.1], [10.0, 9.9], [0.2, 0.0], [9.8, 10.1], [0.1, 0.2],
        [10.1, 10.0],
    ]
    assign, cent = kmeans_fixed(_emb(spark, vecs), "vec_id", "embedding",
                                k=2, iters=2)
    got = {r["vid"]: r["c"] for r in assign.collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_second_iteration_does_not_increase_inertia(spark):
    vecs = [
        [0.0, 0.0], [1.0, 0.0], [5.0, 5.0], [6.0, 5.0], [0.5, 0.4],
        [5.5, 4.6], [0.2, 0.9], [5.9, 5.8],
    ]
    emb = _emb(spark, vecs)
    i1 = sum(
        r["inertia"]
        for r in kmeans_summary(
            *kmeans_fixed(emb, "vec_id", "embedding", k=2, iters=1)
        ).collect()
    )
    i2 = sum(
        r["inertia"]
        for r in kmeans_summary(
            *kmeans_fixed(emb, "vec_id", "embedding", k=2, iters=2)
        ).collect()
    )
    assert i2 <= i1 + 1e-6  # Lloyd never worsens the objective


def test_kmeans_is_deterministic_across_runs(spark):
    vecs = [[float((7 * i) % 11), float((3 * i) % 5)] for i in range(30)]
    emb = _emb(spark, vecs).repartition(8)
    s1 = kmeans_summary(*kmeans_fixed(emb, "vec_id", "embedding", k=3)).collect()
    s2 = kmeans_summary(*kmeans_fixed(emb, "vec_id", "embedding", k=3)).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_kmeans_assignment_join_broadcasts_centroids(spark):
    vecs = [[float(i), float(i % 3)] for i in range(20)]
    # checkpoint=False keeps the lineage visible so the join strategy
    # is assertable (the default truncates each round's plan)
    assign, _ = kmeans_fixed(_emb(spark, vecs), "vec_id", "embedding",
                             k=2, iters=1, checkpoint=False)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
