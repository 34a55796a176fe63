"""Iterative graph analytics beyond connected components (§2.10).

PageRank with EXACT INTEGER arithmetic: ranks are scaled to integer
units of 1e-12 and every step uses only BIGINT add/multiply/divide
(`div` truncation — positive everywhere, so identical to floor on any
engine).  Floating-point PageRank accumulates in partition order and
can differ in last ulps between runs/engines; integer PageRank is a
single exact answer a DuckDB oracle recomputes verbatim.  The cost is
a bounded truncation drift (≤ 1 unit = 1e-12 per division), which is
noise relative to the damping-factor semantics.

Scale shape per iteration: one join of the edge relation against the
rank relation co-partitioned on src (rank and out-degree relations
are node-sized), one grouped sum on dst — the canonical distributed
power-iteration step, same as Pregel/GraphX express.  Fixed iteration
count keeps the plan static (the same contract as
clustering.kmeans_fixed); connected_components shows the
checkpointed-loop form when convergence detection is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """``iters`` power iterations over ``edges(src, dst)``; returns
    ``(node, pr_scaled)`` with ranks in integer 1e-12 units.

    pr₀ = SCALE div N; each step every node sends ``pr div outdeg``
    along its edges and collects
    ``(100−d)·SCALE div (100·N) + d·Σincoming div 100``.
    Nodes are the union of both endpoint sets, so sinks (no
    out-edges) and sources (no in-edges) both participate; a sink
    simply dissipates its mass (the standard non-normalized handling
    — total mass is not conserved, relative ranking is).
    """
    # localCheckpoint the loop-invariant relations ONCE (edges, nodes,
    # out-degrees) and the rank relation each round — without this the
    # unrolled lineage re-derives the edge list per iteration (the
    # pre-fix plan audit showed 44 scans / 95 exchanges for 3
    # iterations) and Catalyst re-analyzes a tree that grows per round.
    # Same discipline as dedup.connected_components.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("nn"))
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    base_pct = 100 - damping_pct

    # bcast-ok: n1 is a 1-row node-count aggregate
    pr = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"CAST({SCALE} AS BIGINT) div nn").alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .join(outdeg, "src")
            .select(F.col("dst"), F.expr("pr div outdeg").alias("share"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("share").alias("sin"))
        pr = (
            # bcast-ok: n1 is a 1-row node-count aggregate
            nodes.crossJoin(F.broadcast(n1))
            .join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base_pct} AS BIGINT) * {SCALE} div (100 * nn)"
                    f" + {damping_pct} * COALESCE(sin, CAST(0 AS BIGINT))"
                    f" div 100"
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", F.col("pr").alias("pr_scaled"))


def dense_index(keys: DataFrame, key_col: str) -> DataFrame:
    """Deterministic dense 0..N−1 index over a distinct key relation
    WITHOUT a global-order window (the r06 plan audit flagged
    ``row_number().over(Window.orderBy(key))`` here as a
    single-partition bottleneck if reused on a real key relation).

    Two-phase rank, same shape as sampling.pack_training_sequences'
    distributed prefix sum: shard on the first md5 byte (256 unskewed
    shards), row_number per shard in parallel ordered by (hash, key),
    then add per-shard offsets from a 256-row driver-side prefix table
    broadcast back.  Because the shard key is a PREFIX of the hash,
    the resulting index equals a global rank over (md5(key), key) —
    deterministic and partitioning-invariant, never single-partition.

    Keys must be non-NULL (md5(NULL) is NULL, so a NULL key would
    silently drop at the offset join — filter upstream).  Returns
    ``(key_col, i)``."""
    from pyspark.sql.window import Window

    tagged = keys.withColumn("__h", F.md5(F.col(key_col).cast("string")))
    tagged = tagged.withColumn("__shard", F.substring("__h", 1, 2))
    w = Window.partitionBy("__shard").orderBy("__h", key_col)
    local = tagged.withColumn("__rk", F.row_number().over(w))
    counts = (
        tagged.groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy("__shard")
        .collect()  # ≤256 rows of driver metadata, any corpus size
    )
    offsets, running = [], 0
    for r in counts:
        offsets.append((r["__shard"], running))
        running += r["__cnt"]
    off_df = keys.sparkSession.createDataFrame(
        offsets or [("00", 0)], "__shard string, __off long"
    )
    return (
        # bcast-ok: shard-offset map, ≤256 rows by shard-count bound
        local.join(F.broadcast(off_df), "__shard")
        .select(key_col, (F.col("__off") + F.col("__rk") - 1).alias("i"))
    )


def regular_user_graph(keys: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Deterministic 3-regular test graph over a key relation: nodes
    are dense indices of the distinct keys, edges i → (2i+1), (i+7),
    (3i+11) mod N.  ONE implementation on purpose — the pagerank query
    is oracle-pinned to this construction and the scaling sweep must
    time the same graph.

    The edge set depends ONLY on N (which key maps to which index is
    irrelevant to the output), so densification just needs a
    deterministic bijection — ``dense_index``'s partitioned two-phase
    rank, not a global-order window."""
    idx = dense_index(keys, key_col).select("i")
    n1 = idx.agg(F.count(F.lit(1)).alias("nn"))
    # bcast-ok: n1 is a 1-row node-count aggregate
    return idx.crossJoin(F.broadcast(n1)).select(
        F.col("i").alias("src"),
        F.explode(
            F.array(
                (2 * F.col("i") + 1) % F.col("nn"),
                (F.col("i") + 7) % F.col("nn"),
                (3 * F.col("i") + 11) % F.col("nn"),
            )
        ).alias("dst"),
    )


def ancestor_closure(
    parents: DataFrame,
    doublings: int = 4,
) -> DataFrame:
    """Root + depth for every node of a forest given its parent
    relation ``parents(node, parent)`` (roots self-loop:
    ``parent == node``) — the hierarchy-flattening step behind
    category trees, org charts, and BOM rollups.

    POINTER DOUBLING, not parent-chasing: round i joins the current
    (node → ancestor-at-distance-≤2^i, distance) relation with itself
    on ``ancestor = node``, squaring the reach each round, so
    ``doublings`` rounds resolve any depth ≤ 2^doublings in
    ``doublings`` self-joins — O(log depth) rounds where the naive
    chase (and a recursive CTE) needs O(depth).  Each round is one
    equi-join + localCheckpoint (constant-size plans, the
    pagerank_fixed/connected_components discipline).  Self-looped
    roots are the fixpoint: they add distance 0, so resolved nodes
    pass through later rounds unchanged and ``depth`` is the exact
    root distance.

    The default ``doublings=4`` resolves depth ≤ 2⁴ = 16 — past any
    real catalog/org hierarchy; each +1 doubles the reach for one
    extra join (10 rounds = depth 1024).  A node DEEPER than the
    budget returns its 2^doublings-step ancestor, not the root —
    callers with unbounded-depth inputs should verify resolution
    (join ``root`` back to ``parents`` and assert the self-loop) or
    raise ``doublings``; the fixed budget is what keeps the plan
    static.  Returns ``(node, root, depth)``.
    """
    j = parents.select(
        F.col("node"),
        F.col("parent").alias("anc"),
        F.when(F.col("parent") == F.col("node"), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint(eager=True)
    for _ in range(doublings):
        a, b = j.alias("a"), j.alias("b")
        j = (
            a.join(b, F.col("a.anc") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.anc").alias("anc"),
                (F.col("a.depth") + F.col("b.depth")).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
    return j.select("node", F.col("anc").alias("root"), "depth")
