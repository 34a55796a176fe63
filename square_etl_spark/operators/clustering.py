"""Fixed-iteration k-means over embedding columns (§2.10 extension).

Lloyd's algorithm with a deterministic seed (the first k vectors by
id) and a FIXED iteration count, formulated so two engines produce
bit-identical results:

- vectors live in LONG FORM (id, dim, val) — posexplode/UNNEST — so
  every distance and every centroid update is a grouped aggregate,
  not an array fold whose accumulation order floats;
- squared-distance terms round to 9 decimals per (dim) and sum as
  DECIMAL(38,9): the per-(point,cluster) distance is an exact number
  on any engine, and the argmin (distance ASC, cluster ASC) is a
  total order with no float ambiguity;
- centroid updates divide the exact decimal sum by the member count
  in DOUBLE and round to 9 decimals — one IEEE division, identical
  everywhere.

Scale shape: the assignment join is |points| x k rows against a
BROADCAST centroid relation (k x d rows); the update is one grouped
shuffle keyed (cluster, dim).  Per iteration that is one broadcast
join + one shuffle — the canonical distributed Lloyd step.  A fixed
iteration count (rather than convergence polling) keeps the plan
static and the oracle expressible; production would wrap the same
step in the checkpointed-loop scaffolding connected_components uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _long_form(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("dim", "valf"),
    ).select("vid", "dim", F.col("valf").cast("double").alias("val"))


def kmeans_fixed(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` exact Lloyd steps; returns ``(assign, centroids)``:
    ``assign(vid, c, d2)`` — final cluster per point with its exact
    decimal squared distance — and ``centroids(c, dim, cval)`` from
    the final update."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (there is no assignment yet)")
    # localCheckpoint the long form once and each iteration's outputs:
    # the long relation feeds the distance join AND the centroid update
    # in every iteration, so without truncation the unrolled lineage
    # re-explodes the source 2x per round (pre-fix plan audit: 9 scans
    # for 2 iterations).  Same discipline as graph.pagerank_fixed /
    # dedup.connected_components.
    ckpt = (
        (lambda df: df.localCheckpoint(eager=True))
        if checkpoint
        else (lambda df: df)
    )
    long = ckpt(_long_form(emb, id_col, vec_col))
    cent = (
        long.filter(F.col("vid") < k)
        .select(F.col("vid").alias("c"), "dim", F.col("val").alias("cval"))
    )
    assign = None
    for i in range(iters):
        diff = F.col("val") - F.col("cval")
        term = F.round(diff * diff, 9).cast(
            "decimal(38,9)"
        )
        dist = (
            # bcast-ok: k×d centroid table, bounded by cluster-count param
            long.join(F.broadcast(cent), "dim")
            .groupBy("vid", "c")
            .agg(F.sum(term).alias("d2"))
        )
        w = Window.partitionBy("vid").orderBy(
            F.col("d2").asc(), F.col("c").asc()
        )
        assign = (
            dist.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vid", "c", "d2")
        )
        # checkpoint PLACEMENT (r16): only the FINAL iteration's
        # assignment is returned/consumed outside the loop, so the
        # non-final iterations fold the assignment subtree into the
        # centroid-update job — one eager job per round instead of
        # two, same expressions, same values.  Lineage stays bounded:
        # each round's cent checkpoint is built only on the long
        # checkpoint + the in-round subtree.
        if i == iters - 1:
            assign = ckpt(assign)
        cent = (
            long.join(assign.select("vid", "c"), "vid")
            .groupBy("c", "dim")
            .agg(
                F.round(
                    F.sum(F.round(F.col("val"), 9).cast("decimal(38,9)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("cval")
            )
        )
        cent = ckpt(cent)
    return assign, cent


def kmeans_summary(assign: DataFrame, centroids: DataFrame) -> DataFrame:
    """Per-cluster summary of a k-means run: member count, exact-sum
    inertia (decimal d2 → double, rounded), and the centroid L2-norm²
    (9-decimal terms, decimal sum, rounded) — the hash-stable footprint
    of the whole clustering."""
    members = assign.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("d2").cast("double"), 6).alias("inertia"),
    )
    norms = centroids.groupBy("c").agg(
        F.round(
            F.sum(
                F.round(F.col("cval") * F.col("cval"), 9).cast("decimal(38,9)")
            ).cast("double"),
            6,
        ).alias("centroid_norm2")
    )
    return members.join(norms, "c").select(
        F.col("c").cast("long").alias("cluster"),
        "n_members",
        "inertia",
        "centroid_norm2",
    )


def kmeans_assign_exact(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One exact assignment pass against a FIXED centroid relation
    ``(c, dim, cval)`` — the read side of the fit-once/assign-many
    split: :func:`kmeans_fixed` (or a sampled fit) runs once, its
    centroids are published as a k×d artifact (io.versioned_write),
    and every later batch assigns against the stored table with this
    single broadcast-join + decimal-argmin pass — no iteration, no
    re-fit, cost linear in the batch.

    Identical arithmetic to kmeans_fixed's in-loop assignment
    (9-decimal squared-distance terms, DECIMAL(38,9) sums, total-order
    argmin), so assigning against the centroids of a
    ``kmeans_fixed(iters=n-1)`` fit reproduces
    ``kmeans_fixed(iters=n)``'s assignment exactly — the property the
    incremental SemDeDup oracle pins.  Returns (vid, c, d2)."""
    long = _long_form(emb, id_col, vec_col)
    diff = F.col("val") - F.col("cval")
    term = F.round(diff * diff, 9).cast("decimal(38,9)")
    dist = (
        # bcast-ok: k×d stored centroid table, bounded by cluster-count param
        long.join(F.broadcast(centroids), "dim")
        .groupBy("vid", "c")
        .agg(F.sum(term).alias("d2"))
    )
    w = Window.partitionBy("vid").orderBy(F.col("d2").asc(), F.col("c").asc())
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vid", "c", "d2")
    )


def kmeans_assign_arrow(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow fast-path ASSIGNMENT: numpy argmin against broadcast
    centroids in a mapInPandas pass — the documented swap point for
    the exact path's |points| x k distance join (SCALING.md r06).
    Per-row work only (no cross-row accumulation), deterministic
    tie-break by cluster id, so it agrees with the decimal argmin
    except when two centroids sit within float-rounding distance of a
    point (~1e-9) — agreement on realistic data is pinned in tests;
    the decimal path stays the oracle-checked default.

    Returns ``(vid, c, d2f)`` with the float64 squared distance.
    The centroid relation is k x d rows — collected driver-side as
    metadata (same budget as the quantization maxes) and shipped to
    executors inside the Arrow closure.
    """
    import numpy as np

    rows = centroids.collect()
    if not rows:
        raise ValueError("centroids relation is empty — run kmeans_fixed first")
    # build the matrix over the PRESENT cluster ids only and map argmin
    # results back through them: a Lloyd update drops a cluster that
    # lost all members, and densifying with np.zeros would leave a
    # phantom zero-vector centroid that the exact path (inner join on
    # the centroid relation) can never assign to
    ids = sorted({r["c"] for r in rows})
    idx_of = {c: i for i, c in enumerate(ids)}
    ids_arr = np.asarray(ids, dtype=np.int64)
    d = max(r["dim"] for r in rows) + 1
    cent = np.zeros((len(ids), d), dtype=np.float64)
    for r in rows:
        cent[idx_of[r["c"]], r["dim"]] = r["cval"]

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("c", T.LongType()),
            T.StructField("d2f", T.DoubleType()),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # ||x-c||² = ||x||² - 2x·c + ||c||², argmin ties → lowest c
            d2 = (
                (mat * mat).sum(axis=1, keepdims=True)
                - 2.0 * mat @ cent.T
                + (cent * cent).sum(axis=1)
            )
            best = d2.argmin(axis=1)  # numpy argmin takes FIRST min; ids
            # are sorted, so first-min == lowest surviving cluster id
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].astype("int64"),
                    "c": ids_arr[best],
                    "d2f": d2[np.arange(len(best)), best],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(assign, out_schema)
