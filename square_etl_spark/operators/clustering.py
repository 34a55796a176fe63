"""Fixed-iteration k-means over embedding columns (§2.10 extension).

Lloyd's algorithm with a deterministic seed (the first k vectors by
id) and a FIXED iteration count, formulated so two engines produce
bit-identical results:

- squared-distance terms round to 9 decimals per dimension and sum as
  DECIMAL(38,9): the per-(point,cluster) distance is an exact number
  on any engine (decimal addition is associative, so accumulation
  order cannot float), and the argmin (distance ASC, cluster ASC) is
  a total order with no float ambiguity;
- centroid updates divide the exact decimal per-dimension sum by the
  member count in DOUBLE and round to 9 decimals — one IEEE division,
  identical everywhere.

Scale shape (r16 — the optimization-round rewrite, values unchanged):
the centroid relation is PARAMETER-BOUNDED (k × d rows), so each
Lloyd step collects it to the driver — the classic distributed-Lloyd
layout (the Arrow fast path below always worked this way) — and the
assignment becomes a MAP-ONLY whole-stage-codegen projection over the
vector table: per cluster a flat 9-decimal/DECIMAL(38,9) distance
chain, argmin via ``array_min`` over ``struct<d2, c>`` (struct
ordering = d2 ASC, c ASC — exactly the old window's total order).
Per iteration that is ONE grouped shuffle (the posexplode centroid
update, map-side combinable to k·d groups) and zero joins — the
previous shape paid a posexplode long-form materialization, a
|points|·d×(k·d) broadcast join, a (vid, c) hash aggregate, a
row_number window and two localCheckpoints per iteration, all to
compute numbers the driver can fold from k·d values.  At 100 TB the
removed (vid, c) aggregate is |points|·k rows of shuffle; here it was
also ~2 s of fixed per-job latency per kmeans run (9 runs inside
ann_topk_ivfpq).  DuckDB oracles recompute the same values from the
spec arithmetic, so the rewrite is hash-certified query-for-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _long_form(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("dim", "valf"),
    ).select("vid", "dim", F.col("valf").cast("double").alias("val"))


def _centroid_map(rows) -> dict:
    """Collected ``(c, dim, cval)`` rows → ``{c: {dim: cval}}``.  The
    relation is k×d by contract (parameter-bounded), so driver-side
    collection is the same budget as the quantization maxes /
    kmeans_assign_arrow's existing collect."""
    cents: dict = {}
    for r in rows:
        cents.setdefault(r["c"], {})[r["dim"]] = float(r["cval"])
    return cents


def _tree_sum(parts: list[str]) -> str:
    """Balanced-tree addition of decimal term strings.  A LEFT-TO-RIGHT
    chain of DECIMAL(38,9) adds hits Spark's precision cap on the very
    first add (39 → 38) and the precision-loss rule then trades the
    scale down to 8 — silently rounding the 9th decimal away per add
    (caught by the kmeans_embeddings oracle during the r16 rewrite).
    Terms enter as DECIMAL(29,9) (20 integer digits — ample for
    squared-diff magnitudes) and a balanced tree grows integer digits
    per LEVEL, not per term: 64 terms = 6 levels → DECIMAL(35,9),
    never capped, every intermediate exact.  Decimal addition is
    exact and associative, so the tree equals the old grouped SUM
    value-for-value."""
    while len(parts) > 1:
        nxt = [
            f"({parts[i]} + {parts[i + 1]})"
            for i in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _argmin_expr(vec_col: str, cents: dict, c_sql_type: str):
    """Nearest-centroid argmin as ONE codegen expression:
    ``array_min(array(struct(d2_c, c), ...))`` — struct ordering
    compares ``d2`` (exact DECIMAL(38,9)) first, then ``c``, which is
    the identical total order to the old ``row_number() OVER
    (ORDER BY d2 ASC, c ASC) = 1`` argmin.  Each ``d2_c`` is the
    balanced-tree sum (:func:`_tree_sum`) of the per-dimension terms
    ``CAST(ROUND((v[j]-cval_j)², 9) AS DECIMAL(29,9))`` — same
    per-term arithmetic as the old grouped SUM, summed exactly, so
    sums are bit-identical.  Built as one parsed SQL string (the
    lsh_bucket lesson: per-term Column operators are per-term py4j
    round-trips); float literals use ``repr``'s shortest round-trip
    form, which Java parses back to the identical double."""
    structs = []
    for cid in sorted(cents):
        terms = [
            f"CAST(ROUND((CAST(`{vec_col}`[{dim}] AS DOUBLE) - ({cval!r}D))"
            f" * (CAST(`{vec_col}`[{dim}] AS DOUBLE) - ({cval!r}D)), 9)"
            f" AS DECIMAL(29,9))"
            for dim, cval in sorted(cents[cid].items())
        ]
        structs.append(
            f"named_struct('d2', CAST({_tree_sum(terms)} AS DECIMAL(38,9)),"
            f" 'c', CAST({cid} AS {c_sql_type}))"
        )
    return F.expr("array_min(array(" + ", ".join(structs) + "))")


def _empty_assign(emb: DataFrame, id_col: str, c_type: T.DataType) -> DataFrame:
    """Zero-row (vid, c, d2) relation with the contract schema — the
    no-seed degenerate the old join-based shape produced implicitly."""
    return (
        emb.select(F.col(id_col).alias("vid"))
        .filter(F.lit(False))
        .select(
            "vid",
            F.lit(None).cast(c_type).alias("c"),
            F.lit(None).cast("decimal(38,9)").alias("d2"),
        )
    )


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
    decimal squared distance, computed against the PENULTIMATE
    centroids (the Lloyd convention every oracle replays) — and
    ``centroids(c, dim, cval)`` from the final update.

    ``checkpoint`` is retained for API compatibility; the collect-fold
    shape has no growing lineage to truncate (each iteration's
    centroids are driver literals, so the assignment plan is one map
    over the source), so it is a no-op."""
    del checkpoint  # no lineage to truncate in the collect-fold shape
    if iters < 1:
        raise ValueError("iters must be >= 1 (there is no assignment yet)")
    c_type = emb.schema[id_col].dataType
    c_sql_type = c_type.simpleString()
    # deterministic seed: the first k vectors by id, element values
    # widened to double exactly as the old long form's cast did
    seed = (
        emb.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("c"), F.col(vec_col).alias("v"))
        .collect()
    )
    cents = {
        r["c"]: {j: float(x) for j, x in enumerate(r["v"])} for r in seed
    }
    spark = emb.sparkSession
    cent_schema = T.StructType(
        [
            T.StructField("c", c_type),
            T.StructField("dim", T.IntegerType()),
            T.StructField("cval", T.DoubleType()),
        ]
    )
    if not cents:
        return _empty_assign(emb, id_col, c_type), spark.createDataFrame(
            [], cent_schema
        )
    assign = None
    for _ in range(iters):
        best = _argmin_expr(vec_col, cents, c_sql_type)
        base = emb.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("__v"),
            best.alias("__best"),
        )
        assign = base.select(
            "vid",
            F.col("__best").getField("c").alias("c"),
            F.col("__best").getField("d2").alias("d2"),
        )
        # centroid update: ONE map-side-combinable grouped aggregate to
        # k·d rows, collected (parameter-bounded) — same arithmetic as
        # the old (c, dim) aggregate over the long-form join
        upd = (
            base.select(
                F.col("__best").getField("c").alias("c"),
                F.posexplode("__v").alias("dim", "valf"),
            )
            .groupBy("c", "dim")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("valf").cast("double"), 9).cast(
                            "decimal(38,9)"
                        )
                    ).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("cval")
            )
            .collect()
        )
        cents = _centroid_map(upd)
    cent = spark.createDataFrame(
        [
            (c, d, cents[c][d])
            for c in sorted(cents)
            for d in sorted(cents[c])
        ],
        cent_schema,
    )
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
    single map-only decimal-argmin pass — no iteration, no re-fit,
    cost linear in the batch, zero shuffles (the k×d relation is
    collected, the per-cluster distance chains run in whole-stage
    codegen — same shape as kmeans_fixed's in-loop assignment).

    Identical arithmetic to kmeans_fixed's in-loop assignment
    (9-decimal squared-distance terms, DECIMAL(38,9) sums, total-order
    argmin), so assigning against the centroids of a
    ``kmeans_fixed(iters=n-1)`` fit reproduces
    ``kmeans_fixed(iters=n)``'s assignment exactly — the property the
    incremental SemDeDup oracle pins.  A cluster's distance sums over
    exactly the dims PRESENT in the relation for it (the old inner
    join's semantics).  Returns (vid, c, d2)."""
    rows = centroids.collect()
    c_type = centroids.schema["c"].dataType
    if not rows:
        return _empty_assign(emb, id_col, c_type)
    cents = _centroid_map(rows)
    best = _argmin_expr(vec_col, cents, c_type.simpleString())
    return emb.select(
        F.col(id_col).alias("vid"), best.alias("__best")
    ).select(
        "vid",
        F.col("__best").getField("c").alias("c"),
        F.col("__best").getField("d2").alias("d2"),
    )


def kmeans_assign_arrow(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow fast-path ASSIGNMENT: numpy argmin against broadcast
    centroids in a mapInPandas pass — the documented swap point for
    the exact path's decimal distance chains when d is large enough
    that BLAS wins (SCALING.md r06).  Per-row work only (no cross-row
    accumulation), deterministic tie-break by cluster id, so it agrees
    with the decimal argmin except when two centroids sit within
    float-rounding distance of a point (~1e-9) — agreement on
    realistic data is pinned in tests; the decimal path stays the
    oracle-checked default.

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
    # phantom zero-vector centroid that the exact path (assignment over
    # the centroid relation) can never assign to
    ids = sorted({r["c"] for r in rows})
    idx_of = {c: i for i, c in enumerate(ids)}
    ids_arr = np.asarray(ids, dtype=np.int64)
    d = max(r["dim"] for r in rows) + 1
    cent = np.zeros((len(ids), d), dtype=np.float64)
    for r in rows:
        cent[idx_of[r["c"]], r["dim"]] = r["cval"]

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
