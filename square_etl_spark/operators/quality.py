"""Data-quality operators (SURVEY.md §2.9).

The reference's posture: per-row skip-and-warn quarantine (E1), a
fail-fast invariant for impossible rows (E2), all-or-nothing batches
(E3).  Spark-first: one predicate, two filters (valid stream + reject
stream with a reason column), and ``raise_error`` for invariants —
no row-at-a-time exception handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """E1: split into (valid, rejects-with-reason).

    ``rules`` is an ordered list of (reason, violation_predicate); a row
    is rejected with the FIRST matching reason — mirroring the
    reference's sequential validation checks that warn and return null
    on the first failure (src/etl-square-orders.ts:53-68,
    src/etl-square-inventory.ts:33-45).

    Both outputs derive from one scan; Catalyst shares the subplan when
    both are consumed in the same action, and at scale the reject
    stream is written to a reject path instead of being dropped.
    """
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        reason = F.when(pred, F.lit(name)).otherwise(reason)
    tagged = df.withColumn("reject_reason", reason)
    valid = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejects = tagged.filter(F.col("reject_reason").isNotNull())
    return valid, rejects


def assert_invariant(df: DataFrame, pred: Column, message: str) -> DataFrame:
    """E2: fail the job if any row violates the invariant, the way the
    reference throws on a payment with no money fields
    (src/etl-square-payments.ts:30-32).  Expressed as a filter whose
    predicate raises on violation (a dropped projection column would be
    pruned by Catalyst; a filter predicate cannot be) — evaluates
    lazily inside the plan, no extra action."""
    return df.filter(F.when(~pred, F.raise_error(F.lit(message))).otherwise(F.lit(True)))


def expectation_report(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Expectation-suite report: evaluate every named EXPECTATION (a
    boolean Column that should hold per row) in ONE scan and return
    the long-form relation ``(rule, n_rows, violations,
    violation_rate)`` — the audit-report twin of
    :func:`quarantine_split` (which routes rows; this one measures,
    for the run-ledger a pipeline keeps per batch).

    NULL counts as a violation — an expectation that cannot be
    evaluated did not hold.  One conditional aggregate per rule in a
    single partial-agged pass (no per-rule scans), then a k-row
    unpivot; at 100 TB the cost is the one scan you were already
    paying, and the report is rule-count-sized.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__v{i}").alias("violations"),
                )
                for i, (name, _) in enumerate(rules)
            ]
        )
    ).alias("p")
    return wide.select(pairs, F.col("__n").alias("n_rows")).select(
        F.col("p.rule").alias("rule"),
        "n_rows",
        F.col("p.violations").alias("violations"),
        F.round(F.col("p.violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a REFERENCE snapshot and the
    CURRENT one — the standard distribution-drift monitor a corpus
    pipeline runs between ingests (rule of thumb: PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 shifted; the monitor that catches a
    source silently changing its length/score distribution before the
    drift poisons a training mix).

    Binning: ``bins`` equal-width bins over the REFERENCE min/max
    (1-row broadcast — the current side is binned on the reference
    grid, out-of-range values clamp to the edge bins, so the two
    proportion vectors are always comparable).  Per-bin proportions
    use exact integer counts; zero bins substitute ``eps`` before the
    log ratio (the standard PSI convention — a bin emptying out IS
    drift and must score, not NaN).

    Returns one row per bin: (bin, n_ref, n_cur, p_ref, p_cur, term)
    plus the repeated ``psi_total`` (windowed sum over the bin-count-
    sized relation), every float rounded for cross-engine hashing.

    Scale shape: two scans + two keys-sized groupBys + a bins-sized
    join — the data-volume cost is the two scans, everything after is
    bin-count-sized.
    """
    counts = (
        psi_bin_counts(ref, value_col, ref, bins, "n_ref")
        .join(
            psi_bin_counts(cur, value_col, ref, bins, "n_cur"),
            "bin",
            "full",
        )
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    return psi_from_counts(counts, eps)


def psi_bin_counts(
    df: DataFrame,
    value_col: str,
    ref: DataFrame,
    bins: int = 10,
    n_col: str = "n",
) -> DataFrame:
    """Per-bin counts of ``df`` on the REFERENCE grid — the mergeable
    half of PSI (bin counts are a sum monoid, so streaming
    maintenance folds micro-batch counts with `incremental_rollup`
    and batch ≡ streaming holds exactly).  Every grid bin appears
    (zero-filled), so count relations from different runs align."""
    b = ref.agg(
        F.min(value_col).cast("double").alias("lo"),
        F.max(value_col).cast("double").alias("hi"),
    )
    # bcast-ok: b = 1-row min/max bounds aggregate
    j = df.join(F.broadcast(b))
    width_ok = F.col("hi") > F.col("lo")
    raw = F.floor(
        (F.col(value_col).cast("double") - F.col("lo"))
        * F.lit(bins)
        / F.when(width_ok, F.col("hi") - F.col("lo"))
    )
    bin_ = F.when(~width_ok, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw))
    )
    got = (
        j.select(bin_.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(n_col))
    )
    grid = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    return grid.join(got, "bin", "left").na.fill({n_col: 0})


def psi_from_counts(counts: DataFrame, eps: float = 1e-6) -> DataFrame:
    """PSI arithmetic over an aligned (bin, n_ref, n_cur) relation —
    shared verbatim by the batch operator and the streaming
    maintenance read path, so the two cannot diverge."""
    from pyspark.sql.window import Window

    tot = Window.partitionBy()
    p_ref = F.greatest(
        F.col("n_ref") / F.sum("n_ref").over(tot), F.lit(eps)
    )
    p_cur = F.greatest(
        F.col("n_cur") / F.sum("n_cur").over(tot), F.lit(eps)
    )
    term = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 9).cast(
        "decimal(28,9)"
    )
    out = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        term.cast("double").alias("term"),
    )
    return out.withColumn(
        "psi_total",
        F.round(
            F.sum(F.col("term").cast("decimal(28,9)"))
            .over(Window.partitionBy())
            .cast("double"),
            6,
        ),
    )
