"""Joins (SURVEY.md §2.4): build/probe, first-wins, lookup, explode.

The reference hand-codes every join as an in-memory hash map build +
sequential probe (single process, zero concurrency).  Here each is a
declarative join so Catalyst/AQE pick the physical strategy — with
explicit ``broadcast()`` hints where the reference's own build-side
choice tells us the dimension is small by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_left_enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """J1: broadcast hash left-outer join (build/probe).

    Reference builds two in-memory maps from the small ITEM set and
    probes each ITEM_VARIATION, missing parent → nulls
    (src/etl-square-catalog.ts:129-172).  The explicit broadcast hint
    mirrors that build-side knowledge; at 100 TB the dim (catalog
    items, locations, categories) stays orders of magnitude smaller
    than facts, so broadcasting avoids shuffling the fact table
    entirely — the single most important join decision at scale.
    """
    # bcast-ok: caller contract — this helper IS the explicit
    # broadcast-dim join; callers assert the dim is bounded
    return facts.join(F.broadcast(dim), on=on, how=how)


def first_wins(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """J2/A1: deterministic "first row per key".

    The reference's first-payment-per-order map relies on arrival order
    (ASC by created_at server-side sort; src/etl-square-orders.ts:182-190
    with sort_order=ASC at src/square.ts:55).  Arrival order does not
    exist in a distributed engine, so the semantics are re-specified
    deterministically: first = minimum by (order_cols...) with the key
    itself as final tiebreaker (SURVEY.md §7 hard-list #2).

    Implemented as a window row_number — one shuffle on key_cols; at
    scale prefer this over groupBy+min_by(struct) only when payload
    columns are needed (min_by carries a single column cheaply,
    row_number carries the whole row).
    """
    order = [F.col(c).asc_nulls_last() for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") == 1).drop("__rn")
    if payload_cols is not None:
        out = out.select(*key_cols, *payload_cols)
    return out


def lookup_join(keys: DataFrame, table: DataFrame, on: str | list[str]) -> DataFrame:
    """J3: the reference's sequential per-key fetch loop
    (src/etl-square-orders.ts:197-213) as one distributed equi-join.
    Inner join ⇒ missing keys silently drop, matching the reference's
    ``if (!order) continue`` (:200-205)."""
    return keys.join(table, on=on, how="inner")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the hot side, replicate the other.

    When one join key dominates (the realistic hazard here is tenant
    skew — every warehouse row carries tenant_id, SURVEY.md §4), a
    plain shuffle join lands the whole hot key in one task.  Salting
    splits each fact row into one of ``salt`` sub-keys while the dim
    side is replicated ``salt``× via an explode, so the hot key spreads
    over ``salt`` tasks.  AQE's skew-join handles moderate skew
    automatically; explicit salting is for the pathological key that
    exceeds what split-and-replicate-at-runtime can fix, and for
    non-AQE surfaces (streaming joins).

    ``dim`` should be the smaller side (it is replicated ``salt``×).

    The salt is CONTENT-DERIVED (xxhash64 of the whole fact row, mod
    salt) rather than ``rand(seed)``: rand is seeded per-partition, so
    its value changes under task retry / AQE re-partitioning — a
    retried task would route rows to different salt buckets than its
    first attempt.  A row-content hash is identical on every attempt
    and every partitioning, keeping results retry-deterministic, while
    still spreading a hot key uniformly (distinct payloads hash
    uniformly; identical full-duplicate rows co-locate, which only
    matters if the hot key's rows are ALL byte-identical).
    """
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.xxhash64(*facts.columns), F.lit(salt)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_facts.join(replicated_dim, on=[on, "__salt"], how=how).drop(
        "__salt"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row
    with ``right.ts <= left.ts`` on the same key (or nulls if none).

    Not in the reference (SURVEY.md §2.4 lists as-of as absent); added
    because time-aligned enrichment is a first-class need for event
    pipelines.  The naive formulation is an inequality join —
    BroadcastNestedLoop in Spark, quadratic per key.  This
    implementation is the scale-correct one: UNION both sides tagged by
    origin, then one window pass per key ordered by (ts, origin tag)
    taking ``last(right_payload, ignorenulls)`` — a single shuffle on
    the key, O(n log n) per key, no pair blowup.  Right rows sort
    before left rows at equal timestamps, making the match inclusive.

    Right payload columns come back prefixed with ``right_prefix``.
    """
    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    lstruct = left.select(*lpay).schema
    rstruct = right.select(*rpay).schema
    l2 = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*lpay).alias("__l"),
        F.lit(None).cast(rstruct.simpleString()).alias("__r"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(lstruct.simpleString()).alias("__l"),
        F.struct(*rpay).alias("__r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_l") == 1)
    out_cols = (
        [F.col(c) for c in on]
        + [F.col(f"__l.{c}").alias(c) for c in lpay]
        + [F.col(f"__last_r.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    )
    return matched.select(*out_cols)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """Interval join: pairs where ``right.ts ∈ (left.ts+lower, left.ts+upper]``
    (seconds), equi-keyed on ``on``.

    A plain inequality join is BroadcastNestedLoop — quadratic per key.
    Binned plan: bucket right rows by ``floor(epoch / width)`` with
    width = the interval length; each left row explodes to the (at
    most two) bins its interval overlaps.  The join is then a pure
    equi-join on (key, bin) and the exact range predicate filters the
    in-bin candidates — candidate count is O(rows in ±1 bin), not
    O(rows per key)².  Every true pair appears exactly once because a
    right row lives in exactly one bin.  Left/right column name
    collisions are the caller's job (pre-alias).
    """
    width = float(upper_s - lower_s)
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")
    r2 = right.withColumn("__bin", F.floor(rsec / width))
    l2 = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor((lsec + F.lit(lower_s)) / width),
                F.floor((lsec + F.lit(upper_s)) / width),
            )
        ),
    )
    pred = (rsec > lsec + F.lit(lower_s)) & (rsec <= lsec + F.lit(upper_s))
    return l2.join(r2, on=[*on, "__bin"]).filter(pred).drop("__bin")


def explode_children(
    df: DataFrame,
    array_col: str,
    parent_cols: list[str],
    child_alias: str = "child",
) -> DataFrame:
    """J4: unnest a 1-to-N child array, carrying parent columns.

    Reference: per-order loop over ``order.line_items`` emitting one
    row per element with order-level fields attached
    (src/etl-square-orders.ts:202-213).  Inner ``explode`` (not
    explode_outer) matches the reference skipping orders with no line
    items (SURVEY.md §7 hard-list #3).
    """
    return df.select(
        *[F.col(c) for c in parent_cols],
        F.explode(F.col(array_col)).alias(child_alias),
    ).select(*parent_cols, f"{child_alias}.*")


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: Callable[[Column], Column],
    max_dist: int = 1,
    block_cap: int | None = None,
) -> DataFrame:
    """Approximate string join: equi-join on a BLOCKING KEY, then
    verify candidates with edit distance ≤ ``max_dist`` — the standard
    two-phase shape for entity resolution / fuzzy dedupe (same
    candidate-then-verify architecture as the MinHash/SimHash pair
    generators; an all-pairs ``levenshtein`` would be quadratic).

    ``block`` maps a name Column to its blocking key; recall is
    exactly "typo does not touch the blocking key", so choose a key
    the corruption model leaves intact (tests pin both the hit and
    the documented miss).  Scale: cost is the candidate count —
    Σ|block_L|·|block_R| — so the key must spread; a skewed block is
    the same problem as any skewed join key.  ``block_cap`` is the
    guard (same cap-and-drop contract as minhash_banded_pairs'
    bucket_cap / the LSH bucket caps): blocks whose candidate PRODUCT
    |block_L|·|block_R| exceeds the cap are dropped via a broadcast
    anti join before the candidate join ever materializes them — a
    block that hot is a stop-pattern (an empty/constant key), not a
    plausible match cluster, and the recall loss is explicit and
    testable.  The cap's counting pass re-derives lb/rb (a second
    scan of each input); when the input scan dominates — rather than
    the candidate join the cap exists to bound — persist the inputs
    upstream (the multi-consumer rule from SCALING.md).  Multi-key blocking (prefix + suffix + length) OR'd
    over several passes trades cost for recall, each pass this same
    operator.
    """
    lb = left.select(
        F.col(left_col).alias("l_val"), block(F.col(left_col)).alias("bk")
    )
    rb = right.select(
        F.col(right_col).alias("r_val"), block(F.col(right_col)).alias("bk")
    )
    if block_cap is not None:
        ln = lb.groupBy("bk").agg(F.count(F.lit(1)).alias("__ln"))
        rn = rb.groupBy("bk").agg(F.count(F.lit(1)).alias("__rn"))
        hot = (
            ln.join(rn, "bk")
            .filter(F.col("__ln") * F.col("__rn") > block_cap)
            .select("bk")
        )
        # bcast-ok: hot-block key list, ≤ |pairs|/block_cap keys by cap arithmetic
        lb = lb.join(F.broadcast(hot), "bk", "left_anti")
    cand = lb.join(rb, "bk")
    return (
        cand.withColumn("dist", F.levenshtein("l_val", "r_val"))
        .filter(F.col("dist") <= max_dist)
        .select("l_val", "r_val", "dist")
    )


def spatial_bin_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    cols: tuple[str, str, str, str] = ("lx", "ly", "rx", "ry"),
    cell_cap: int | None = None,
) -> DataFrame:
    """Proximity join on integer planar coordinates: all (left, right)
    pairs within Euclidean distance ``radius`` — the grid-blocked
    spatial join (geohash-style).  Each left row lands in ONE cell of
    a radius-sized grid and is replicated into its 3×3 neighborhood;
    candidates equi-join on the cell key and verify the EXACT integer
    squared distance, so no true pair can escape (a pair within r is
    within one cell step) and no float enters the predicate.

    Scale: candidates per row ≈ 9 × cell occupancy — linear in data
    for any fixed density, never all-pairs; a hot cell (urban-core
    skew) is an ordinary hot join key.  ``cell_cap`` is the guard
    (same cap-and-drop contract as the LSH bucket caps): cells whose
    candidate PRODUCT — replicated-left count × right count — exceeds
    the cap are dropped via a broadcast anti join before the candidate
    join; pairs in a dropped cell are lost, explicitly, instead of one
    straggler task absorbing the city-center cell.  Returns left and
    right columns plus ``dist2``.

    ``cols`` names the x/y columns on each side (integers; pick a
    fixed-point unit fine enough for the radius).
    """
    lx, ly, rx, ry = cols
    neighborhood = F.explode(
        F.array(
            *[
                F.struct(
                    (F.floor(F.col(lx) / radius) + dx).alias("cx"),
                    (F.floor(F.col(ly) / radius) + dy).alias("cy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("cell")
    lc = left.select("*", neighborhood).select(
        "*", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy")
    ).drop("cell")
    rc = right.select(
        "*",
        F.floor(F.col(rx) / radius).alias("cx"),
        F.floor(F.col(ry) / radius).alias("cy"),
    )
    if cell_cap is not None:
        ln = lc.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__ln"))
        rn = rc.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__rn"))
        hot = (
            ln.join(rn, ["cx", "cy"])
            .filter(F.col("__ln") * F.col("__rn") > cell_cap)
            .select("cx", "cy")
        )
        # bcast-ok: hot-cell list, ≤ |pairs|/cell_cap cells by cap arithmetic
        lc = lc.join(F.broadcast(hot), ["cx", "cy"], "left_anti")
    cand = lc.join(rc, ["cx", "cy"])
    d2 = (F.col(lx) - F.col(rx)) * (F.col(lx) - F.col(rx)) + (
        F.col(ly) - F.col(ry)
    ) * (F.col(ly) - F.col(ry))
    return (
        cand.withColumn("dist2", d2.cast("long"))
        .filter(F.col("dist2") <= radius * radius)
        .drop("cx", "cy")
    )


def interval_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time lookup against a versioned (SCD Type-2) dimension:
    each fact row joins the dim version whose half-open validity window
    ``[valid_from, valid_to)`` contains the fact's ``ts_col`` (open
    ``valid_to IS NULL`` = current version).  The read-side complement
    of ``sinks/merge.scd2_merge`` — what "the segment this customer was
    in WHEN the order happened" compiles to.

    Because scd2_merge guarantees non-overlapping windows per key, each
    fact matches at most one version; with ``how='left'`` a fact dated
    before its key's first version (or with no dim key at all) keeps
    NULL attributes, it is never dropped.

    Scale shape: an SCD2 dim is key-count × version-count rows — still
    dimension-sized — so the default is a broadcast equi-join on the
    keys with the window predicate as the join residual: the fact table
    never shuffles (the same decision as broadcast_left_enrich; pass
    ``broadcast_dim=False`` for a genuinely fact-sized history, where
    the planner's shuffle join on the keys is correct).
    """
    from functools import reduce
    from operator import and_

    d = dim
    for k in keys:
        d = d.withColumnRenamed(k, f"__dk_{k}")
    cond = reduce(
        and_, [facts[k] == d[f"__dk_{k}"] for k in keys]
    )
    cond = (
        cond
        & (facts[ts_col] >= d[valid_from])
        & (d[valid_to].isNull() | (facts[ts_col] < d[valid_to]))
    )
    # bcast-ok: caller opt-in flag (broadcast_dim) — caller asserts bounded dim
    right = F.broadcast(d) if broadcast_dim else d
    return facts.join(right, cond, how).drop(*[f"__dk_{k}" for k in keys])
