"""Deterministic sampling / mixing / sharding — training-data pipeline ops.

A 100 TB corpus is never consumed whole: pipelines sample it (ablation
subsets), mix it (per-source weights), shard it (training-file layout),
and profile it (column health) before any tokens are spent.  The
reference has none of this surface (its whole corpus is one API window,
SURVEY.md §2) — these are driver-mandated extensions (§2.10) designed
Spark-first.

Every operator here is **deterministic and engine-portable**: the
randomness source is ``md5(key)`` — a pure column expression that
hashes the same on any engine, any partitioning, any run.  That is the
property that matters at scale:

- re-running a sample on a re-partitioned / re-ordered copy of the
  corpus yields the SAME subset (``rand(seed)`` does NOT survive
  re-partitioning — it is seeded per-partition);
- a sample is reproducible months later from the key column alone, so
  ablations are comparable across corpus versions;
- sampling composes with incremental ingest: a new batch's members
  join the sample iff their keys hash under the threshold — no state.

Plan shapes: ``hash_sample`` / ``weighted_mix`` are scan + filter
(no shuffle, whole-stage codegen, zero Python).  ``stratified_take``
and ``shard_assign`` are one window pass = one shuffle on the
stratum/shard key; a dominant stratum is the skew hazard, so at real
scale prefer ``hash_sample`` within strata (rate = n/stratum_count
from a first-pass count) when exact-n is not required — that variant
is shuffle-free.  ``histogram`` / ``profile`` are single
partial-aggregated passes (map-side combine, tiny result).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: width of the hex prefix used as the uniform variate: 8 hex chars
#: = 32 bits — plenty for sampling rates down to ~2e-10.
_HEX_DIGITS = 8
_HEX_SPACE = 16**_HEX_DIGITS


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform deterministic variate: first 8 hex chars of md5(salt‖key).

    Lowercase-hex strings compare lexicographically in hash order
    ('0' < … < '9' < 'a' < … < 'f' in every collation we run), so a
    rate-r sample is simply ``hash_bucket(k) < rate_threshold(r)`` —
    a codegen'd string compare, no UDF, no rand() state.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _HEX_DIGITS)


def rate_threshold(rate: float) -> str:
    """Hex threshold t such that P[hash_bucket(k) < t] = rate.

    rate >= 1.0 returns ``"g" + "0"*7`` — lexicographically ABOVE every
    8-hex-digit bucket ('f' < 'g'), so ``bucket < threshold`` is always
    true and rate-1.0 keeps EVERY row, including keys whose md5 prefix
    is exactly 'ffffffff' (~1 in 2^32; a strict '<' against 'ffffffff'
    would silently drop them).  The sentinel compares identically in
    Spark and ANSI SQL, so interpolated oracles stay in lockstep.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g" + "0" * (_HEX_DIGITS - 1)
    return format(int(rate * _HEX_SPACE), f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key: str, rate: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key``.

    Monotone in rate: sample(r1) ⊆ sample(r2) for r1 ≤ r2 (same salt),
    which makes nested ablation subsets (1% ⊂ 10% ⊂ 100%) free.
    Distinct salts give independent samples from the same keys.
    Scan + filter only — no shuffle at any scale.
    """
    return df.filter(hash_bucket(key, salt) < F.lit(rate_threshold(rate)))


def weighted_mix(
    df: DataFrame, group_col: str, key: str, weights: dict[str, float], salt: str = ""
) -> DataFrame:
    """Per-group sampling rates in one pass — corpus mixing.

    ``weights`` maps group value → keep-rate (a source missing from the
    map is dropped).  This is the standard "mix web 10%, books 100%"
    recipe expressed as a single scan + CASE filter: no split, no
    union, no shuffle — the shape that survives a 100 TB corpus where
    materializing per-source intermediates is not an option.
    """
    thresh = F.lit("0" * _HEX_DIGITS)  # unknown group ⇒ rate 0
    expr = None
    for value, rate in weights.items():
        cond = F.col(group_col) == F.lit(value)
        expr = F.when(cond, F.lit(rate_threshold(rate))) if expr is None else expr.when(
            cond, F.lit(rate_threshold(rate))
        )
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(hash_bucket(key, salt) < thresh)


def split_assign(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint named splits (train/val/test) from one
    hash variate — every row gets EXACTLY one label, rows never move
    between splits when the corpus is re-partitioned or re-ingested,
    and a document's assignment is reproducible months later from its
    key alone (the property leakage audits need: a test doc can never
    drift into train on a rebuild).

    ``fractions`` maps split name → fraction, summing to ≤ 1.0 (any
    remainder is dropped — the "hold back unallocated data" posture;
    pass fractions summing to 1.0 to keep everything).  Assignment is
    by cumulative thresholds over the same md5 variate as
    :func:`hash_sample`, so splits nest consistently with samples
    drawn with the same salt.  Scan + CASE only — no shuffle.
    """
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"split {name!r} fraction {frac} < 0")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    hb = hash_bucket(key, salt)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        # round the running sum so float accumulation error (0.8+0.1 =
        # 0.9000000000000001) cannot move a threshold off the value an
        # oracle computes from the literal cumulative fraction
        cum = round(cum + frac, 12)
        cond = hb < F.lit(rate_threshold(min(cum, 1.0)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    assigned = df.withColumn(
        split_col, expr.otherwise(F.lit(None).cast("string"))
    )
    return assigned.filter(F.col(split_col).isNotNull())


def split_assign_stratified(
    df: DataFrame,
    key: str,
    fractions_by_stratum: dict[str, dict[str, float]],
    stratum_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint splits with PER-STRATUM fractions — the
    "hold out 50% of code but 2% of web" recipe: each stratum gets its
    own cumulative thresholds over the same md5 variate as
    :func:`split_assign`, so assignment stays reproducible from the
    key alone, rows never migrate on re-partition/re-ingest, and
    same-salt samples/splits nest across operators.  A stratum absent
    from the map is dropped (the :func:`weighted_mix` posture: the mix
    spec IS the allow-list); within a stratum, unallocated remainder
    (fractions summing < 1) is held back.  Shape: one scan + nested
    CASE — no shuffle, no per-stratum passes, 100 TB-indifferent.
    """
    hb = hash_bucket(key, salt)
    expr = None
    for stratum, fractions in fractions_by_stratum.items():
        for name, frac in fractions.items():
            if frac < 0:
                raise ValueError(
                    f"stratum {stratum!r} split {name!r} fraction {frac} < 0"
                )
        total = sum(fractions.values())
        if total > 1.0 + 1e-9:
            raise ValueError(
                f"stratum {stratum!r} fractions sum to {total} > 1"
            )
        cum = 0.0
        inner = None
        for name, frac in fractions.items():
            # same float-drift guard as split_assign: thresholds come
            # from the ROUNDED cumulative fraction the oracle also uses
            cum = round(cum + frac, 12)
            cond = hb < F.lit(rate_threshold(min(cum, 1.0)))
            inner = (
                F.when(cond, F.lit(name))
                if inner is None
                else inner.when(cond, F.lit(name))
            )
        inner = (
            inner.otherwise(F.lit(None).cast("string"))
            if inner is not None
            else F.lit(None).cast("string")
        )
        cond_s = F.col(stratum_col) == F.lit(stratum)
        expr = (
            F.when(cond_s, inner) if expr is None else expr.when(cond_s, inner)
        )
    assigned = df.withColumn(
        split_col,
        expr.otherwise(F.lit(None).cast("string"))
        if expr is not None
        else F.lit(None).cast("string"),
    )
    return assigned.filter(F.col(split_col).isNotNull())


def gumbel_topk_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key: str = "doc_id",
    salt: str = "",
    score_col: str = "gumbel_score",
) -> DataFrame:
    """Sample ``k`` rows WITHOUT replacement with probability
    proportional to ``exp(weight)`` — the Gumbel-top-k trick (take the
    k largest ``weight + Gumbel(0,1)``), which is the sampler DSIR
    actually prescribes over its log-importance-weights (a plain
    top-k over-selects the head of the distribution; Gumbel
    perturbation gives every document its correct inclusion odds).

    DETERMINISTIC: the Gumbel noise is ``−ln(−ln u)`` with ``u``
    derived from md5(salt‖key) — the engine's standard reproducible
    variate, so re-runs, re-partitions, and the DuckDB oracle all
    draw the same sample.  Exactness of the cross-engine bridge:
    ``u = (first 52 md5 bits + 0.5) / 2^52`` has a power-of-two
    denominator, so u is computed EXACTLY (no rounding) and
    identically on both engines, u ∈ (0,1) strictly; the perturbed
    score rounds to 6 decimals and ties break on the key.

    DECLARED departure from the leaf-round recipe (r12 ADVICE,
    accepted): the two ln() calls compose as doubles and only the
    final score rounds.  Leaf-rounding the inner ln is UNSAFE here —
    for u within 5e-7 of 1 (probability ~5e-7 per row; expected once
    per ~2M rows), ``round(ln u, 6)`` collapses to 0.000000 and the
    outer ``-ln(0)`` blows up to +inf, corrupting the draw.  The
    residual cross-engine risk of the double composition is a 1-2 ulp
    libm difference landing within 0.5e-6 of a rounding boundary
    (~1e-10 per row) — strictly smaller than the failure the recipe
    would introduce.  Both engines evaluate the identical expression
    on the identical exact u, so any flip requires JVM Math.log and
    DuckDB's libm to disagree on the same input.

    Shape: one scan + TakeOrdered (k-bounded — no global sort is
    materialized); the weight column is whatever upstream scorer
    produced (DSIR log-weights, classifier margins, negative NLL).
    Rows with a NULL weight are EXCLUDED before the draw (NULL has no
    exp-proportional meaning, and NULL ordering differs across
    engines).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # a NULL weight has no exp-proportional meaning and NULL ordering
    # differs between engines — excluded, documented
    df = df.filter(F.col(weight_col).isNotNull())
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    g = F.round(F.col(weight_col) + (-F.log(-F.log(u))), 6)
    return (
        df.withColumn(score_col, g)
        .orderBy(F.col(score_col).desc(), F.col(key).asc())
        .limit(int(k))
    )


def split_assign_leakage_free(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """:func:`split_assign` with the near-duplicate CLOSURE as the
    hashing unit: documents connected through the ``pairs`` relation
    (``id_a, id_b`` near-dup edges from any pair generator — MinHash,
    shingle-Jaccard, SimHash, embedding-LSH) land in the SAME split,
    because the variate hashes the connected-component label instead
    of the document id.  Splitting by doc id leaks by construction —
    two near-identical documents straddle train/test with probability
    2·p·(1−p) each, and a benchmark scored on the test half of a dup
    pair measures memorization, not generalization (the failure
    split_leakage_audit DETECTS; this is the constructive fix).

    Singleton documents (no edge) use their own id as the component
    label, so on an empty ``pairs`` relation this degrades to exactly
    :func:`split_assign` — same salt, same thresholds, same variate.

    Invariant (pinned in tests): no component straddles splits, and
    assignment is reproducible from (id, pairs, salt) alone — adding
    UNRELATED documents or re-partitioning never moves a row.

    Scale shape: connected components over the pair graph (iterative
    min-label, the dedup_cluster_assignment machinery — pair graphs
    are sparse post-LSH), one left join of corpus onto the
    component-sized label relation, then the split_assign scan+CASE.
    The join is the only corpus-sized shuffle.
    """
    from square_etl_spark.operators.dedup import connected_components

    labels = connected_components(pairs).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("__grp")
    )
    keyed = df.join(labels, id_col, "left").withColumn(
        "__grp", F.coalesce(F.col("__grp"), F.col(id_col))
    )
    return split_assign(keyed, "__grp", fractions, salt, split_col).drop(
        "__grp"
    )


def stratified_take(
    df: DataFrame, strata: Sequence[str] | str, key: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order.

    One window pass = one shuffle on the strata key.  Deterministic:
    rank orders by (md5(key), key), so ties are impossible and the
    same rows win on every engine and every run.  At corpus scale with
    a dominant stratum, prefer rate-based ``hash_sample`` per stratum
    (shuffle-free) unless exact-n is a hard requirement.
    """
    strata_cols = [strata] if isinstance(strata, str) else list(strata)
    w = Window.partitionBy(*strata_cols).orderBy(hash_bucket(key), F.col(key))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_sample_ares(
    df: DataFrame,
    strata: Sequence[str] | str,
    key: str,
    weight: Column,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (A-Res /
    Efraimidis-Spirakis): each row draws its uniform u from the md5
    hash-order machinery above and gets priority ln(u)/w — the
    monotone log form of the classic u^(1/w) key — and the top
    ``n_per_stratum`` priorities win per stratum.  P[selected] is
    proportional-ish to weight (exactly the A-Res inclusion law), so
    "sample docs ∝ quality score" is this operator with the score as
    ``weight``.

    Deterministic and engine-portable: u = (hv + 0.5)/2³², hv the
    md5-prefix integer, so the oracle recomputes identical priorities
    (ln differs by ≤1 ulp across libm implementations — orders of
    magnitude below the ~1/n priority spacing, and the (priority,
    key) tiebreak makes equal priorities impossible).  One window
    shuffle on the strata key, same shape as :func:`stratified_take`;
    weights must be > 0 (ln(u) < 0 flips division by a non-positive
    weight into nonsense — guard upstream).

    Returns the sampled rows plus ``priority`` (rounded to 9
    decimals).
    """
    strata_cols = [strata] if isinstance(strata, str) else list(strata)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))),
            1,
            _HEX_DIGITS,
        ),
        16,
        10,
    ).cast("long")
    u = (hv + F.lit(0.5)) / F.lit(float(_HEX_SPACE))
    pri = F.log(u) / weight
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__pri").desc(), F.col(key)
    )
    return (
        df.withColumn("__pri", pri)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .withColumn("priority", F.round(F.col("__pri"), 9))
        .drop("__pri", "__rk")
    )


def shard_assign(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Stable shard id + within-shard position — training-file layout.

    ``shard`` = 16-bit md5 prefix mod n (uniform, key-stable);
    ``shard_pos`` = 1-based dense position within the shard in hash
    order (a deterministic "shuffle" of the corpus — hash order IS the
    random order, so downstream readers get decorrelated batches
    without a separate shuffle step).  One window pass; shards are
    near-equal by construction so the window shuffle is unskewed.
    Write with ``.partitionBy("shard")`` for one output dir per shard.
    """
    hex4 = F.substring(F.md5(F.col(key).cast("string")), 1, 4)
    shard = (F.conv(hex4, 16, 10).cast("bigint") % n_shards).alias("shard")
    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(hash_bucket(key), F.col(key))
    return out.withColumn("shard_pos", F.row_number().over(w))


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Fixed-width histogram: (bin, lo_edge, n, min_v, max_v) per bin.

    Values are clamped into [lo, hi) edge bins, so the bin count is
    exact even with outliers.  Single aggregate pass with map-side
    partial combine — the result is n_bins rows regardless of input
    size, the right shape for 100 TB profiling.
    """
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - F.lit(float(lo))) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("bigint")
    return (
        df.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(col).cast("double")).alias("min_v"),
            F.max(F.col(col).cast("double")).alias("max_v"),
        )
        .withColumn("lo_edge", (F.lit(float(lo)) + F.col("bin") * F.lit(width)))
    )


def ntile_assign(
    df: DataFrame,
    order_col: str,
    tiebreak: str,
    n: int,
    partitions: int = 32,
) -> DataFrame:
    """Equal-count quantile bins (``tile`` 1..n) — curriculum buckets.

    Orders by (order_col, tiebreak) so the assignment is total and
    deterministic, and is EXACTLY ``NTILE(n) OVER (ORDER BY order_col,
    tiebreak)`` — but computed without a single-partition window (the
    r06 plan audit's gw discipline; a global ntile moves every row to
    one task).  Distributed two-phase rank instead:

    1. ``repartitionByRange`` on the sort key → ``partitions`` ordered
       slices, each ranked locally in parallel (``row_number`` per
       ``spark_partition_id``);
    2. per-slice row counts → a ≤``partitions``-row driver prefix
       table broadcast back; global rank = local rank + slice offset.
       (Boundary placement from range sampling doesn't matter — any
       boundary yields the same exact global rank.)
    3. NTILE arithmetic on the rank: the first ``N mod n`` buckets
       take ``N div n + 1`` rows, the rest ``N div n`` — the standard
       SQL NTILE split, as plain column math.
    """
    # localCheckpoint PINS the range shuffle: the slice counts and the
    # per-slice rank below are two separate jobs, and without the pin
    # each job re-executes repartitionByRange with a fresh RDD id —
    # whose RANGE-BOUNDARY SAMPLING is seeded per RDD, so at scales
    # where the sample jitters the two jobs disagree on row→slice
    # assignment and the offsets corrupt the global rank (caught by
    # the full sf0.1 oracle sweep: tiles off by one region, max tile
    # n+1; sf0.01 passed only because sampling there sees every row).
    # One materialization, two cheap reads — the operator inherently
    # needs two passes over the shuffled relation.
    parts = df.repartitionByRange(
        partitions, F.col(order_col), F.col(tiebreak)
    ).localCheckpoint(eager=True)
    tagged = parts.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(order_col, tiebreak)
    local = tagged.withColumn("__rk", F.row_number().over(w))
    counts = (
        tagged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy("__pid")
        .collect()  # ≤`partitions` rows of driver metadata
    )
    offsets, total = [], 0
    for r in counts:
        offsets.append((r["__pid"], total))
        total += r["__cnt"]
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    rank = F.col("__off") + F.col("__rk")
    bucket, rem = divmod(total, n) if total else (0, 0)
    if bucket == 0:
        # fewer rows than tiles: NTILE gives each row its own tile
        tile = rank
    else:
        head = (bucket + 1) * rem  # rows covered by the larger buckets
        # integer ceil-div (a + b − 1) div b: exact past 2^53 rows,
        # where double division's ceil would misround
        tile = F.when(
            rank <= head,
            F.expr(f"(__off + __rk + {bucket}) div {bucket + 1}"),
        ).otherwise(
            rem + F.expr(f"(__off + __rk - {head} + {bucket - 1}) div {bucket}")
        )
    return (
        # bcast-ok: partition-offset map, one row per shuffle partition
        local.join(F.broadcast(off_df), "__pid")
        .withColumn("tile", tile.cast("int"))
        .drop("__pid", "__rk", "__off")
    )


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Stacked per-column profile: rows (column_name, n_rows, n_nulls,
    n_distinct, min_str, max_str).

    One aggregate job; all columns profiled in a single pass over the
    data (the per-column aggregates run side by side, then unpivot),
    not one scan per column.  min/max are cast to string so mixed
    column types stack into one frame.
    """
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(
                f"{c}__nulls"
            ),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = None
    for c in cols:
        row = wide.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        stacked = row if stacked is None else stacked.unionByName(row)
    return stacked


def skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Shuffle-key skew diagnostics — run this BEFORE keying a 100 TB
    join or aggregation on a column: one row of distribution facts
    that decide whether the key needs salting / AQE skew handling.

    Emits (n_rows, n_keys, max_key_share, skew_ratio, entropy):
    ``max_key_share`` is the hottest key's row fraction (the single
    number that predicts a straggler task), ``skew_ratio`` is
    max/mean rows per key (1.0 = perfectly uniform), and ``entropy``
    is the Shannon entropy of the key distribution in nats (ln n_keys
    = uniform; far below it = concentrated).

    ONE aggregation over the key-frequency relation (whose size is
    the KEY CARDINALITY, not the data): entropy uses the identity
    H = ln T − (Σ c·ln c)/T, so the corpus total T never needs to be
    known before the per-key pass — the naive −Σ (c/T)·ln(c/T) form
    costs a second full aggregation of the data just to learn T
    first.  Per-key ``c·ln c`` terms round to 6 decimals into DECIMAL
    sums so the result is engine-exact and oracle-checkable.
    """
    freq = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    term = F.round(F.col("c") * F.log("c"), 6).cast("decimal(18,6)")
    t = F.col("t_rows")
    return (
        freq.agg(
            F.sum("c").alias("t_rows"),
            F.count(F.lit(1)).alias("t_keys"),
            F.max("c").alias("max_c"),
            F.sum(term).cast("double").alias("s_clnc"),
        )
        .select(
            t.alias("n_rows"),
            F.col("t_keys").alias("n_keys"),
            F.round(F.col("max_c") / t, 6).alias("max_key_share"),
            F.round(F.col("max_c") * F.col("t_keys") / t, 6).alias(
                "skew_ratio"
            ),
            F.round(F.log(t) - F.col("s_clnc") / t, 6).alias("entropy"),
        )
    )


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_cols: Sequence[str] = ("doc_id", "chunk_idx"),
    budget: int = 2048,
) -> DataFrame:
    """Pack token-counted chunks into fixed-budget training sequences.

    Every chunk gets a deterministic position in a global hash-order
    stream (md5 of its key — the same engine-portable "shuffle" as
    ``shard_assign``); ``seq_id = floor(prefix_tokens / budget)`` and
    ``seq_offset = prefix_tokens % budget`` place it in the
    concatenate-and-split layout LLM trainers consume.  A chunk may
    straddle two sequences (offset + n_tokens > budget); trainers that
    need hard boundaries should feed chunk_size-aligned budgets.

    The global exclusive prefix sum is computed WITHOUT a
    single-partition window: shard on the first md5 byte (256 shards),
    cumsum per shard in parallel, then add per-shard offsets from a
    256-row driver-side prefix table broadcast back.  Because the
    shard key is a PREFIX of the hash, (shard, hash, key) order IS
    (hash, key) order — so the result equals a global
    ``SUM() OVER (ORDER BY md5(key), key)``, which is exactly what the
    DuckDB oracle states.  Scales to any corpus: one unskewed 256-way
    shuffle + one broadcast join.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    tagged = df.withColumn("__h", F.md5(key)).withColumn(
        "__shard", F.substring("__h", 1, 2)
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy("__h", *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "__cum_incl", F.sum(F.col(token_col).cast("long")).over(w)
    )
    totals = (
        tagged.groupBy("__shard")
        .agg(F.sum(F.col(token_col).cast("long")).alias("__tot"))
        .orderBy("__shard")
        .collect()
    )
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["__shard"], running))
        running += r["__tot"]
    off_df = df.sparkSession.createDataFrame(
        offsets or [("00", 0)], "__shard string, __off long"
    )
    cum = F.col("__off") + F.col("__cum_incl") - F.col(token_col).cast("long")
    # long DIV keeps seq_id exact past 2^53 cumulative tokens, where
    # floor(cum / budget)'s double division would lose low bits and
    # disagree with the exact long `cum % budget` offset.
    return (
        # bcast-ok: shard-offset map, ≤256 rows by shard-count bound
        local.join(F.broadcast(off_df), "__shard")
        .withColumn("__cum", cum)
        .withColumn("seq_id", F.expr(f"__cum DIV {int(budget)}").cast("bigint"))
        .withColumn("seq_offset", (F.col("__cum") % budget).cast("bigint"))
        .drop("__h", "__shard", "__cum_incl", "__off", "__cum")
    )


def _group_prefix(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
) -> tuple[DataFrame, Column]:
    """The shared two-phase per-group EXCLUSIVE prefix sum of
    :func:`budget_cap` (engine-portable md5-of-key order): returns
    ``(tagged_df, cum_before)`` where ``tagged_df`` carries the
    book-keeping columns (``__h __shard __cum_incl __off __g __s``
    — drop them when done) and ``cum_before`` is the column
    expression for the group's weight strictly before the row.

    Phase 1: cumsum inside (group, 256-way md5-prefix shard)
    partitions in parallel; phase 2: per-(group, shard) totals — a
    bounded |groups| × 256-row driver table (the mixture-dims
    contract) — fold into exclusive shard offsets and broadcast
    back.  Shared by :func:`budget_cap` (filter while under budget)
    and :func:`epoch_repeat` (emit repeat epochs against it)."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    tagged = df.withColumn("__h", F.md5(key)).withColumn(
        "__shard", F.substring("__h", 1, 2)
    )
    w = (
        Window.partitionBy(group_col, "__shard")
        .orderBy("__h", *[F.col(c) for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn(
        "__cum_incl", F.sum(F.col(weight_col).cast("long")).over(w)
    )
    # bounded driver metadata: |groups| x <=256 rows (mixture dims)
    totals = (
        tagged.groupBy(group_col, "__shard")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__tot"))
        .orderBy(group_col, "__shard")
        .collect()
    )
    offsets, running, cur = [], 0, object()
    for r in totals:
        if r[group_col] != cur:
            cur, running = r[group_col], 0
        offsets.append((r[group_col], r["__shard"], running))
        running += r["__tot"]
    gtype = df.schema[group_col].dataType.simpleString()
    off_df = df.sparkSession.createDataFrame(
        offsets or [(None, "00", 0)],
        f"__g {gtype}, __s string, __off long",
    )
    cum_before = (
        F.col("__off") + F.col("__cum_incl") - F.col(weight_col).cast("long")
    )
    # eqNullSafe on the group: a NULL group is a real group (groupBy
    # keeps it, the offset table has its row) — a plain equi-join
    # silently DROPPED its rows instead of budget-capping them (r08
    # ADVICE item).
    joined = local.join(
        # bcast-ok: per-(group, shard) offset map, |groups| x <=256
        # rows; group_col is a mixture dimension by contract (doc
        # above), never a corpus-linear key
        F.broadcast(off_df),
        F.col(group_col).eqNullSafe(F.col("__g"))
        & (F.col("__shard") == F.col("__s")),
    )
    return joined, cum_before


def budget_cap(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    budget: int | None = None,
    budgets: DataFrame | None = None,
) -> DataFrame:
    """Cap each group at a fixed weight budget, deterministically.

    The corpus-mixing primitive "take at most N tokens from each
    source": rows are consumed in the same engine-portable md5-of-key
    order as ``pack_sequences``, and a row survives iff the EXCLUSIVE
    per-group prefix weight before it is still under ``budget`` — so
    every group keeps the minimal deterministic subset that reaches
    the budget (the straddling row that crosses it is kept; trims are
    the trainer's concern).  Re-running on a re-partitioned copy, or
    incrementally on the same keys, selects the same rows.

    Same two-phase distributed prefix sum as ``pack_sequences``, but
    per group: cumsum inside (group, 256-way md5-prefix shard)
    partitions in parallel, then per-(group, shard) totals — a
    bounded |groups| x 256-row driver table — fold into exclusive
    shard offsets and broadcast back.  ``group_col`` must be a
    mixture dimension (source catalog, language set: 10^1-10^3
    values), NOT a corpus-linear key; the offset table is
    groups x 256 rows, so a high-cardinality group column belongs in
    ``hash_sample``-style rate capping instead (that variant is
    shuffle-free but only approximates the budget).

    Pass EITHER ``budget`` (one cap shared by every group) or
    ``budgets`` — a per-group relation ``(group_col, budget)``
    bounded by the same mixture-dims contract (it broadcasts).
    Groups absent from ``budgets``, or with budget ≤ 0, keep
    nothing; groups whose total weight is under their budget keep
    everything.  :func:`temperature_mix` derives ``budgets`` from
    the corpus itself.
    """
    if (budget is None) == (budgets is None):
        raise ValueError("pass exactly one of budget / budgets")
    if budget is not None and budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    capped, cum_before = _group_prefix(df, group_col, weight_col, key_cols)
    if budgets is None:
        capped = capped.filter(cum_before < budget)
    else:
        bdf = budgets.select(
            F.col(group_col).alias("__bg"),
            F.col("budget").cast("long").alias("__budget"),
        )
        capped = (
            capped.join(
                # bcast-ok: per-group budget map, |groups| rows by the
                # same mixture-dims contract as the offset table
                F.broadcast(bdf),
                F.col(group_col).eqNullSafe(F.col("__bg")),
            )
            .filter(cum_before < F.col("__budget"))
            .drop("__bg", "__budget")
        )
    return capped.drop(
        "__h", "__shard", "__cum_incl", "__off", "__g", "__s"
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    total_budget: int,
    alpha: float = 0.5,
    sizes: DataFrame | None = None,
    max_epochs: float | None = None,
) -> DataFrame:
    """Temperature-scaled corpus mixing (the GPT-3/PaLM recipe): each
    mixture group's share of ``total_budget`` is proportional to its
    corpus size raised to ``alpha`` — α = 1 keeps natural
    proportions, α → 0 flattens toward uniform, 0 < α < 1 up-weights
    small sources without drowning out large ones.

        budget_g = ⌊ total · n_g^α / Σ_h n_h^α ⌋

    then the rows are consumed with :func:`budget_cap`'s exclusive
    md5-order prefix rule against the derived per-group budget, so
    the selection inherits its determinism (re-partition / re-ingest
    invariant, straddling row kept).

    Cross-engine arithmetic: sizes are exact long sums; n^α rounds to
    9 decimals and sums as DECIMAL(38,9); shares divide in double and
    round to 9; budgets floor the 6-rounded product — every step an
    identical IEEE op on any engine.  Parity note: α = 0.5 (sqrt) and
    α = 1 are exactly-rounded IEEE ops everywhere; arbitrary
    exponents ride each engine's pow and may differ in the last ulp —
    stick to {0.25, 0.5, 1} when an oracle must agree bit-for-bit.

    Scale shape: one grouped aggregate for sizes (|groups| rows, the
    mixture-dims contract), a 1-row total crossJoin-broadcast, then
    budget_cap's two-phase prefix sum — no corpus-sized state beyond
    the scan.  Floor'd shares can under-fill the total by < |groups|
    rows' weight; groups flooring to 0 keep nothing (document or
    bump ``total_budget``).

    ``sizes`` swaps the per-group size aggregate for a PRECOMPUTED
    ``(group_col, weight)`` relation — the mergeable state of
    :func:`group_weight_sizes` / :func:`fold_group_sizes` (sum
    monoid, so fold ≡ one-shot exactly).  A continuous-ingest mix
    then derives its budgets from the accumulated sizes without
    re-aggregating history; the consumption stage still scans the
    rows being selected (inherent — selection emits rows).

    ``max_epochs`` adds the data-constrained cap (Muennighoff et al.
    2023, arXiv:2305.16264: repeating data beyond ~4 epochs stops
    helping): each group's budget clips at
    ``⌊round(max_epochs · n_g, 6)⌋`` so a small group whose
    temperature share exceeds what it can supply at the allowed
    repetition is capped at that supply instead of silently promising
    weight that isn't there.  With ``max_epochs = 1`` a capped group
    keeps EVERYTHING it has and no more — the no-repetition corpus
    build.  The clipped total under-fills ``total_budget`` by the
    sum of the deficits; redistribution across rounds is the
    trainer's water-filling loop (re-run with the residual budget
    over the uncapped groups), kept out of this one-step primitive
    so the arithmetic stays a pure per-group expression.  ``None``
    (default) preserves the uncapped arithmetic bit-for-bit.
    """
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    if sizes is None:
        sizes = df.groupBy(group_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__n")
        )
    else:
        sizes = sizes.select(
            group_col, F.col("weight").cast("long").alias("__n")
        )
    pw = sizes.withColumn(
        "__pw",
        F.round(F.pow(F.col("__n").cast("double"), F.lit(float(alpha))), 9)
        .cast("decimal(38,9)"),
    )
    tot = pw.agg(F.sum("__pw").alias("__sp"))
    # bcast-ok: 1-row mixture-total aggregate
    budgets = (
        pw.crossJoin(F.broadcast(tot))
        .withColumn(
            "__share",
            F.round(
                F.col("__pw").cast("double")
                / F.col("__sp").cast("double"),
                9,
            ),
        )
        .select(
            group_col,
            F.col("__n"),
            F.floor(
                F.round(F.col("__share") * F.lit(int(total_budget)), 6)
            ).alias("budget"),
        )
    )
    if max_epochs is not None:
        budgets = budgets.select(
            group_col,
            F.least(
                F.col("budget"),
                F.floor(
                    F.round(
                        F.col("__n").cast("double")
                        * F.lit(float(max_epochs)),
                        6,
                    )
                ),
            ).alias("budget"),
        )
    else:
        budgets = budgets.select(group_col, "budget")
    return budget_cap(
        df, group_col, weight_col, key_cols, budgets=budgets
    )


def _epoch_cap(n: int, max_epochs: float) -> int:
    """⌊round(max_epochs·n, 6)⌋ — the data-constrained supply ceiling,
    mirroring DuckDB's FLOOR(ROUND(n·max_epochs, 6)) (half-up via
    floor(x·1e6 + 0.5)).  The ONE shared copy of this bridge — the
    fixpoint callers (temperature and DoReMi waterfill) must clip
    with identical arithmetic or their budgets diverge from the
    oracle's (r11 review: the DoReMi branch had a verbatim copy)."""
    import math

    return math.floor(
        math.floor(n * float(max_epochs) * 10**6 + 0.5) / 10**6
    )


def _budgets_relation(df: DataFrame, group_col: str, budgets: dict) -> DataFrame:
    """A computed {group: budget} dict as the (group, budget) relation
    budget_cap/epoch_repeat consume — deterministic row order (NULL
    group last, the SQL ASC NULLS LAST order)."""
    gtype = df.schema[group_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        [
            (g, int(b))
            for g, b in sorted(
                budgets.items(), key=lambda kv: (kv[0] is None, kv[0])
            )
        ],
        f"{group_col} {gtype}, budget long",
    )


def waterfill_budgets(
    items: Sequence[tuple], total: int
) -> dict:
    """EXACT water-filling of an integer ``total`` over groups with
    proportional shares and hard supply caps — the redistribution the
    one-step :func:`temperature_mix` deliberately leaves out (r10
    verdict item 2; Muennighoff et al. 2023, arXiv:2305.16264:
    data-constrained mixes must re-spend a capped group's deficit on
    the uncapped groups, not silently under-fill the token budget).

    ``items`` = ``[(group, x, cap)]`` with ``x`` an exact-integer
    share weight (e.g. ``n^α`` scaled to 1e9) and ``cap`` the group's
    integer supply ceiling.  Fixpoint: allocate
    ``alloc_g = ⌊x_g · residual / Σ_free x⌋`` (exact integer floor
    division — no float in the loop), cap every group whose
    allocation reaches its ceiling, subtract the capped budgets from
    the residual, re-share over the still-uncapped groups; when no
    new cap binds, distribute the ≤ |free|−1 floor-division leftover
    by LARGEST REMAINDER (``x_g·residual mod Σx`` desc, group asc) —
    each bonus is +1 and ``alloc_g < cap_g`` for free groups, so no
    bonus can breach a cap.  Every step is integer arithmetic, so a
    SQL oracle reproduces the budgets bit-for-bit (the
    ``mix_temperature_waterfill`` recursive CTE) and the invariant

        Σ budgets  ==  min(total, Σ caps)

    holds EXACTLY — qualified (r11 ADVICE): a group with ``x == 0``
    but ``cap > 0`` supplies NOTHING (water-filling gives a
    zero-share group no water, so its cap is not spendable supply);
    the exact form is

        Σ budgets  ==  min(total, Σ_{g: x_g > 0} cap_g)

    which reduces to the unqualified invariant whenever every
    positive-cap group has a positive share — true for every current
    caller, where x = round(n^α·1e9) or λ·1e9 is 0 only when n = 0,
    hence cap = 0.  (Proof sketch: the loop ends either with every
    positive-share group capped — spend = their Σcaps — or with a
    final free set whose allocations + remainders sum to the
    residual — spend = total.  Zero-share groups never receive an
    allocation or a largest-remainder bonus: their remainder is
    exactly 0 while the floor-division leftover is bounded by the
    count of positive-remainder groups.)

    A ``None`` group is a REAL group (the same contract as
    budget_cap's eqNullSafe joins — r11 ADVICE): it participates in
    the fixpoint like any other key and sorts LAST in the
    largest-remainder group-asc tie-break, matching SQL's ASC NULLS
    LAST so a SQL twin reproduces the bonus assignment.

    ≤ |groups| iterations over a |groups|-sized dict: mixture-dims
    driver metadata, same contract as budget_cap's offset table.
    """
    budgets: dict = {}
    free = {g: (int(x), int(cap)) for g, x, cap in items}
    while free:
        residual = int(total) - sum(budgets.values())
        sw = sum(x for x, _ in free.values())
        if residual <= 0 or sw <= 0:
            for g in free:
                budgets[g] = 0
            break
        alloc = {g: (x * residual) // sw for g, (x, _) in free.items()}
        newly = [g for g in free if alloc[g] >= free[g][1]]
        if newly:
            for g in newly:
                budgets[g] = free[g][1]
                del free[g]
            continue
        leftover = residual - sum(alloc.values())  # < |free| exactly
        rem = {g: (free[g][0] * residual) % sw for g in free}
        # NULL group sorts last (ASC NULLS LAST); at most one None key
        # exists, so the tuple comparison never reaches a None-vs-None
        bonus = set(
            sorted(free, key=lambda g: (-rem[g], g is None, g))[:leftover]
        )
        for g in free:
            budgets[g] = alloc[g] + (1 if g in bonus else 0)
        break
    return budgets


def temperature_mix_waterfill(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    total_budget: int,
    alpha: float = 0.5,
    sizes: DataFrame | None = None,
    max_epochs: float = 1.0,
) -> DataFrame:
    """:func:`temperature_mix` with the data-constrained deficits
    RE-SPENT in-engine (:func:`waterfill_budgets`): groups whose
    temperature share exceeds ``⌊round(max_epochs·n_g, 6)⌋`` are
    clipped at that supply ceiling and the unspent residual re-shares
    over the uncapped groups until no cap binds — so the selection
    fills ``min(total_budget, Σ caps)`` exactly instead of
    under-filling by the sum of the deficits (the one-step
    primitive's documented punt).

    Arithmetic bridge: each group's share weight is ``n^α`` rounded
    HALF_UP to 9 decimals and scaled to an exact integer
    (``x = round(n^α·1e9)``); everything after that single
    double→int bridge is exact integer arithmetic, mirrored
    bit-for-bit by the DuckDB oracle's recursive CTE (α = 0.5 is a
    correctly-rounded IEEE sqrt on every engine — the same parity
    contract as temperature_mix).

    Scale shape: one |groups|-row size aggregate collected to the
    driver (the mixture-dims contract budget_cap already relies on
    for its offset table), the pure-Python fixpoint on that bounded
    dict, then budget_cap's two-phase prefix consumption — the
    corpus is still scanned exactly once.

    A NULL group is a real group end-to-end (r12): it is sized,
    water-filled (NULLS-LAST tie-break, see
    :func:`waterfill_budgets`), and consumed via budget_cap's
    eqNullSafe joins like any other key.
    """
    bdf = temperature_waterfill_budgets(
        df, group_col, weight_col, total_budget, alpha, sizes, max_epochs
    )
    return budget_cap(df, group_col, weight_col, key_cols, budgets=bdf)


def temperature_waterfill_budgets(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_budget: int,
    alpha: float = 0.5,
    sizes: DataFrame | None = None,
    max_epochs: float = 1.0,
) -> DataFrame:
    """The water-filled per-group BUDGETS relation ``(group,
    budget)`` — :func:`temperature_mix_waterfill`'s fixpoint output
    as a first-class artifact, for consumers other than the one-pass
    selection (e.g. :func:`epoch_repeat`'s repeated-epoch stream, or
    persisting the mixture recipe next to the corpus snapshot).  See
    temperature_mix_waterfill for the arithmetic contract."""
    import math

    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    if sizes is None:
        sizes = df.groupBy(group_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__n")
        )
    else:
        sizes = sizes.select(
            group_col, F.col("weight").cast("long").alias("__n")
        )
    # bounded driver metadata: |groups| rows (mixture-dims contract)
    items = []
    for r in sizes.collect():
        g, n = r[group_col], int(r["__n"] or 0)
        # x = std::round(n^α · 1e9) with ONE double rounding — the
        # exact mirror of the oracle's ROUND(pow(n,α)*1e9, 0).  The
        # earlier round-to-9dp-then-scale form compounded TWO double
        # roundings and diverged by 1 ulp from the SQL side for
        # n ≳ 10¹¹ (and its BIGINT overflowed at α=1, n ≳ 10¹⁰) —
        # caught by the cross-engine bridge pin in test_sampling;
        # this form is mismatch-free to n = 10¹⁵ across α ∈
        # {0.25, 0.5, 1} (22k-sample sweep).
        y = float(n) ** float(alpha) * 1e9
        fl = math.floor(y)
        x = int(fl) + (1 if y - fl >= 0.5 else 0)
        items.append((g, x, _epoch_cap(n, max_epochs)))
    budgets = waterfill_budgets(items, int(total_budget))
    return _budgets_relation(df, group_col, budgets)


def epoch_repeat(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    budgets: DataFrame,
) -> DataFrame:
    """EMIT the repeated training epochs a data-constrained budget
    promises — the consumer half of Muennighoff-style repetition
    (arXiv:2305.16264): a per-group ``budget`` larger than the
    group's supply means the trainer sees the data more than once,
    and this operator materializes exactly that stream.  Every row
    gains an ``epoch`` column (1-based): all rows repeat
    ``budget div supply`` full epochs, and the final partial epoch
    keeps the deterministic md5-order prefix whose exclusive weight
    is under ``budget mod supply`` (the straddling row kept — the
    same rule as :func:`budget_cap`, so epoch E's prefix is
    bit-identical to budget_cap at the residual budget).  A group
    whose budget ≤ its supply degenerates to budget_cap with
    epoch = 1 rows only.

    ``budgets`` is the (group, budget) relation — typically
    :func:`temperature_mix_waterfill`'s fixpoint output with
    ``max_epochs > 1``, whose caps bound budget ≤
    ⌊max_epochs·supply⌋ so no group repeats beyond the allowed
    epochs.  Groups with zero total weight or missing/≤0 budgets
    emit nothing.

    Scale shape: :func:`_group_prefix`'s two-phase prefix sum (the
    corpus scanned once), two broadcast joins against |groups|-sized
    relations, then a per-row explode of at most
    ⌈budget/supply⌉ ≤ max_epochs epoch indices — output volume is
    the TRAINING volume, proportional to the budget by definition.
    """
    tagged, cum_before = _group_prefix(df, group_col, weight_col, key_cols)
    sup = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__sup")
    )
    bdf = budgets.select(
        F.col(group_col).alias("__bg"),
        F.col("budget").cast("long").alias("__budget"),
    )
    j = (
        tagged.join(
            # bcast-ok: per-group supply, |groups| rows (mixture dims)
            F.broadcast(
                sup.select(F.col(group_col).alias("__sg"), "__sup")
            ),
            F.col(group_col).eqNullSafe(F.col("__sg")),
        )
        .join(
            # bcast-ok: per-group budget map, |groups| rows
            F.broadcast(bdf),
            F.col(group_col).eqNullSafe(F.col("__bg")),
        )
        .filter((F.col("__sup") > 0) & (F.col("__budget") > 0))
    )
    full = F.expr("__budget div __sup")
    rem = F.col("__budget") % F.col("__sup")
    n_epochs = (
        full + F.when(cum_before < rem, F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        j.withColumn("__n_ep", n_epochs)
        .filter(F.col("__n_ep") >= 1)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(1), F.col("__n_ep")))
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
        .drop(
            "__h", "__shard", "__cum_incl", "__off", "__g", "__s",
            "__sg", "__sup", "__bg", "__budget", "__n_ep",
        )
    )


def doremi_mix(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    total_budget: int,
    excess: DataFrame,
    eta: float = 1.0,
    eps: float = 0.1,
    max_epochs: float | None = None,
    waterfill: bool = False,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023,
    arXiv:2305.10429), one multiplicative-weights step: domains whose
    documents score WORSE than the corpus baseline (positive excess
    loss — the signal that the domain is under-learned) get their
    mixture share raised exponentially, then smoothed toward uniform
    so no domain starves:

        w_d  = exp(η · excess_d)            (MW step from uniform)
        λ_d  = (1−ε) · w_d / Σ_h w_h  +  ε / k
        budget_d = ⌊ total · λ_d ⌋

    The full published method iterates this update while TRAINING a
    proxy model between steps; the engine's job is the data side — one
    exact, reproducible reweight-and-select step given per-domain
    excess scores from ANY reference signal (here the corpus unigram
    LM; swap in real proxy-model losses at production scale).
    Consumption is :func:`budget_cap`'s deterministic md5-prefix take,
    so the selection is re-partition / re-ingest invariant.

    ``excess`` is a ``(group_col, excess)`` relation, excess ≥ 0 and
    pre-rounded (6 decimals) by the caller — domain-sized, the same
    mixture-dims contract as ``temperature_mix``'s sizes.  The
    domain universe is taken from ``df`` ITSELF: a group present in
    the corpus but missing from ``excess`` (e.g. every doc scored as
    empty) behaves exactly like a NULL excess — weight exp(0) = 1,
    the uniform-smoothed share — rather than silently vanishing from
    the selection (and extra ``excess`` rows for groups absent from
    the corpus are ignored rather than diluting ε/k).  η·excess is
    asserted ≤ 66 inside the plan (E2 fail-fast): past that the
    exp weight would overflow DECIMAL(38,9) to NULL under the
    non-ANSI decimal cast and zero-budget exactly the domain the
    method says should get the most.

    Cross-engine arithmetic: exp(η·excess) rounds to 9 decimals into
    DECIMAL(38,9) sums; λ divides in double and rounds to 9; budgets
    floor the 6-rounded product.  CAVEAT: unlike sqrt, ``exp`` is not
    guaranteed correctly-rounded on every libm — a value landing
    within ~1 ulp of a 0.5e-9 rounding boundary could differ between
    engines.  That risk is data-fixed (deterministic per dataset, not
    flaky) and verified empirically by the tri-scale oracle check;
    keep η small (≤ 2) so the exp stays in a low-ulp range.

    Scale shape: the weight/budget derivation touches only
    domain-sized relations (k rows); the corpus is scanned once by
    budget_cap's two-phase prefix sum.  Zero driver-side collects in
    the default path.

    ``max_epochs`` clips each domain's budget at
    ``⌊round(max_epochs·n_d, 6)⌋`` (the temperature_mix semantics);
    ``waterfill=True`` additionally re-spends the clipped deficits
    over the uncapped domains via :func:`waterfill_budgets` (exact
    integer fixpoint on the λ weights — one bounded |domains|-row
    collect, the mixture-dims contract).
    """
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    from square_etl_spark.operators.quality import assert_invariant

    # domain universe from the CORPUS (one mixture-dims grouped agg,
    # same cost shape as temperature_mix's sizes pass), with excess
    # left-joined on: a missing row and a NULL excess both mean "no
    # evidence" = weight exp(0) = 1 — neither may poison the MW
    # arithmetic and silently drop the group from the selection (the
    # budget-join would never match a NULL/absent budget; same
    # failure class as budget_cap's NULL-group fix)
    universe = df.select(group_col).distinct()
    ex = F.coalesce(F.col("excess"), F.lit(0.0))
    arg = F.lit(float(eta)) * ex
    w = universe.join(excess, group_col, "left")
    # E2 fail-fast: past exp(66) the DECIMAL(38,9) cast would NULL out
    # (non-ANSI overflow) and zero-budget the hottest domain silently
    w = assert_invariant(
        w, arg <= F.lit(66.0),
        "doremi_mix: eta*excess > 66 would overflow the decimal weight",
    ).select(
        group_col,
        F.round(F.exp(arg), 9).cast("decimal(38,9)").alias("__w"),
        # localCheckpoint (r16): |domains| rows consumed twice below
        # (the Σw/k total and the share join) — without it the corpus
        # distinct behind ``universe`` re-runs per consumer
    ).localCheckpoint(eager=False)
    tot = w.agg(
        F.sum("__w").alias("__sw"), F.count(F.lit(1)).alias("__k")
    )
    # bcast-ok: 1-row domain-weight total aggregate
    budgets = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "__lam",
            F.round(
                F.lit(1.0 - float(eps))
                * (F.col("__w").cast("double") / F.col("__sw").cast("double"))
                + F.lit(float(eps)) / F.col("__k").cast("double"),
                9,
            ),
        )
        .select(
            group_col,
            F.col("__lam"),
            F.floor(
                F.round(F.col("__lam") * F.lit(int(total_budget)), 6)
            ).alias("budget"),
        )
    )
    if waterfill:
        # data-constrained DoReMi: clip each domain at
        # floor(round(max_epochs·n, 6)) and re-spend the deficits over
        # the uncapped domains via the exact-integer fixpoint —
        # λ (already 9dp-rounded by the Spark plan, so the collect
        # recovers its exact integer·1e9 form) is the share weight
        from decimal import ROUND_HALF_UP, Decimal

        if max_epochs is None:
            raise ValueError("doremi_mix: waterfill requires max_epochs")
        sizes = df.groupBy(group_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__n")
        ).select(F.col(group_col).alias("__szg"), "__n")
        # bounded driver metadata: |domains| rows (mixture-dims
        # contract); eqNullSafe so a NULL domain keeps its real size —
        # NULL is a real group through the whole waterfill path (r12:
        # waterfill_budgets treats None like any key, NULLS-LAST
        # tie-break), the same contract as the budget join below
        rows = budgets.join(
            sizes, F.col(group_col).eqNullSafe(F.col("__szg")), "left"
        ).collect()
        items = []
        for r in rows:
            n = int(r["__n"] or 0)
            x = int(
                Decimal(repr(float(r["__lam"]))).quantize(
                    Decimal("1E-9"), rounding=ROUND_HALF_UP
                )
                * 10**9
            )
            items.append((r[group_col], x, _epoch_cap(n, max_epochs)))
        filled = waterfill_budgets(items, int(total_budget))
        budgets = _budgets_relation(df, group_col, filled)
    elif max_epochs is not None:
        # one-step clip without redistribution — temperature_mix's
        # max_epochs semantics, for parity between the two mixers.
        # eqNullSafe: a NULL domain is a real domain here (the same
        # contract as the budget join below — r11 review caught the
        # name-based left join silently zero-budgeting it)
        sizes = df.groupBy(group_col).agg(
            F.sum(F.col(weight_col).cast("long")).alias("__n")
        ).select(F.col(group_col).alias("__szg"), "__n")
        budgets = (
            budgets.join(
                sizes, F.col(group_col).eqNullSafe(F.col("__szg")), "left"
            )
            .select(
                group_col,
                F.least(
                    F.col("budget"),
                    F.floor(
                        F.round(
                            F.coalesce(F.col("__n"), F.lit(0))
                            .cast("double")
                            * F.lit(float(max_epochs)),
                            6,
                        )
                    ),
                ).alias("budget"),
            )
        )
    else:
        budgets = budgets.select(group_col, "budget")
    return budget_cap(df, group_col, weight_col, key_cols, budgets=budgets)


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    smoothing: float = 1.0,
    raw_counts: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, arXiv:2302.03169): score every raw-corpus document by how
    much more likely its hashed n-gram features are under the TARGET
    domain's feature distribution than under the raw corpus's own —

        log w(x) = Σ_{f ∈ feats(x)} [ ln p̂_target(b(f)) − ln p̂_raw(b(f)) ]

    with features = word n-grams (multiplicity kept — these are
    COUNT estimators) hashed into ``buckets`` buckets and both
    distributions Laplace-smoothed: p̂(b) = (c_b + s) / (N + s·B).
    Rank by ``dsir_logw`` (or feed it as the weight of
    :func:`weighted_sample_ares`) to select raw data that looks like
    the target domain — the distribution-matching complement to
    keyword retrieval (text.bm25_scores) and semantic blocking
    (dedup.semantic_dedup).

    Cross-engine exactness: features use the md5-portable 57-bit
    shingle chain (dedup.portable_word_shingles, distinct=False), the
    per-feature log-ratio rounds to 9 decimals and sums as
    DECIMAL(28,9) — order-free — and the total rounds to 6.

    Scale shape: both count tables are ≤ ``buckets`` rows (a
    parameter, not data) → broadcast joins; totals are 1-row
    aggregates; the only corpus-sized stages are the feature explode
    (the scan) and one groupBy on ``id_col``.  Documents shorter than
    ``n`` words have no features and emit no row.  Returns
    (id, n_feats, dsir_logw).

    ``raw_counts`` swaps the raw-corpus distribution for a
    PRECOMPUTED ``(bucket, count)`` relation — the mergeable state of
    :func:`dsir_feature_counts` / :func:`dsir_fold_counts`.  That is
    the continuous-ingest posture: the raw distribution accumulates
    batch by batch (count-sum monoid, so fold ≡ one-shot exactly) and
    scoring never rescans old text — only the ≤ ``buckets``-row state
    moves.  Features absent from the state score with the smoothed
    zero count.
    """
    from square_etl_spark.operators.dedup import portable_word_shingles

    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    sh = portable_word_shingles(text_col, n, distinct=False)
    bucket = lambda c: F.pmod(c, F.lit(buckets))

    tfe = target.select(F.explode(sh).alias("__f")).select(
        bucket(F.col("__f")).alias("__b")
    )
    tcnt = tfe.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    ttot = tcnt.agg(F.sum("__ct").alias("__nt"))

    rfe = raw.select(F.col(id_col), F.explode(sh).alias("__f")).select(
        id_col, bucket(F.col("__f")).alias("__b")
    )
    if raw_counts is None:
        # one-shot mode consumes the raw feature relation TWICE (the
        # count table and the scoring join) — materialize it (r16,
        # guide §5): the per-token md5 57-bit shingle chain is the
        # scan's CPU term, and the materialized rows are two narrow
        # columns (~16 B/feature, far smaller than re-running the
        # hash pass over the text).  The incremental raw_counts path
        # consumes rfe once and needs no checkpoint.
        rfe = rfe.localCheckpoint(eager=False)
        rcnt = rfe.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    else:
        rcnt = raw_counts.select(
            F.col("bucket").alias("__b"), F.col("count").alias("__cr")
        )
    rtot = rcnt.agg(F.sum("__cr").alias("__nr"))

    # fail fast in-plan on an empty/mis-filtered target: SUM over zero
    # rows is NULL, which would otherwise propagate NULL dsir_logw to
    # every scored doc (same E2 posture as doremi_mix's overflow guard)
    from square_etl_spark.operators.quality import assert_invariant

    ttot = assert_invariant(
        ttot,
        F.col("__nt").isNotNull() & (F.col("__nt") > 0),
        "dsir_logweights: target yielded no n-gram features "
        "(empty or mis-filtered target DataFrame)",
    )
    # and the raw side: an empty raw_counts state (fresh or
    # mis-filtered fold) would equally NULL every weight
    rtot = assert_invariant(
        rtot,
        F.col("__nr").isNotNull() & (F.col("__nr") > 0),
        "dsir_logweights: raw corpus yielded no n-gram features "
        "(empty raw DataFrame or empty raw_counts state)",
    )

    s = float(smoothing)
    sb = F.lit(s * buckets)
    term = F.round(
        F.log(
            (F.coalesce(F.col("__ct"), F.lit(0)).cast("double") + F.lit(s))
            / (F.col("__nt").cast("double") + sb)
        )
        - F.log(
            (F.coalesce(F.col("__cr"), F.lit(0)).cast("double") + F.lit(s))
            / (F.col("__nr").cast("double") + sb)
        ),
        9,
    )
    return (
        rfe
        # bcast-ok: hashed-feature count table, <= `buckets` rows (a
        # parameter, not data); scored docs may miss target buckets ->
        # left join + smoothing
        .join(F.broadcast(tcnt), "__b", "left")
        # bcast-ok: raw-corpus count table, <= `buckets` rows (param);
        # left: a stale raw_counts state may miss a scored doc's bucket
        .join(F.broadcast(rcnt), "__b", "left")
        # bcast-ok: 1-row target-total aggregate
        .crossJoin(F.broadcast(ttot))
        # bcast-ok: 1-row raw-total aggregate
        .crossJoin(F.broadcast(rtot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(
                F.sum(term.cast("decimal(28,9)")).cast("double"), 6
            ).alias("dsir_logw"),
        )
    )


def dsir_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
) -> DataFrame:
    """One ingest batch's hashed-feature bucket counts — the
    mergeable DSIR raw-distribution state, schema ``(bucket, count)``.
    Bounded at ≤ ``buckets`` rows however large the batch, so the
    state is a parquet-writable artifact that never grows with the
    corpus (the digest-state / minhash-index pattern applied to a
    distribution estimator)."""
    from square_etl_spark.operators.dedup import portable_word_shingles

    sh = portable_word_shingles(text_col, n, distinct=False)
    return (
        df.select(F.explode(sh).alias("__f"))
        .select(F.pmod(F.col("__f"), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def dsir_fold_counts(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a new batch's counts into the accumulated state: count-sum
    monoid, so fold ≡ one-shot EXACTLY at any batch split (pinned in
    tests).  Both sides and the result are ≤ buckets rows; in a
    long-running ingest loop, write (or localCheckpoint) the result
    per batch to truncate lineage — same guidance as
    dedup.incremental_exact_dedup."""
    return (
        state.unionByName(batch)
        .groupBy("bucket")
        .agg(F.sum("count").cast("long").alias("count"))
    )


def group_weight_sizes(
    df: DataFrame, group_col: str, weight_col: str
) -> DataFrame:
    """One ingest batch's per-group weight totals — the mergeable
    mixture-size state, schema ``(group_col, weight)``.  Bounded by
    the mixture-dims contract (|groups| rows) however large the
    batch; feed the folded state to
    :func:`temperature_mix(sizes=…)`."""
    return df.groupBy(group_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("weight")
    )


def fold_group_sizes(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a batch's group sizes into the accumulated state: sum
    monoid, fold ≡ one-shot at any split (pinned in tests) — the
    mixture twin of dsir_fold_counts."""
    group_col = [c for c in state.columns if c != "weight"][0]
    return (
        state.unionByName(batch)
        .groupBy(group_col)
        .agg(F.sum("weight").cast("long").alias("weight"))
    )
