"""J1–J4 semantics + physical-plan assertions (SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from square_etl_spark.operators.joins import (
    broadcast_left_enrich,
    explode_children,
    first_wins,
    lookup_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_left_join_orphans_get_nulls(spark):
    # missing parent → nulls (src/etl-square-catalog.ts:159-161)
    variations = spark.createDataFrame(
        [(1, "v1", "i1"), (2, "v2", "i9")], "vid long, vname string, item_id string"
    )
    items = spark.createDataFrame([("i1", "parent")], "item_id string, iname string")
    out = broadcast_left_enrich(variations, items, on="item_id").orderBy("vid").collect()
    assert out[0].iname == "parent"
    assert out[1].iname is None


def test_broadcast_join_is_physically_broadcast(spark, sf_dir):
    from square_etl_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    joined = broadcast_left_enrich(li, p, li.l_partkey == p.p_partkey)
    assert "BroadcastHashJoin" in _plan(joined)


def test_first_wins_deterministic(spark):
    # min-by-(ts, key), not arrival order (SURVEY.md §7 #2)
    rows = [
        ("o1", "p2", "2024-01-02"),
        ("o1", "p1", "2024-01-01"),
        ("o1", "p0", "2024-01-01"),  # ts tie → key tiebreak
        ("o2", "p9", "2024-03-01"),
    ]
    df = spark.createDataFrame(rows, "order_id string, payment_id string, ts string")
    out = {
        r.order_id: r.payment_id
        for r in first_wins(
            df, ["order_id"], ["ts", "payment_id"], ["payment_id"]
        ).collect()
    }
    assert out == {"o1": "p0", "o2": "p9"}


def test_lookup_join_drops_missing_keys(spark):
    # reference skips orders that 404 (src/etl-square-orders.ts:200-205)
    keys = spark.createDataFrame([("o1",), ("o404",)], "order_id string")
    orders = spark.createDataFrame([("o1", 5)], "order_id string, total long")
    out = lookup_join(keys, orders, "order_id").collect()
    assert [r.order_id for r in out] == ["o1"]


def test_explode_inner_skips_empty_parents(spark):
    # explode (not explode_outer): empty line_items vanish
    # (src/etl-square-orders.ts:202-205; SURVEY.md §7 #3)
    df = spark.createDataFrame(
        [("o1", [(1, "a")]), ("o2", [])],
        "order_id string, items array<struct<n:int,v:string>>",
    )
    out = explode_children(df, "items", ["order_id"], "li").collect()
    assert [(r.order_id, r.n, r.v) for r in out] == [("o1", 1, "a")]


def test_fuzzy_join_matches_one_char_typos_via_block(spark):
    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.createDataFrame(
        [("Customer#00x000123",), ("Customer#00x000456",)], "name string"
    )
    right = spark.createDataFrame(
        [("Customer#000000123",), ("Customer#000000456",),
         ("Customer#000000789",)], "name string"
    )
    out = fuzzy_join_blocked(
        left, right, "name", "name",
        block=lambda c: F.substring(c, 15, 4), max_dist=1,
    ).collect()
    got = {(r.l_val, r.r_val, r.dist) for r in out}
    assert got == {
        ("Customer#00x000123", "Customer#000000123", 1),
        ("Customer#00x000456", "Customer#000000456", 1),
    }


def test_fuzzy_join_misses_typos_in_the_blocking_key(spark):
    """Documented recall contract: a typo INSIDE the blocking key puts
    the dirty string in a different block, so it cannot match — the
    trade the two-phase design makes to avoid all-pairs."""
    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.createDataFrame([("Customer#00000012x",)], "name string")
    right = spark.createDataFrame([("Customer#000000123",)], "name string")
    out = fuzzy_join_blocked(
        left, right, "name", "name",
        block=lambda c: F.substring(c, 15, 4), max_dist=1,
    )
    assert out.count() == 0


def test_fuzzy_join_respects_max_dist(spark):
    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.createDataFrame([("abxy1234",)], "name string")  # 2 edits
    right = spark.createDataFrame([("abcd1234",)], "name string")
    same_block = lambda c: F.substring(c, 5, 4)  # noqa: E731
    assert fuzzy_join_blocked(
        left, right, "name", "name", block=same_block, max_dist=1
    ).count() == 0
    assert fuzzy_join_blocked(
        left, right, "name", "name", block=same_block, max_dist=2
    ).count() == 1


def test_fuzzy_join_block_cap_drops_hot_block_keeps_rest(spark):
    """Planted hot block: 30 left copies share one blocking key with 30
    right rows (900 candidates > cap) → the whole block is dropped; a
    normal block elsewhere survives untouched."""
    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.createDataFrame(
        [("Customer#00x000123",)] + [("dup-block-AAAA",)] * 30,
        "name string",
    )
    right = spark.createDataFrame(
        [("Customer#000000123",)] + [("dup-block-AAAA",)] * 30,
        "name string",
    )
    # chars 15-18: the typo never touches it; the short planted names
    # all collapse into the empty-string block — the classic stop-key
    blk = lambda c: F.substring(c, 15, 4)  # noqa: E731
    uncapped = fuzzy_join_blocked(
        left, right, "name", "name", block=blk, max_dist=1
    )
    assert uncapped.count() == 1 + 30 * 30
    capped = fuzzy_join_blocked(
        left, right, "name", "name", block=blk, max_dist=1, block_cap=100
    )
    got = {(r.l_val, r.r_val) for r in capped.collect()}
    assert got == {("Customer#00x000123", "Customer#000000123")}


def test_fuzzy_join_block_cap_plan_is_broadcast_anti(spark):
    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.createDataFrame([("abcd1234",)], "name string")
    capped = fuzzy_join_blocked(
        left, left, "name", "name",
        block=lambda c: F.substring(c, 5, 4), block_cap=10,
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_spatial_bin_join_matches_brute_force(spark):
    """Grid-blocked proximity join vs the all-pairs answer on a dense
    deterministic point set: exactly the same pairs (completeness —
    a true pair can never escape the 3x3 neighborhood — and no false
    survivors past the integer distance verify)."""
    from square_etl_spark.operators.joins import spatial_bin_join

    pts = [(i, (i * 37) % 200, (i * 61) % 200) for i in range(120)]
    left = spark.createDataFrame(pts, "lid long, lx long, ly long")
    right = spark.createDataFrame(pts, "rid long, rx long, ry long")
    r = 25
    got = {
        (row["lid"], row["rid"], row["dist2"])
        for row in spatial_bin_join(left, right, radius=r).collect()
    }
    want = {
        (a, c, (x1 - x2) ** 2 + (y1 - y2) ** 2)
        for a, x1, y1 in pts
        for c, x2, y2 in pts
        if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r * r
    }
    assert got == want


def test_spatial_bin_join_boundary_pairs_cross_cells(spark):
    """A pair straddling a cell boundary at exactly radius distance
    must be found (the neighbor replication exists for this)."""
    from square_etl_spark.operators.joins import spatial_bin_join

    left = spark.createDataFrame([(1, 99, 0)], "lid long, lx long, ly long")
    right = spark.createDataFrame([(2, 101, 0)], "rid long, rx long, ry long")
    out = spatial_bin_join(left, right, radius=100).collect()
    assert len(out) == 1 and out[0]["dist2"] == 4

def test_spatial_bin_join_cell_cap_drops_hot_cell_keeps_rest(spark):
    """Planted hot cell: 40 left and 40 right points pile onto one
    coordinate (city-center skew; ≥1600 candidates in its cell) → the
    hot cell is dropped; an isolated pair far away still matches."""
    from square_etl_spark.operators.joins import spatial_bin_join

    left = spark.createDataFrame(
        [(i, 50, 50) for i in range(40)] + [(999, 5000, 5000)],
        "lid long, lx long, ly long",
    )
    right = spark.createDataFrame(
        [(i, 52, 52) for i in range(40)] + [(888, 5003, 5004)],
        "rid long, rx long, ry long",
    )
    uncapped = spatial_bin_join(left, right, radius=100)
    assert uncapped.count() == 40 * 40 + 1
    capped = spatial_bin_join(left, right, radius=100, cell_cap=500)
    got = {(r["lid"], r["rid"], r["dist2"]) for r in capped.collect()}
    assert got == {(999, 888, 25)}


def test_spatial_bin_join_cell_cap_plan_is_broadcast_anti(spark):
    from square_etl_spark.operators.joins import spatial_bin_join

    left = spark.createDataFrame([(1, 0, 0)], "lid long, lx long, ly long")
    right = spark.createDataFrame([(2, 1, 1)], "rid long, rx long, ry long")
    capped = spatial_bin_join(left, right, radius=10, cell_cap=5)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_interval_lookup_half_open_windows_and_prehistory_null(spark):
    import datetime as dt

    from square_etl_spark.operators.joins import interval_lookup

    T = dt.datetime
    hist = spark.createDataFrame(
        [(1, "A", T(2024, 1, 1), T(2024, 2, 1), False),
         (1, "B", T(2024, 2, 1), None, True)],
        "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(10, 1, T(2023, 12, 15)),   # pre-history → NULL
         (11, 1, T(2024, 1, 15)),    # inside v1
         (12, 1, T(2024, 2, 1)),     # exactly at the boundary → v2 (half-open)
         (13, 1, T(2024, 3, 1)),     # open current window
         (14, 2, T(2024, 1, 15))],   # unknown key → NULL, kept
        "fid long, k long, at_ts timestamp",
    )
    out = {
        r["fid"]: r["seg"]
        for r in interval_lookup(facts, hist, ["k"], "at_ts").collect()
    }
    assert out == {10: None, 11: "A", 12: "B", 13: "B", 14: None}


def test_interval_lookup_broadcasts_the_dim(spark):
    import datetime as dt

    from square_etl_spark.operators.joins import interval_lookup

    T = dt.datetime
    hist = spark.createDataFrame(
        [(1, "A", T(2024, 1, 1), None, True)],
        "k long, seg string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(10, 1, T(2024, 1, 2))], "fid long, k long, at_ts timestamp"
    )
    plan = (
        interval_lookup(facts, hist, ["k"], "at_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
