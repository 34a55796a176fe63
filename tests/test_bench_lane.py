"""Pins for bench.py's fresh-JVM lane plumbing (round 14): the
parent/child protocol must tolerate Spark's \\r progress-bar noise on
the child's stdout, and ANY lane failure must degrade to the shared
session (returning None) rather than dropping the query from the
record."""

import json


def test_isolated_lane_parses_marker_through_progress_noise(monkeypatch):
    import bench

    payload = {"raw": [1.0, 2.0, 1.5], "rows": 7}

    class R:
        stdout = (
            "[Stage 1:>  (0 + 1) / 1]\rnoise\n"
            "BENCHONE " + json.dumps(payload) + "\n"
        )

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    assert bench._run_isolated("anything") == payload


def test_isolated_lane_takes_last_marker_line(monkeypatch):
    # a child that (hypothetically) printed twice: the LAST marker is
    # the final protocol line, same contract as bench.py's stdout line
    import bench

    class R:
        stdout = (
            'BENCHONE {"raw": [9.9], "rows": 1}\n'
            'BENCHONE {"raw": [1.1], "rows": 2}\n'
        )

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    assert bench._run_isolated("q") == {"raw": [1.1], "rows": 2}


def test_isolated_lane_falls_back_on_garbage_and_errors(monkeypatch):
    import bench

    class NoMarker:
        stdout = "the child crashed before printing\n"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: NoMarker())
    assert bench._run_isolated("q") is None

    class TornJson:
        stdout = "BENCHONE {not json\n"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: TornJson())
    assert bench._run_isolated("q") is None

    class EmptyRaw:
        stdout = 'BENCHONE {"raw": [], "rows": 0}\n'

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: EmptyRaw())
    assert bench._run_isolated("q") is None  # no timings = lane failure

    def boom(*a, **k):
        raise OSError("spawn failed")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    assert bench._run_isolated("q") is None


def test_prev_record_selects_newest_non_head_match(tmp_path, monkeypatch):
    """_load_prev_record skips a record whose git_head equals the
    current clean-tree HEAD (it is this round's own record), and
    falls through to the next-newest — the r10 ADVICE behavior, now
    load-bearing for lane membership too (isolation is keyed off the
    PREVIOUS round's medians)."""
    import bench

    (tmp_path / "BENCH_r08.json").write_text(json.dumps(
        {"queries": {"q": 1.0}, "calib_s": 0.4, "git_head": "old1234"}))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(
        {"queries": {"q": 2.0}, "calib_s": 0.5, "git_head": "cur5678"}))

    class Done:
        def __init__(self, out):
            self.stdout = out

    calls = {"n": 0}

    def fake_run(args, **kw):
        calls["n"] += 1
        if "rev-parse" in args:
            return Done("cur5678\n")
        return Done("")  # clean tree

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    prev, head = bench._load_prev_record(tmp_path)
    assert head == "cur5678"
    assert prev["queries"]["q"] == 1.0  # r09 skipped: same code state


def test_lane_membership_is_a_one_way_ratchet():
    """A query isolated last round stays isolated even after its clean
    isolated median drops under the threshold — leaving the lane would
    drift-compare a shared-session remeasurement (historically 2-10x
    inflated) against the isolated median and oscillate in/out with a
    spurious 'r' charge every other round."""
    import bench

    prev = {
        "queries": {"heavy": 12.0, "was_heavy": 1.2, "light": 0.4},
        "isolated": ["was_heavy"],
    }
    lane = bench._lane_membership(prev, 3.0)
    assert lane == {"heavy", "was_heavy"}
    # no record yet (round 1 of the lane): nothing isolated
    assert bench._lane_membership(None, 3.0) == set()
    # old records without the "isolated" key: threshold-only
    assert bench._lane_membership({"queries": {"q": 5.0}}, 3.0) == {"q"}


def test_lane_fallback_is_incomparable_not_a_regression():
    """A lane member remeasured in the shared session (subprocess
    failure) is classed "f", never "r"/"i" — a shared reading is
    historically 2-10x inflated vs the isolated median it would be
    compared against (r14 advice)."""
    import bench

    drift = bench._classify_drift(
        timings={"heavy": 9.0, "steady": 1.0},
        raw_runs={"heavy": [9.0, 9.1, 8.9], "steady": [1.0, 1.0, 1.0]},
        prev_queries={"heavy": 3.5, "steady": 1.0},
        box_ratios=[1.0],
        lane_fallback=["heavy"],
    )
    assert drift == {"heavy": "f", "steady": "n"}
    # the same 2.6x move WITHOUT the fallback flag is a charge
    charged = bench._classify_drift(
        timings={"heavy": 9.0},
        raw_runs={"heavy": [9.0, 9.1, 8.9]},
        prev_queries={"heavy": 3.5},
        box_ratios=[1.0],
        lane_fallback=[],
    )
    assert charged == {"heavy": "r"}


def test_lane_fallback_membership_survives_in_the_record():
    """The recorded lane membership (BENCH_DETAIL's "isolated" since
    r15; old stdout records as back-compat) is the ratchet input for
    the next round: a member that fell back this round must still be
    in it, or a transient subprocess failure silently evicts it from
    the lane forever."""
    import bench

    # simulate what main() writes to BENCH_DETAIL: ran-isolated + fell-back
    isolated_ran, lane_fallback = ["a"], ["b"]
    record = {"queries": {"a": 5.0, "b": 4.0, "c": 0.2}}
    assert bench._lane_membership(
        record, 3.0, detail_isolated=isolated_ran + lane_fallback
    ) == {"a", "b"}
    # pre-r15 records carried the list on the stdout line — still honored
    old_record = dict(record, isolated=["b"])
    assert bench._lane_membership(old_record, 3.0) == {"a", "b"}
    # an unparseable driver record (BENCH_r14 parsed:null) falls back to
    # an older prev, but the committed detail file alone keeps the lane
    assert bench._lane_membership(
        {"queries": {}}, 3.0, detail_isolated=["x"]
    ) == {"x"}


def test_release_session_blocks_drops_local_checkpoints(spark):
    """The lane's GC-free block release must see localCheckpoint'ed
    RDDs (they register as persistent) and actually drop them — the
    whole point is freeing an iterative query's checkpoint blocks
    between timed runs without a System.gc() (which would evict the
    codegen cache, SCALING r14 finding 5)."""
    import bench

    df = spark.range(0, 1000).localCheckpoint(eager=True)
    df.count()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert len(list(jmap.keys())) >= 1
    released = bench._release_session_blocks(spark)
    assert released >= 1
    assert len(list(spark.sparkContext._jsc.getPersistentRDDs().keys())) == 0


def test_record_line_never_outgrows_the_driver_tail_capture():
    """The driver keeps the last 2000 bytes of stdout; a longer record
    loses its FRONT mid-JSON and lands parsed:null (BENCH_r14).  When
    the drift map would overflow the budget it defers to
    BENCH_DETAIL.json; everything next round's bench consumes
    (queries, calib_s, scan_calib_s) survives verbatim."""
    import json

    import bench

    queries = {f"query_name_number_{i:03d}": i / 10 for i in range(46)}
    payload = {
        "metric": "bench_total_s", "value": 1.0, "unit": "sec",
        "queries": queries, "sf": 0.1, "calib_s": 0.4,
        "calib_ratio": 1.0, "scan_calib_s": 0.2, "scan_calib_ratio": 1.0,
        "isolated_n": 12,
        "drift": {n: "r" for n in list(queries)[:20]},
        "git_head": "abc1234",
    }
    line = bench._bounded_record_line(dict(payload))
    assert len(line) <= bench._RECORD_LINE_BUDGET
    rec = json.loads(line)
    assert rec["queries"] == queries and rec["calib_s"] == 0.4
    assert rec["drift"] == "see BENCH_DETAIL.json"
    # a small record keeps its drift map inline
    small = dict(payload, queries={"q": 1.0}, drift={"q": "r"})
    assert json.loads(bench._bounded_record_line(small))["drift"] == {"q": "r"}


def test_gated_detail_depoisons_the_drift_baseline():
    """r15 verdict item 2: the driver's record can be taken under
    band-selective host load (BENCH_r15: 2.3x inflated on the isolated
    band) — when the committed BENCH_DETAIL is an acceptance-gated
    snapshot of the SAME tree (matching git_head), the baseline is the
    per-query min of the two, and both anchors take the min too."""
    import bench

    prev = {
        "queries": {"slow_on_bad_box": 32.5, "steady": 1.0,
                    "not_in_detail": 2.0},
        "calib_s": 0.489, "scan_calib_s": 0.45, "git_head": "abc1234",
    }
    detail = {
        "git_head": "abc1234",
        "raw_runs": {"slow_on_bad_box": [14.1, 13.9, 14.0],
                     "steady": [1.2, 1.2, 1.2]},
        "calib_raw": [0.31, 0.30, 0.31], "scan_calib_raw": [0.24, 0.24, 0.25],
    }
    merged = bench._merge_gated_detail(prev, detail)
    assert merged["queries"]["slow_on_bad_box"] == 14.0  # gated median wins
    assert merged["queries"]["steady"] == 1.0  # record already smaller
    assert merged["queries"]["not_in_detail"] == 2.0  # untouched
    assert merged["calib_s"] == 0.31 and merged["scan_calib_s"] == 0.24
    assert merged["baseline"] == "min(record, gated_detail)"
    # a different tree's detail NEVER merges — it measures other code
    other = dict(detail, git_head="fff9999")
    assert bench._merge_gated_detail(prev, other) == prev
    # an untagged (pre-r16) detail never merges either
    untagged = {k: v for k, v in detail.items() if k != "git_head"}
    assert bench._merge_gated_detail(prev, untagged) == prev


def test_lane_ratchet_survives_unparseable_prev():
    """r15 advice: with every BENCH_r*.json unparseable (prev=None),
    the committed detail file's membership must still carry the
    one-way ratchet — the old early-return dropped it."""
    import bench

    assert bench._lane_membership(None, 3.0, detail_isolated=["x", "y"]) == {
        "x", "y"
    }
    assert bench._lane_membership(None, 3.0) == set()


def test_prev_round_fallback_is_incomparable_one_more_round():
    """r15 advice: a query that fell back LAST round left its inflated
    shared-session timing in the record — this round's clean isolated
    median must not be compared against it (spurious "i"); it classes
    "f" for exactly one round."""
    import bench

    drift = bench._classify_drift(
        timings={"recovered": 3.5, "steady": 1.0},
        raw_runs={"recovered": [3.5, 3.6, 3.4], "steady": [1.0, 1.0, 1.0]},
        prev_queries={"recovered": 9.0, "steady": 1.0},  # 9.0 = inflated
        box_ratios=[1.0],
        lane_fallback=[],
        prev_fallback=["recovered"],
    )
    assert drift == {"recovered": "f", "steady": "n"}
    # round after THAT: clean vs clean, normal classes again
    drift2 = bench._classify_drift(
        timings={"recovered": 3.5},
        raw_runs={"recovered": [3.5, 3.6, 3.4]},
        prev_queries={"recovered": 3.5},
        box_ratios=[1.0],
        lane_fallback=[],
        prev_fallback=[],
    )
    assert drift2 == {"recovered": "n"}
    # a prev-fallback name NEW to the record still classes "+"
    drift3 = bench._classify_drift(
        timings={"brand_new": 1.0},
        raw_runs={"brand_new": [1.0]},
        prev_queries={},
        box_ratios=[1.0],
        lane_fallback=[],
        prev_fallback=["brand_new"],
    )
    assert drift3 == {"brand_new": "+"}


def test_record_line_overflow_is_loud_not_silent(capsys):
    """r15 advice: the queries map alone will outgrow the budget ~8
    benched queries from now — after the drift elision the line first
    drops to 2-decimal timings, and if it STILL overflows a stderr
    warning fires instead of a silent BENCH_r14-style parsed:null."""
    import json

    import bench

    # enough long-named queries that even 2dp rounding can't save it
    queries = {f"very_long_query_name_padding_{i:04d}": i + 0.123
               for i in range(80)}
    payload = {"metric": "bench_total_s", "value": 1.0, "unit": "sec",
               "queries": queries, "sf": 0.1, "calib_s": 0.4,
               "drift": {}, "git_head": "abc1234"}
    line = bench._bounded_record_line(dict(payload))
    assert "exceeds" in capsys.readouterr().err  # loud
    rec = json.loads(line)  # still valid JSON end-to-end
    assert rec["queries"][f"very_long_query_name_padding_0000"] == 0.12
    # moderate overflow: 2dp rounding alone rescues it, no warning
    mid = dict(payload, queries={f"q_{i:03d}": i + 0.1234 for i in range(46)},
               drift={f"q_{i:03d}": "r" for i in range(20)})
    line2 = bench._bounded_record_line(mid)
    assert len(line2) <= bench._RECORD_LINE_BUDGET
    assert capsys.readouterr().err == ""  # no warning needed


def test_acceptance_gate_evaluation():
    """tools/bench_accept.py automates the r15 committed-snapshot
    recipe (r15 verdict item 3): anchors clean, every isolated spread
    <= 1.5, no benched query > 1.45x its baseline median.  The gate
    function is pure so the protocol is pinnable."""
    import importlib

    ba = importlib.import_module("tools.bench_accept")

    detail = {
        "isolated": ["heavy", "fellback"],
        "lane_fallback": ["fellback"],
        "raw_runs": {
            "heavy": [10.0, 11.0, 10.5],      # spread 1.1
            "fellback": [9.0, 30.0, 28.0],    # inflated shared — skipped
            "steady": [1.0, 1.0, 1.1],
            "tiny": [0.30, 0.31, 0.30],       # 1.5x of 0.2 but under floor
        },
    }
    record = {"calib_ratio": 1.1, "scan_calib_ratio": 0.9}
    prev = {"queries": {"heavy": 10.0, "steady": 1.0, "tiny": 0.2,
                        "fellback": 8.0}}
    rep = ba._evaluate(detail, record, prev)
    assert rep["passed"] and rep["anchors_ok"] and rep["spreads_ok"]
    assert rep["band_outliers"] == {}  # fallback + abs-floor both skipped

    # gate 1: a slow anchor rejects
    bad_anchor = ba._evaluate(detail, {"calib_ratio": 1.4}, prev)
    assert not bad_anchor["anchors_ok"] and not bad_anchor["passed"]
    # missing ratios (first round / no prev) never reject
    assert ba._evaluate(detail, {}, prev)["anchors_ok"]

    # gate 2: an isolated spread > 1.5 rejects (fallbacks don't count)
    wide = dict(detail, raw_runs=dict(
        detail["raw_runs"], heavy=[10.0, 17.0, 10.5]))
    rep2 = ba._evaluate(wide, record, prev)
    assert not rep2["spreads_ok"] and rep2["worst_isolated_spread"] == 1.7

    # gate 3: a real band outlier rejects
    slow = dict(detail, raw_runs=dict(
        detail["raw_runs"], steady=[1.8, 1.9, 1.8]))
    rep3 = ba._evaluate(slow, record, prev)
    assert not rep3["outliers_ok"] and "steady" in rep3["band_outliers"]

    # no baseline: gate 3 is a no-op, others still gate
    assert ba._evaluate(detail, record, None)["passed"]


def test_gated_archive_keeps_the_pairing_after_overwrite(tmp_path):
    """The live BENCH_DETAIL is overwritten by every newer run, so the
    record<->gated pairing must survive via the per-tree archive
    BENCH_DETAIL_<head>.json that bench_accept writes on acceptance —
    and BOTH sources are consulted (min-merged) because the live file
    can itself be the driver's own degraded-box run, tag-matching its
    record while the honest gated archive sits beside it."""
    import bench

    archived = {"git_head": "old1234",
                "raw_runs": {"q": [1.0, 1.0, 1.0]},
                "calib_raw": [0.3, 0.3, 0.3]}
    (tmp_path / "BENCH_DETAIL_old1234.json").write_text(json.dumps(archived))
    live = {"git_head": "new5678", "raw_runs": {"q": [2.0]}}

    # live detail measures another tree -> the archive is the pair
    assert bench._gated_candidates(tmp_path, "old1234", live) == [archived]
    # live detail tag-matches -> BOTH contribute (min-merge downstream)
    live_match = {"git_head": "old1234", "raw_runs": {"q": [3.0, 3.0, 3.0]}}
    assert bench._gated_candidates(tmp_path, "old1234", live_match) == [
        live_match, archived]
    # no tag / no archive -> no pairing (never guess)
    assert bench._gated_candidates(tmp_path, None, live) == []
    assert bench._gated_candidates(tmp_path, "gone0000", live) == []
    # an archive whose tag disagrees with its filename is ignored
    (tmp_path / "BENCH_DETAIL_bad99.json").write_text(
        json.dumps({"git_head": "other"}))
    assert bench._gated_candidates(tmp_path, "bad99", live) == []


def test_degraded_live_detail_cannot_shadow_the_gated_archive(tmp_path):
    """r17 shape of the poisoning: the driver's round-marker commit
    leaves ITS OWN (possibly degraded) run as the live BENCH_DETAIL,
    tag-matching its record — the honest gated archive for the same
    tree must still pull the baseline down via the per-query min."""
    import json as _json

    import bench

    (tmp_path / "BENCH_r16.json").write_text(_json.dumps(
        {"queries": {"q": 30.0}, "calib_s": 0.5, "git_head": "head16"}))
    # driver's own degraded detail (same run as the record)
    live = {"git_head": "head16", "raw_runs": {"q": [30.0, 31.0, 29.5]},
            "calib_raw": [0.5, 0.5, 0.5]}
    # builder's gated archive of the same tree, taken on a quiet box
    (tmp_path / "BENCH_DETAIL_head16.json").write_text(_json.dumps(
        {"git_head": "head16", "raw_runs": {"q": [14.0, 14.1, 13.9]},
         "calib_raw": [0.3, 0.3, 0.3]}))

    class Done:
        def __init__(self, out):
            self.stdout = out

    import unittest.mock as um
    with um.patch.object(bench.subprocess, "run",
                         lambda args, **kw: Done("head17\n"
                                                 if "rev-parse" in args
                                                 else "")):
        prev, _ = bench._load_prev_record(tmp_path, live)
    assert prev["queries"]["q"] == 14.0
    assert prev["calib_s"] == 0.3
