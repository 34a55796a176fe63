"""Round-13 A/B: are the BENCH_r12 drift-"r" rows (t2_tumbling_hourly
2.11x, dedup_exact 1.89x vs r11) engine regressions or bench-session
interference?

Neither query's code changed in r12; the bench session DID change —
38 benched queries (vs 33) in ONE resident JVM, each registry query
compiled/executed ~4x (sf0.001 warmup + 3 timed runs), ~2,500 stages
before the session ends.  Two suspects for a session-level slowdown
that standalone runs would not show:

  (a) Spark UI / AppStatusListener state: local-mode sessions keep an
      in-memory ElementTrackingStore fed by every task event; at
      thousands of stages the listener-bus work grows and steals CPU
      from the 32 local executor threads (driver == executors here).
  (b) accumulated JVM heap/codegen cache pressure — partially
      mitigated by the existing per-query System.gc().

Experiment (each cell a FRESH subprocess):

  standalone     — warm the target at sf0.001, GC, median-of-5 at
                   sf0.1.  == "the query by itself".
  polluted       — same, but first replay a bench-shaped session
                   history: run N_POLLUTE heavyweight registry queries
                   once each at sf0.1 (plus the standard warmup), THEN
                   time the target.  == "the query at the END of a
                   38-query bench session".
  polluted_no_ui — polluted with spark.ui.enabled=false, isolating
                   suspect (a).

If standalone ~= r11 and polluted ~= r12, the drift is session
interference (bench-harness, not engine); whichever knob restores
polluted → standalone is the bench.py fix.

Findings → SCALING.md 'Round-13 sweeps'.

Usage: python tools/scaling_r13.py                  # full grid
       python tools/scaling_r13.py --point <mode> <query>
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TARGETS = ["t2_tumbling_hourly", "dedup_exact"]
MODES = ["standalone", "polluted", "polluted_no_ui"]
SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
RUNS = 5
#: heavyweights replayed before timing in the polluted modes — the
#: five queries newly benched in r12 plus three long-standing heavies,
#: approximating the stage/listener volume of a full bench session.
POLLUTERS = [
    "pipeline_classified_mix",
    "dedup_substring_exact",
    "dedup_decontaminate_fuzzy",
    "mix_doremi_waterfill",
    "classify_nb_confusion",
    "dedup_semantic",
    "dedup_jaccard_prefix",
    "dedup_cluster_assignment",
]


def _run_point(mode: str, query: str) -> None:
    if mode == "polluted_no_ui":
        # must be set before the JVM starts — getOrCreate conf is
        # ignored for spark.ui.* once the context exists
        os.environ["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
            {"spark.ui.enabled": "false"}
        )
    from square_etl_spark import get_spark
    from square_etl_spark.queries import queries

    spark = get_spark(f"r13-{mode}-{query}")
    if mode == "polluted_no_ui":
        assert spark.conf.get("spark.ui.enabled", "true") == "false", (
            "spark.ui.enabled must land pre-JVM via SPARK_GRAFT_EXTRA_CONF"
        )
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()
    fn = reg[query]

    if mode in ("polluted", "polluted_no_ui"):
        # replay a bench-shaped history: sf0.001 warmup for each
        # polluter + one sf0.1 execution (bench does warmup + 3 timed;
        # one full-sf run is enough stage volume to reproduce r12's
        # in-session position for the light targets).
        for pname in POLLUTERS:
            pfn = reg[pname]
            try:
                pfn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
                pfn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # polluters are scenery, not the measurement
                print(f"pollute {pname} failed: {exc}", file=sys.stderr)

    # target: warmup at sf0.001 (bench parity), GC, timed runs
    fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
    spark.sparkContext._jvm.System.gc()
    raw = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        raw.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"mode": mode, "query": query, "raw": raw,
                      "median": round(statistics.median(raw), 3)}))


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--point":
        _run_point(sys.argv[2], sys.argv[3])
        return
    here = Path(__file__).resolve()
    results = []
    for query in TARGETS:
        for mode in MODES:
            out = subprocess.run(
                [sys.executable, str(here), "--point", mode, query],
                capture_output=True, text=True, timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                rec = {"mode": mode, "query": query, "error": out.stderr[-500:]}
            print(json.dumps(rec))
            results.append(rec)
    Path(here.parent.parent / "SCALING_r13_ab.json").write_text(
        json.dumps(results, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
