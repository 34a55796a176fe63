"""Round-14 measurement harness — reproduces the SCALING.md round-14
findings:

1. The BENCH_r13 ``text_bpe_bytes_tokens`` drift-"r" charge A/B:
   three cells, each warmed + GC'd exactly like bench.py —
     A  fresh JVM, query alone        (``bench.py --one``)
     B  shared session, run right after ``dedup_incremental_substring``
        (the r13 bench order / suspected checkpoint shadow)
     C  shared session, query alone   (r12-order-like)
   Every cell also times the CPU calibration anchor so the numbers
   are comparable across box states.  Recorded result: no cell
   reproduces the 3.87 s charge; min runs sit at the r12 level
   (1.12 s) on a box 1.7-2.4× slower by anchor than either record —
   the excursion was transient session/box state, not code.

2. Fresh-JVM lane spot-check: run any bench entry isolated via the
   same child protocol BENCH_r14 uses.

Usage:
    python tools/scaling_r14.py ab          # the three A/B cells
    python tools/scaling_r14.py one NAME    # lane spot-check

Each invocation prints one JSON line per cell; nothing is written.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
TARGET = "text_bpe_bytes_tokens"
SHADOW = "dedup_incremental_substring"


def _session(name: str):
    from square_etl_spark import get_spark

    spark = get_spark(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warm(spark, names) -> None:
    from square_etl_spark.queries import bench_queries

    q = bench_queries()
    for n in names:
        try:
            q[n](spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass


def _timed(spark, name: str, runs: int = 3) -> list[float]:
    from square_etl_spark.queries import bench_queries

    fn = bench_queries()[name]
    # ONE untimed GC before the runs, matching bench.py's protocol
    # exactly (per-run GC was reverted — it evicts the codegen cache;
    # SCALING.md round-14 finding 5): a cell measured with a different
    # GC cadence is not comparable to the BENCH record.
    spark.sparkContext._jvm.System.gc()
    raw = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        raw.append(round(time.perf_counter() - t0, 3))
    return raw


def _calib(spark) -> float:
    t0 = time.perf_counter()
    (
        spark.range(0, 20_000_000, 1, 32)
        .selectExpr("id % 997 AS k")
        .groupBy("k")
        .count()
        .count()
    )
    return round(time.perf_counter() - t0, 3)


def _cell_fresh(name: str) -> dict:
    """Cell A: delegate to bench.py's fresh-JVM lane — the SAME
    parser bench.py's parent uses (one source of truth for the
    BENCHONE child protocol)."""
    from bench import _run_isolated

    out = _run_isolated(name)
    if out is None:
        raise RuntimeError(f"fresh-JVM lane failed for {name}")
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if mode == "one":
        name = sys.argv[2]
        out = _cell_fresh(name)
        print(json.dumps({"cell": "fresh", "query": name, **out}))
        return

    # cell A — fresh JVM alone (subprocess so this session's state
    # can't pollute it)
    a = _cell_fresh(TARGET)
    print(json.dumps({"cell": "A fresh-alone", "query": TARGET,
                      "raw": a["raw"],
                      "median": statistics.median(a["raw"])}))

    # cell B — shared session, shadow predecessor first (r13 order)
    spark = _session("ab-shadow")
    _warm(spark, [SHADOW, TARGET])
    shadow_raw = _timed(spark, SHADOW)
    b_raw = _timed(spark, TARGET)
    print(json.dumps({"cell": "B after-shadow", "query": TARGET,
                      "shadow_raw": shadow_raw, "raw": b_raw,
                      "median": statistics.median(b_raw),
                      "calib_s": _calib(spark)}))
    spark.stop()

    # cell C — shared session, alone (r12-order-like)
    spark = _session("ab-alone")
    _warm(spark, [TARGET])
    c_raw = _timed(spark, TARGET)
    print(json.dumps({"cell": "C shared-alone", "query": TARGET,
                      "raw": c_raw,
                      "median": statistics.median(c_raw),
                      "calib_s": _calib(spark)}))
    spark.stop()


if __name__ == "__main__":
    main()
