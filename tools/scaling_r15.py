"""Round-15 measurement harness — reproduces the SCALING.md round-15
findings:

1. ``hier-ab`` — the r14 watch item on ``hierarchy_rollup_parts``
   (uniform 1.11-1.15 s in BENCH_r14 vs 0.76 s in r13, untouched
   code): a two-cell worktree A/B, each cell a fresh subprocess
   running the query from one tree (the r13-record tree vs the
   current tree) with the shared-lane protocol (sf0.001 warmup, CPU
   calib, one untimed GC, 5 timed runs at sf0.1).  Recorded result:
   the r13 TREE reads min 1.99 s on the round-15 box — worse than the
   current tree's min 1.28 s — so the elevation is environmental and
   the code is exonerated (the current tree is ~1.6× FASTER than the
   r13 code in the same session shape).

2. ``spread NAME`` — the fresh-JVM-lane spread mechanism (r14 verdict
   item 2): time one lane entry under the OLD lane protocol (sf0.001
   warmup only, no block release) and under the NEW r15 protocol
   (full-sf untimed warmup run + GC-free release of all persistent /
   localCheckpoint blocks around every timed run,
   ``bench._release_session_blocks``).  Recorded result for
   ``dedup_cluster_assignment``: raw spread 2.07× → 1.14× and the
   median drops to steady state (5.89 → 3.13 s on the same box);
   ``dedup_jaccard_prefix`` 1.56× (r14 record) → 1.20×.  No GC is
   involved, so the codegen cache stays warm (the constraint that
   killed the per-run-GC variant, SCALING round-14 finding 5).  The
   same release was then extended to the SHARED lane after two
   ascending-raw "r" charges exonerated in isolation
   (SCALING round-15 addendum), validated by a before/after FULL
   bench per-query diff on the same tree.

Usage:
    python tools/scaling_r15.py hier-ab            # two worktree cells
    python tools/scaling_r15.py spread NAME [old|new]

``hier-ab`` expects the r13-record tree checked out at /tmp/wt-r13
(``git worktree add /tmp/wt-r13 1797d56``).  Each invocation prints
one JSON line per cell; nothing is written.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
R13_TREE = "/tmp/wt-r13"
HIER = "hierarchy_rollup_parts"

# child body for hier-ab: argv[1] = tree to import the engine from
_HIER_CHILD = r"""
import sys, time
sys.path.insert(0, sys.argv[1])
from square_etl_spark.session import get_spark
from square_etl_spark.queries import queries as Q
spark = get_spark("ab-hier")
spark.sparkContext.setLogLevel("ERROR")
fn = Q()["hierarchy_rollup_parts"]
fn(spark, "/root/testdata/sf0.001").count()
def calib():
    t0 = time.perf_counter()
    (spark.range(0, 20_000_000, 1, 32).selectExpr("id % 997 AS k")
     .groupBy("k").count().count())
    return round(time.perf_counter() - t0, 3)
calib()
c = [calib() for _ in range(3)]
spark.sparkContext._jvm.System.gc()
raw = []
for _ in range(5):
    t0 = time.perf_counter()
    fn(spark, sys.argv[2]).count()
    raw.append(round(time.perf_counter() - t0, 3))
import json
print("ABCELL " + json.dumps({"tree": sys.argv[1], "calib": c,
                              "raw": raw, "min": min(raw)}))
"""


def _run_cell(tree: str) -> dict | None:
    out = subprocess.run(
        [sys.executable, "-c", _HIER_CHILD, tree, SF_DIR],
        capture_output=True, text=True, timeout=900,
    ).stdout
    for line in reversed(out.replace("\r", "\n").splitlines()):
        if line.startswith("ABCELL "):
            return json.loads(line[len("ABCELL "):])
    return None


def hier_ab() -> None:
    if not os.path.isdir(R13_TREE):
        sys.exit(f"checkout the r13 record tree first: "
                 f"git worktree add {R13_TREE} 1797d56")
    for tree in (R13_TREE, REPO):
        print(json.dumps(_run_cell(tree)))


def spread(name: str, mode: str) -> None:
    """One lane entry under the old (no release) or new (full-sf
    warmup + block release) protocol, in THIS process — run it via a
    fresh ``python tools/scaling_r15.py spread NAME MODE`` per cell so
    cells do not share a JVM."""
    from square_etl_spark import get_spark
    from square_etl_spark.queries import bench_queries, bench_setup

    import bench

    spark = get_spark(f"spread-{name}-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = bench_queries()[name]
    try:
        fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    bench_setup(spark, SF_DIR)
    spark.sparkContext._jvm.System.gc()
    if mode == "new":
        try:
            fn(spark, SF_DIR).count()
        except Exception:
            pass
        bench._release_session_blocks(spark)
    raw = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        raw.append(round(time.perf_counter() - t0, 3))
        if mode == "new":
            bench._release_session_blocks(spark)
    print(json.dumps({"name": name, "mode": mode, "raw": raw,
                      "median": round(statistics.median(raw), 3),
                      "spread": round(max(raw) / min(raw), 2)}))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "hier-ab"
    if mode == "hier-ab":
        hier_ab()
    elif mode == "spread":
        spread(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "new")
    else:
        sys.exit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
