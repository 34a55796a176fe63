"""Scaling measurement for the round-7 operator families: the
partitioned two-phase rank (dense_index / ntile_assign — the
global-window replacements), pointer-doubling forest closure vs the
naive O(depth) chase, the SCD2 interval lookup, and TWAP.

Synthesizes keyed relations at 1-16x the sf0.1 row counts and times
each operator end-to-end (count action; thunks so eager checkpoint
work lands inside the timer).  The interesting questions:

- does the two-phase rank stay flat-per-row as rows grow (it must —
  the old global window was the single-partition cliff)?
- does pointer doubling's round count stay log(depth) while the
  chase grows linearly (measured on a deep planted chain)?
- does the broadcast interval lookup stay scan-dominated as facts
  grow with a fixed-size dimension?

Usage: python tools/scaling_r07.py [sizes_csv]
  (default "100000,1000000,4000000" rows)
Prints one JSON line per measurement.

Per-point PROCESS isolation (r07 verdict item 5): the r07 in-sequence
sweep showed JVM-state bleed between points even with GC between them
(TWAP at 4M rows: 27.2 s in-sequence vs 1.1-1.3 s standalone —
checkpoint blocks and codegen caches from earlier points distort later
ones).  The driver loop therefore re-execs THIS script with
``--point <n> <op>`` for every (size, op) pair: each measurement gets
a fresh interpreter + JVM, so in-sequence numbers ≈ standalone numbers
by construction.  ``--point`` mode is also the single-measurement CLI.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OPS = [
    "dense_index",
    "ntile_assign(100)",
    "ancestor_closure(d=7)",
    "interval_lookup(10k-dim)",
    "time_weighted_avg",
]


def timed(name: str, n: int, thunk, spark=None):
    """Steady-state measurement in a fresh process: one untimed warmup
    run pays JVM/codegen first-job costs (the same reasoning as
    bench.py's warmup — a resident engine delivers steady-state
    throughput), then an untimed GC, then the timed run.  Without the
    warmup, per-point process isolation trades JVM-state bleed for
    3-7 s of cold-start INSIDE the timer (measured r08)."""
    thunk()  # warmup: codegen + broadcast machinery, outside the timer
    if spark is not None:
        spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"op": name, "n": n, "sec": dt, "rows": rows}),
          flush=True)


def run_point(n: int, op: str) -> None:
    """One measurement in THIS process (invoked in a fresh subprocess
    per point by the driver loop)."""
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.operators.graph import (
        ancestor_closure,
        dense_index,
    )
    from square_etl_spark.operators.joins import interval_lookup
    from square_etl_spark.operators.sampling import ntile_assign
    from square_etl_spark.operators.windows import time_weighted_avg

    spark = get_spark("scaling-point")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        (F.col("id") * 37 % (10 * n)).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    if op == "dense_index":
        timed(op, n,
              lambda: dense_index(base.select("k").distinct(), "k").count(),
              spark)
    elif op == "ntile_assign(100)":
        timed(op, n, lambda: ntile_assign(base, "v", "k", 100).count(), spark)
    elif op == "ancestor_closure(d=7)":
        # forest: planted chain of depth 64 under node 0 + wide bushes
        parents = spark.range(n).select(
            F.col("id").alias("node"),
            F.when(F.col("id") == 0, F.lit(0))
            .when(F.col("id") < 64, F.col("id") - 1)  # depth-64 chain
            .otherwise(F.col("id") % 64)              # bushes onto the chain
            .alias("parent"),
        )
        timed(op, n, lambda: ancestor_closure(parents, doublings=7).count(),
              spark)
    elif op == "interval_lookup(10k-dim)":
        # SCD2 lookup: fixed 10k-key x 3-version dim, n facts
        dim = spark.range(10_000).select(
            F.col("id").alias("k"),
            F.explode(
                F.array(F.lit(0), F.lit(100), F.lit(200))
            ).alias("vf"),
        ).select(
            "k",
            F.timestamp_seconds(F.lit(1700000000) + F.col("vf") * 86400)
            .alias("valid_from"),
            F.when(F.col("vf") < 200,
                   F.timestamp_seconds(
                       F.lit(1700000000) + (F.col("vf") + 100) * 86400))
            .alias("valid_to"),
            F.concat(F.lit("seg"), F.col("vf")).alias("seg"),
        )
        facts = spark.range(n).select(
            F.col("id").alias("fid"),
            (F.col("id") % 10_000).alias("k"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") % 290) * 86400
            ).alias("at_ts"),
        )
        timed(op, n,
              lambda: interval_lookup(facts, dim, ["k"], "at_ts").count(),
              spark)
    elif op == "time_weighted_avg":
        ev = spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % (n // 66 or 1)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 7 % 2592000
            ).alias("ts"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
        timed(op, n,
              lambda: time_weighted_avg(
                  ev, "ts", ["user_id"], "value",
                  tiebreak_cols=["event_id"]).count(),
              spark)
    else:
        raise SystemExit(f"unknown op: {op}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else
                  "100000,1000000,4000000").split(",")
    ]
    me = str(Path(__file__).resolve())
    for n in sizes:
        for op in OPS:
            # fresh interpreter + JVM per point — no state bleed
            r = subprocess.run(
                [sys.executable, me, "--point", str(n), op],
                capture_output=True, text=True,
            )
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if r.returncode != 0:
                print(json.dumps(
                    {"op": op, "n": n,
                     "error": (r.stderr or "")[-400:]}), flush=True)


if __name__ == "__main__":
    main()


def cap_guard_demo(spark, n: int = 1_000_000, hot: int = 20_000) -> None:
    """Planted-hot-block wall-time evidence for the r07 cap guards:
    `hot` left rows and `hot` right rows share one blocking key
    (hot² candidate pairs — 400M at the default), the rest spread
    thinly.  The capped run anti-joins the block away BEFORE the
    candidate join; the uncapped run pays the full pair
    materialization + levenshtein.  Run separately from main() so
    the headline sweep stays comparable round-over-round:
    python -c "import sys; sys.path.insert(0,'.'); \
      from tools.scaling_r07 import cap_guard_demo; \
      from square_etl_spark import get_spark; cap_guard_demo(get_spark('cap'))"
    """
    import time as _t

    from square_etl_spark.operators.joins import fuzzy_join_blocked

    left = spark.range(n).selectExpr(
        f"CASE WHEN id < {hot} THEN 'HOTBLOCK' "
        "ELSE concat('name-', id, '-', id % 9973) END AS name"
    )
    right = spark.range(n).selectExpr(
        f"CASE WHEN id < {hot} THEN 'HOTBLOCK' "
        "ELSE concat('namq-', id, '-', id % 9973) END AS name"
    )
    # block on the LAST dash segment (id mod 9973 → ~100 rows/side per
    # block, product ~10⁴ ≪ cap — normal blocks all survive); the
    # planted 'HOTBLOCK' names have no dash and form their own block
    blk = lambda c: F.substring_index(c, "-", -1)  # noqa: E731
    for label, cap in (("capped", 1_000_000), ("uncapped", None)):
        t0 = _t.perf_counter()
        out = fuzzy_join_blocked(
            left, right, "name", "name", block=blk, max_dist=2,
            block_cap=cap,
        )
        c = out.count()
        print(json.dumps({
            "op": f"fuzzy_join {label}", "n": n, "hot": hot,
            "sec": round(_t.perf_counter() - t0, 2), "rows": c,
        }))
