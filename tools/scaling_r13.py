"""Round-13 measurement tools — reproduce SCALING.md round-13.

Finding 1 (drift exoneration): BENCH_r12 charged t2_tumbling_hourly
(2.11x) and dedup_exact (1.89x) as engine regressions.  The decisive
experiment is a WORKTREE A/B: check out the two records' trees and
run the identical fresh-subprocess runner against each on the same
box, minutes apart —

    git worktree add /tmp/wt_r11 <r11-marker>
    git worktree add /tmp/wt_r12 <r12-marker>
    python tools/scaling_r13.py --ab /tmp/wt_r11 /tmp/wt_r12 \
        t2_tumbling_hourly dedup_exact

Each cell: sf0.001 warmup -> one untimed sf0.1 run -> JVM GC ->
median-of-5 timed sf0.1 runs -> CPU-calib median-of-3.  Result
(recorded in SCALING.md): raw ratios 1.15x / 1.02x, calib-normalized
parity -> the drift was the box's scan path, which the CPU anchor
never sees.  bench.py gained a scan anchor + abs floor + min-run
exoneration off the back of this.

Finding 2 (simhash): `--simhash` times the three signature shapes at
sf0.1 — the one-expression column form, the hoisted-array column form
(both ~26 s: HOFs are interpreted, hoisting is not the fix), and the
relational explode+groupBy shape (~1.2 s) — and verifies the
relational signatures are bit-equal to the column spec.

Usage:
    python tools/scaling_r13.py --ab <treeA> <treeB> <query> [query...]
    python tools/scaling_r13.py --point <tree> <query>   # one cell
    python tools/scaling_r13.py --simhash
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
RUNS = 5


def _run_point(tree: str, query: str) -> None:
    sys.path.insert(0, tree)
    from square_etl_spark import get_spark
    from square_etl_spark.queries import queries

    spark = get_spark(f"r13-ab-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = queries()[query]
    fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
    fn(spark, SF_DIR).count()  # page-cache/broadcast warm
    spark.sparkContext._jvm.System.gc()
    raw = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        raw.append(round(time.perf_counter() - t0, 3))

    def calib() -> float:
        t0 = time.perf_counter()
        (spark.range(0, 20_000_000, 1, 32).selectExpr("id % 997 AS k")
         .groupBy("k").count().count())
        return round(time.perf_counter() - t0, 3)

    calib()
    c = [calib() for _ in range(3)]
    print(json.dumps({
        "tree": tree, "query": query, "raw": raw,
        "median": round(statistics.median(raw), 3),
        "calib": statistics.median(c),
    }))


def _ab(trees: list[str], queries: list[str]) -> None:
    here = Path(__file__).resolve()
    for tree in trees:
        for q in queries:
            out = subprocess.run(
                [sys.executable, str(here), "--point", tree, q],
                capture_output=True, text=True, timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            print(line or f"FAILED {tree} {q}: {out.stderr[-300:]}")


def _simhash() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.io import load_table
    from square_etl_spark.operators.dedup import (
        simhash64,
        simhash64_from_hashes,
        simhash_signatures,
        simhash_word_hashes,
    )

    spark = get_spark("r13-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")

    def t(label, df):
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.perf_counter() - t0:.2f}s")

    t("one-expression column form",
      d.select("doc_id", simhash64("text").alias("sig")))
    t("hoisted-array column form",
      d.select("doc_id", simhash_word_hashes("text").alias("__hw"))
      .select("doc_id", simhash64_from_hashes("__hw").alias("sig")))
    t("relational explode+groupBy", simhash_signatures(d))
    mism = (
        d.select("doc_id", simhash64("text").alias("sig")).alias("o")
        .join(simhash_signatures(d).alias("n"), "doc_id")
        .filter(F.expr("o.sig <> n.sig")).count()
    )
    print(f"bit-equality: {mism} mismatches")


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--point":
        _run_point(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 5 and sys.argv[1] == "--ab":
        _ab(sys.argv[2:4], sys.argv[4:])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--simhash":
        _simhash()
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
