"""Round-9 scaling evidence (b): INCREMENTAL DSIR is
batch-proportional, full recompute is corpus-proportional.

The claim under test is the one `dsir_incremental_counts` advertises:
with a growing accumulated corpus and a FIXED 5 000-doc ingest batch,
scoring the batch against the corpus-so-far distribution costs

- full recompute: re-derive the raw bucket counts from EVERY document
  ever ingested (corpus text rescanned each batch), then score;
- state probe:    read the stored ≤4096-row (bucket, count) state,
  fold the batch's own counts in (batch-sized scan), then score.

Both paths produce IDENTICAL scores (count-sum monoid — pinned by the
shared oracle of `dsir_incremental_counts` and
test_sampling.test_dsir_fold_counts_equals_one_shot_any_split); what
this sweep measures is the COST gap and its growth.  The state write
is the one-off ingest cost either way — both variants pay it outside
the timer; the timed op is the recurring per-batch scoring.

Methodology matches tools/scaling_r08/r09.py: each (size, op) point
runs in a FRESH subprocess (no JVM-state bleed) with one untimed
warmup.

Usage: python tools/scaling_r09b.py                # full sweep
       python tools/scaling_r09b.py --point <n> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

OPS = ["dsir_full_recompute", "dsir_state_probe"]
SIZES = [40_000, 160_000, 640_000]  # accumulated corpus docs
BATCH = 5_000
BUCKETS = 4096


def timed(name: str, n: int, thunk, spark):
    thunk()  # warmup (steady-state, not cold-start)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    print(json.dumps({
        "op": name, "n": n, "sec": round(time.perf_counter() - t0, 3),
        "rows": rows,
    }), flush=True)


def run_point(n: int, op: str) -> None:
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.operators.sampling import (
        dsir_feature_counts,
        dsir_fold_counts,
        dsir_logweights,
    )

    spark = get_spark("scaling-r09b")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="scaling_r09b_")

    from scaling_r08 import _corpus

    # corpus-so-far = n docs; the fixed ingest batch is spread evenly
    # through the id range (same discipline as the LSH probe sweep)
    step = max(n // BATCH, 1)
    docs = _corpus(spark, n)
    corpus = docs.filter(F.col("doc_id") % step != 0)
    batch = docs.filter(F.col("doc_id") % step == 0).persist()
    batch.count()
    # fixed target sample: a 500-doc slice standing in for the target
    # domain (its counts are a one-off cost in BOTH variants)
    target = docs.filter(F.col("doc_id") < 500).persist()
    target.count()

    # materialize the accumulated corpus: text parquet (what the full
    # recompute must rescan) + the bounded count state (what the
    # incremental path reads instead)
    corpus.write.mode("overwrite").parquet(f"{base}/corpus")
    dsir_feature_counts(corpus, "text", n=2, buckets=BUCKETS).write.mode(
        "overwrite"
    ).parquet(f"{base}/state")
    corpus_r = spark.read.parquet(f"{base}/corpus")
    state_r = spark.read.parquet(f"{base}/state")

    if op == "dsir_full_recompute":
        def full() -> int:
            counts = dsir_feature_counts(
                corpus_r.select("doc_id", "text").unionByName(
                    batch.select("doc_id", "text")
                ),
                "text", n=2, buckets=BUCKETS,
            )
            return dsir_logweights(
                batch, target, n=2, buckets=BUCKETS, raw_counts=counts
            ).count()

        timed(op, n, full, spark)
        return

    if op == "dsir_state_probe":
        def probe() -> int:
            counts = dsir_fold_counts(
                state_r,
                dsir_feature_counts(batch, "text", n=2, buckets=BUCKETS),
            )
            return dsir_logweights(
                batch, target, n=2, buckets=BUCKETS, raw_counts=counts
            ).count()

        timed(op, n, probe, spark)
        return

    raise SystemExit(f"unknown op: {op}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    me = str(Path(__file__).resolve())
    for n in SIZES:
        for op in OPS:
            r = subprocess.run(
                [sys.executable, me, "--point", str(n), op],
                capture_output=True, text=True,
            )
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if r.returncode != 0:
                print(json.dumps(
                    {"op": op, "n": n, "error": (r.stderr or "")[-400:]}),
                    flush=True)


if __name__ == "__main__":
    main()
