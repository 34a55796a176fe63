"""Round-12 scaling evidence: the embedding-LSH hot-bucket cap shape
(r11 verdict item 1) under a PLANTED hot bucket.

Corpus: n_clean random unit vectors (xxhash64-derived, ~uniform over
the 2^bits sign-LSH buckets) plus `n_hot` IDENTICAL vectors — the
embedding-space analogue of the r11 viral banner: boilerplate docs
whose embeddings coincide, so every copy lands in the SAME
(table, bucket) of every hash table.  With bucket_cap set, both cap
shapes DROP the hot bucket, so the output is identical — the A/B
isolates the cost of *counting* the bucket:

  emb_cap_window — the pre-r12 shape: count() OVER (PARTITION BY
                   __tbl, __bucket) shuffles every hot row to ONE
                   reducer to learn the count it will then discard.
  emb_cap_agg    — embedding_cosine_pairs_bucketed as shipped:
                   groupBy count (map-side partial per input
                   partition) → broadcast anti join on the hot list.

Expected: the aggregate shape flat in n_hot (the hot key collapses
map-side to one partial row per partition); the window shape's
single hot task linear in n_hot.

Methodology matches tools/scaling_r08..r11.py: each point runs in a
FRESH subprocess with one untimed warmup and a JVM GC before the
timed run.  Findings → SCALING.md 'Round-12 sweeps'.

Usage: python tools/scaling_r12.py                 # full sweep
       python tools/scaling_r12.py --point <n_hot> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CLEAN = 20_000
HOT_SIZES = [100_000, 400_000, 1_600_000]
OPS = ["emb_cap_window", "emb_cap_agg"]
DIM = 64          # production embedding width — the hot row's payload
BITS = 8          # 256 buckets/table: clean buckets ~78 rows
N_TABLES = 2
CAP = 500         # clean buckets survive; the planted bucket never does
THRESHOLD = 0.99  # keep the verify output tiny — cost is candidate gen


def _corpus(spark, n_hot: int):
    """n_clean pseudo-random vectors + n_hot copies of ONE vector."""
    from pyspark.sql import functions as F

    clean = spark.range(N_CLEAN).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000
            ).cast("double") / 1000.0,
        ).alias("embedding"),
    )
    hot = spark.range(N_CLEAN, N_CLEAN + n_hot).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i + 1)) for i in range(DIM)]).alias("embedding"),
    )
    return clean.unionByName(hot).repartition(32)


def _pairs_with_window_cap(df, bucket_cap: int):
    """The pre-r12 plan, reconstructed for the A/B: identical to
    embedding_cosine_pairs_bucketed except the cap is a count OVER
    (PARTITION BY __tbl, __bucket) — the single-reducer shape the
    r12 port removed (dedup.py:271 before this round)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from square_etl_spark.operators.similarity import (
        dot_unrolled,
        lsh_bucket,
        normalize,
        random_hyperplanes,
    )

    # same union-of-projections tagging as the shipped operator, so
    # the A/B isolates the CAP shape alone
    tagged = None
    for t in range(N_TABLES):
        branch = df.select(
            "vec_id",
            normalize(F.col("embedding")).alias("__nv"),
            F.lit(t).alias("__tbl"),
            lsh_bucket(
                F.col("embedding"), random_hyperplanes(DIM, BITS, 42 + t)
            ).alias("__bucket"),
        )
        tagged = branch if tagged is None else tagged.unionByName(branch)
    w = Window.partitionBy("__tbl", "__bucket")
    tagged = (
        tagged.withColumn("__bn", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn") <= bucket_cap)
        .drop("__bn")
    )
    a = tagged.select(
        F.col("vec_id").alias("id_a"), F.col("__nv").alias("__va"),
        "__tbl", "__bucket",
    )
    b = tagged.select(
        F.col("vec_id").alias("id_b"), F.col("__nv").alias("__vb"),
        "__tbl", "__bucket",
    )
    sim = dot_unrolled(F.col("__va"), F.col("__vb"), DIM)
    return (
        a.join(b, on=["__tbl", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", F.round(sim, 6))
        .filter(F.col("cosine_sim") >= THRESHOLD)
        .select("id_a", "id_b", "cosine_sim")
        .distinct()
    )


def timed(name: str, n_hot: int, thunk, spark):
    thunk()  # warmup
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    print(json.dumps({
        "op": name, "n_hot": n_hot, "n_clean": N_CLEAN,
        "sec": round(time.perf_counter() - t0, 3), "rows": rows,
    }), flush=True)


def run_point(n_hot: int, op: str) -> None:
    from square_etl_spark import get_spark
    from square_etl_spark.operators.dedup import embedding_cosine_pairs_bucketed

    spark = get_spark(f"scaling-r12-{op}-{n_hot}")
    df = _corpus(spark, n_hot).localCheckpoint(eager=True)
    if op == "emb_cap_window":
        thunk = lambda: _pairs_with_window_cap(df, CAP).count()
    else:
        thunk = lambda: embedding_cosine_pairs_bucketed(
            df, "vec_id", "embedding", threshold=THRESHOLD,
            dim=DIM, bits=BITS, n_tables=N_TABLES, bucket_cap=CAP,
        ).count()
    timed(op, n_hot, thunk, spark)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    for n_hot in HOT_SIZES:
        for op in OPS:
            subprocess.run(
                [sys.executable, __file__, "--point", str(n_hot), op],
                check=True,
            )


if __name__ == "__main__":
    main()
