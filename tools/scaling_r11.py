"""Round-11 scaling evidence: the exact-substring dedup skew guard
(r10 verdict item 5) under a PLANTED viral window.

Corpus: n docs of 60 unique tokens each, plus `hot` docs that all
share one identical 20-token boilerplate window (the "viral banner"
— at crawl scale a cookie notice or nav bar repeated 10⁹ times).
Every occurrence of that window hashes to ONE `whash` key, so the
previous `row_number() OVER (PARTITION BY whash)` shape shuffled all
`hot` occurrence rows to a single reducer and sorted them there —
single-task time linear in the skew.  The r11 shape computes the
per-hash first occurrence with a map-side-combinable
`min(struct(id, pos))` aggregate (partial rows per map partition,
not per occurrence) and recovers duplicate occurrences with an anti
join on the uniformly-distributed (id, pos) doc key.

  substring_window — the pre-r11 shape (window rank), for contrast
  substring_agg    — substring_dedup as shipped (aggregate + anti join)

Expected: both linear in the clean corpus; as `hot` grows at fixed
corpus, the window shape's single hot task dominates while the
aggregate shape stays flat (the hot key collapses map-side).

Methodology matches tools/scaling_r08/r09*/r10.py: each point runs
in a FRESH subprocess with one untimed warmup and a JVM GC before
the timed run.  Findings → SCALING.md 'Round-11 sweeps'.

Usage: python tools/scaling_r11.py                 # full sweep
       python tools/scaling_r11.py --point <n_hot> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CLEAN = 20_000
HOT_SIZES = [10_000, 50_000, 100_000]
OPS = ["substring_window", "substring_agg"]
W = 20

# BPE-training round cut (r10 verdict item 6): sequential = one Spark
# round per merge; batch_k=8 accepts up to 8 symbol-disjoint merges
# per round, so rounds ≈ merges/8 — wall-clock is driver-round-bound
# at vocab sizes this small, which is exactly the regime the cut
# targets (a 50k-merge production vocab is 50k rounds sequential).
BPE_MERGES_N = 32
BPE_OPS = ["bpe_train_seq", "bpe_train_batched"]


def _corpus(spark, n_hot: int):
    """n_clean all-unique docs + n_hot docs sharing one hot window."""
    from pyspark.sql import functions as F

    clean = spark.range(N_CLEAN).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.concat(
                    F.lit("w"), (F.col("id") * 60 + i).cast("string")
                ),
            ),
        ).alias("text"),
    )
    banner = " ".join(f"banner{i}" for i in range(W))
    hot = spark.range(N_CLEAN, N_CLEAN + n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(banner + " "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(19)),
                    lambda i: F.concat(
                        F.lit("u"), (F.col("id") * 20 + i).cast("string")
                    ),
                ),
            ),
        ).alias("text"),
    )
    return clean.unionByName(hot)


def _substring_window_shape(df, window_tokens: int):
    """The pre-r11 plan, reconstructed for the A/B: whash-partitioned
    row_number rank → duplicates are rank > 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from square_etl_spark.operators.dedup import (
        _strip_dup_windows,
        _substring_base,
    )

    base = _substring_base(df, "doc_id", "text", window_tokens)
    wins = base.select("doc_id", F.posexplode("__wh").alias("pos", "whash"))
    rk = Window.partitionBy("whash").orderBy("doc_id", "pos")
    dups = (
        wins.withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") > 1)
        .select("doc_id", "pos")
    )
    return _strip_dup_windows(base, dups, "doc_id", window_tokens)


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
    from square_etl_spark.operators.dedup import substring_dedup

    spark = get_spark(f"scaling-r11-{op}-{n_hot}")
    if op in BPE_OPS:
        from pyspark.sql import functions as F

        from square_etl_spark.operators.text import bpe_train

        # zipf-ish small-vocab corpus (Heaps-law regime): per-round
        # vocab work is tiny, so DRIVER ROUND latency dominates —
        # the component the batch cut removes
        df = spark.range(N_CLEAN).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(59)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id"), i)
                            % (F.pmod(F.xxhash64(i), F.lit(40)) + 1),
                            F.lit(500),
                        ).cast("string"),
                    ),
                ),
            ).alias("text"),
        ).localCheckpoint(eager=True)
        k = 1 if op == "bpe_train_seq" else 8
        t0 = time.perf_counter()
        merges = bpe_train(
            df, num_merges=BPE_MERGES_N, alphabet="byte", batch_k=k
        )
        rounds = -(-len(merges) // k)  # ceil: accepted per round ≤ k
        print(json.dumps({
            "op": op, "n_hot": n_hot, "merges": len(merges),
            "rounds_upper": rounds if k > 1 else len(merges),
            "sec": round(time.perf_counter() - t0, 3),
        }), flush=True)
        return
    df = _corpus(spark, n_hot).localCheckpoint(eager=True)
    if op == "substring_window":
        timed(op, n_hot, lambda: _substring_window_shape(df, W).count(), spark)
    elif op == "substring_agg":
        timed(
            op, n_hot,
            lambda: substring_dedup(df, window_tokens=W).count(), spark,
        )
    else:
        raise SystemExit(f"unknown op {op}")


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    for n_hot in HOT_SIZES:
        for op in OPS:
            subprocess.run(
                [sys.executable, __file__, "--point", str(n_hot), op],
                check=False,
            )
    for op in BPE_OPS:
        subprocess.run(
            [sys.executable, __file__, "--point", "0", op], check=False
        )


if __name__ == "__main__":
    main()
