"""Round-9 scaling evidence (c): SemDeDup blocking — k must scale
with the corpus, and when it does the pair stage stays linear.

`dedup.semantic_dedup`'s docstring carries the paper's guidance
("raise k with corpus size, k ≈ N / target-block-size"); this sweep
measures it.  Fixed k = 4 gives blocks of ~N/4, so the within-block
pair space grows as N²/8 — quadratic in disguise.  Scaling
k = N/500 pins the expected block population at ~500, bounding the
pair space at ~N·500/2 — linear growth, the published SemDeDup
regime (the paper runs k in the tens of thousands for exactly this
reason).  The k-means assignment itself costs N·d·k join rows, so k
can't grow unboundedly either — target-block-size is the real knob.

Vectors are md5-deterministic 16-d synthetics (no planted cluster
structure needed — the sweep measures COST, and uniform data is the
worst case for blocking: every cluster is maximally even).
Methodology matches tools/scaling_r08/r09/r09b.py: each (size, op)
point runs in a FRESH subprocess with one untimed warmup.

Findings (full table + the two operator fixes this sweep forced —
checkpointed Arrow assignment, explicit-count sample repartition)
are written up in SCALING.md 'Round-9 SemDeDup blocking sweep'.

The 256-d addendum (SCALING.md) reruns the sweep at production
embedding width — `SEMDEDUP_DIM=256`, timed points as a QUIET
triplicate (the 10^9-row codegen join spreads 15-40 s under GC; take
medians), plus the `pairs_*` probes (exact candidate-pair counts —
the deterministic half of the evidence) and the
`semdedup_fixedfit_arrow` regime (fit sample SIZE pinned at ~5000 so
the Lloyd fit stays linear; the fixed-FRACTION fit is quadratic at
k ~ N and dominates at 256-d).

Usage: python tools/scaling_r09c.py                # full sweep
       python tools/scaling_r09c.py --point <n> <op>
       # op also: pairs_fixed_k4 | pairs_scaled_k | semdedup_fixedfit_arrow
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OPS = ["semdedup_fixed_k4", "semdedup_scaled_k", "semdedup_scaled_k_arrow"]
#: override via SEMDEDUP_DIM to measure production embedding widths
#: (the 16-d sweep showed fixed k=4 never losing — per-pair cost at
#: 16-d is too cheap for the N^2 term to bite in this range; 256-d
#: multiplies the per-pair arithmetic 16x, the production regime)
import os as _os
DIM_ENV = int(_os.environ.get("SEMDEDUP_DIM", "0"))
SIZES = [5_000, 10_000, 20_000, 40_000]
TARGET_BLOCK = 500
DIM = DIM_ENV or 16


def timed(name: str, n: int, thunk, spark):
    thunk()  # warmup
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    print(json.dumps({
        "op": name, "n": n, "sec": round(time.perf_counter() - t0, 3),
        "rows": rows,
    }), flush=True)


def _vectors(spark, n: int):
    """Deterministic synthetic embeddings: dim values md5-derived from
    (id, dim index), uniform in [0, 1)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.col("id"), i), F.lit(997)
                ).cast("double")
                / F.lit(997.0)
            ),
        ).alias("embedding"),
    )


def run_pairs_probe(n: int, op: str) -> None:
    """Report the candidate-pair space Sigma b*(b-1)/2 and the largest
    block for a given deployment — UNtimed diagnostics that make the
    timing table interpretable (fixed-k4 cost on uniform high-d data is
    seed/N-dependent because 1-iter Lloyd balance varies; the pair count
    is the variable that actually drives the cost).  Calls the
    operator's OWN fit/assign stage (dedup.semantic_block_assign), so
    the probe measures the deployed blocking and cannot drift from it."""
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.operators.dedup import semantic_block_assign

    spark = get_spark("scaling-r09c")
    spark.sparkContext.setLogLevel("ERROR")
    emb = _vectors(spark, n).localCheckpoint(eager=True)
    if op == "pairs_fixed_k4":
        assign = semantic_block_assign(
            emb, "vec_id", "embedding", k=4, iters=1
        )
    else:  # pairs_scaled_k: sampled fit + arrow assign, as deployed
        assign = semantic_block_assign(
            emb, "vec_id", "embedding",
            k=max(4, n // TARGET_BLOCK), iters=1, fit_sample_mod=8,
        )
    stats = (
        assign.groupBy("c").count()
        .agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
            F.max("count").alias("max_block"),
            F.count("*").alias("nonempty_blocks"),
        )
        .collect()[0]
    )
    print(json.dumps({
        "op": op, "n": n, "pairs": int(stats["pairs"]),
        "max_block": int(stats["max_block"]),
        "nonempty_blocks": int(stats["nonempty_blocks"]),
    }), flush=True)


def run_point(n: int, op: str) -> None:
    if op.startswith("pairs_"):
        run_pairs_probe(n, op)
        return
    from square_etl_spark import get_spark
    from square_etl_spark.operators.dedup import semantic_dedup

    spark = get_spark("scaling-r09c")
    spark.sparkContext.setLogLevel("ERROR")
    emb = _vectors(spark, n).localCheckpoint(eager=True)
    k = 4 if op == "semdedup_fixed_k4" else max(4, n // TARGET_BLOCK)
    # arrow variant: fit centroids on the 1/8 deterministic sample,
    # assign everything with the numpy fast path — the posture the
    # exact-assignment measurement motivates (see module docstring).
    # fixedfit variant: the sample SIZE is pinned (~5000 vectors, mod
    # scales with n) so the exact-Lloyd fit stays O(5000*d*k) — the
    # production posture for high dims, where a fixed-FRACTION sample
    # makes the fit itself quadratic (sample*d*k with k prop. to N;
    # measured: the 256-d fit dominates the whole scaled path)
    mod = None
    if op == "semdedup_scaled_k_arrow":
        mod = 8
    elif op == "semdedup_fixedfit_arrow":
        mod = max(8, n // 5_000)
    timed(
        op, n,
        lambda: semantic_dedup(
            emb, "vec_id", "embedding", k=k, iters=1,
            threshold=0.95, dim=DIM, fit_sample_mod=mod,
        ).count(),
        spark,
    )


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
