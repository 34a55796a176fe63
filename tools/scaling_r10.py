"""Round-10 scaling evidence: (a) the ANN ladder's new IVF-PQ rung
probed against the int8/codes rungs at three corpus sizes, and
(b) amortized SemDeDup — fixed ingest batch against a growing
pre-ingested corpus with a FIT-ONCE stored-centroid artifact.

(a) ANN probe cost.  All three rungs time the PROBE-ONLY deployment
path over pre-built artifacts (codes table for int8/codes,
ivfpq_index for IVF-PQ — builds run untimed, the write-once side):
  ann_int8_probe   — topk_from_codes over the materialized codes+norm
                     table: full-corpus scan of 8×-smaller rows.
  ann_ivfpq_probe  — topk_from_pq: n_probe/n_cells of the corpus
                     touched, m codes + 1 norm per touched vector.
The expected shape: int8 probe grows linearly with N (it scans
everything); IVF-PQ grows with N/n_cells·n_probe and a smaller
constant per row — the gap widens with N.  n_cells scales as
N/2000 (bounded cells, the IVF discipline; fit on the 1/8 sample).

(b) SemDeDup per-batch ingest cost.  semantic_fit_centroids runs
ONCE on the pre-ingested corpus (sampled fit, k = N/500 — the r09c
scaled-k regime), then a FIXED 5 000-vector batch folds through
incremental_semantic_dedup(arrow_assign=True) against the
accumulated state.  Expected: near-flat per-batch seconds as the
pre-ingested corpus doubles — the fit is amortized away and blocks
stay ~500 wide, so batch work is batch·block-bounded; only the
state-side scan of the batch's clusters grows (linear in state, tiny
coefficient).

Methodology matches tools/scaling_r08/r09*.py: each (size, op) point
runs in a FRESH subprocess with one untimed warmup and a JVM GC
before the timed run.  Findings → SCALING.md 'Round-10 sweeps'.

Usage: python tools/scaling_r10.py                 # full sweep
       python tools/scaling_r10.py --point <n> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZES = [20_000, 40_000, 80_000]
OPS = ["ann_int8_probe", "ann_ivfpq_probe", "ann_ivfpq_probe_stored",
       "semdedup_batch_ingest"]
DIM = 64
N_QUERIES = 5
BATCH = 5_000
TARGET_BLOCK = 500
TARGET_CELL = 2_000


def _vectors(spark, n: int, offset: int = 0):
    from pyspark.sql import functions as F

    return spark.range(offset, offset + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(997)).cast("double")
                / F.lit(997.0)
            ),
        ).alias("embedding"),
    )


def _queries_of(spark, emb):
    from pyspark.sql import functions as F

    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def timed(name: str, n: int, thunk, spark):
    thunk()  # warmup
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    print(json.dumps({
        "op": name, "n": n, "sec": round(time.perf_counter() - t0, 3),
        "rows": rows,
    }), flush=True)



def _pq_artifacts(emb, spark):
    """PQ codes/codebooks/rnorm WITHOUT the throwaway coarse fit
    (ivfpq_index also fits 4 coarse cells the sweep then discards —
    r10 review fix): pq_encode + the codebook-norm fold, matching
    ivfpq_index's last three relations exactly."""
    from pyspark.sql import functions as F

    from square_etl_spark.operators.similarity import pq_encode

    codes, codebooks = pq_encode(emb, DIM, m=4, ksub=4, iters=1)
    cn2 = codebooks.groupBy("s", "c").agg(
        F.sum(
            F.round(F.col("cval") * F.col("cval"), 9).cast("decimal(38,9)")
        ).alias("cn2")
    )
    rnorm = (
        codes.join(F.broadcast(cn2), ["s", "c"])
        .groupBy("vec_id")
        .agg(F.sqrt(F.sum("cn2").cast("double")).alias("rnorm"))
    )
    return (
        codes.localCheckpoint(eager=True),
        codebooks.localCheckpoint(eager=True),
        rnorm.localCheckpoint(eager=True),
    )


def run_point(n: int, op: str) -> None:
    from square_etl_spark import get_spark

    spark = get_spark("scaling-r10")
    spark.sparkContext.setLogLevel("ERROR")

    if op == "ann_int8_probe":
        from square_etl_spark.operators.similarity import (
            quantize_int8,
            topk_from_codes,
        )

        emb = _vectors(spark, n).localCheckpoint(eager=True)
        q = _queries_of(spark, emb)
        codes, factors = quantize_int8(emb, DIM)
        codes = codes.localCheckpoint(eager=True)  # untimed build
        timed(op, n, lambda: topk_from_codes(
            codes, factors, emb, q, k=5, dim=DIM).count(), spark)
    elif op == "ann_ivfpq_probe":
        from square_etl_spark.operators.similarity import topk_from_pq

        emb = _vectors(spark, n).localCheckpoint(eager=True)
        q = _queries_of(spark, emb)
        n_cells = max(4, n // TARGET_CELL)
        # untimed build: at scaled n_cells the coarse fit would be the
        # r09c quadratic, so fit on the 1/8 sample like the deployed
        # semantic path, then assign with the stored-centroid pass
        from square_etl_spark.operators.clustering import (
            kmeans_assign_arrow,
        )
        from square_etl_spark.operators.dedup import semantic_fit_centroids

        coarse = semantic_fit_centroids(
            emb, "vec_id", "embedding", k=n_cells,
            update_rounds=1, fit_sample_mod=8,
        ).localCheckpoint(eager=True)
        cells = kmeans_assign_arrow(
            emb, coarse, "vec_id", "embedding"
        ).select("vid", "c").localCheckpoint(eager=True)
        codes, codebooks, rnorm = _pq_artifacts(emb, spark)
        timed(op, n, lambda: topk_from_pq(
            cells, coarse, codes, codebooks, rnorm, emb, q,
            k=5, n_probe=2).count(), spark)
    elif op == "ann_ivfpq_probe_stored":
        # the deployment layout the r10 finding prescribes: codes
        # stored PARTITIONED BY CELL (write untimed), probe reads only
        # the probed cells' directories (partition pruning)
        import tempfile

        from square_etl_spark.operators.clustering import (
            kmeans_assign_arrow,
        )
        from square_etl_spark.operators.dedup import semantic_fit_centroids
        from square_etl_spark.operators.similarity import (
            topk_from_pq_stored,
            write_ivfpq_index,
        )

        emb = _vectors(spark, n).localCheckpoint(eager=True)
        q = _queries_of(spark, emb)
        n_cells = max(4, n // TARGET_CELL)
        coarse = semantic_fit_centroids(
            emb, "vec_id", "embedding", k=n_cells,
            update_rounds=1, fit_sample_mod=8,
        ).localCheckpoint(eager=True)
        cells = kmeans_assign_arrow(
            emb, coarse, "vec_id", "embedding"
        ).select("vid", "c").localCheckpoint(eager=True)
        codes, codebooks, rnorm = _pq_artifacts(emb, spark)
        base = tempfile.mkdtemp(prefix="scaling_r10_pqidx_")
        write_ivfpq_index(
            (cells, coarse, codes, codebooks, rnorm), base
        )  # untimed: the write-once side
        timed(op, n, lambda: topk_from_pq_stored(
            spark, base, emb, q, k=5, n_probe=2).count(), spark)
    elif op == "semdedup_batch_ingest":
        from square_etl_spark.operators.dedup import (
            incremental_semantic_dedup,
            semantic_fit_centroids,
        )
        from square_etl_spark.operators.similarity import normalize
        from square_etl_spark.operators.clustering import kmeans_assign_arrow
        from pyspark.sql import functions as F

        pre = _vectors(spark, n).localCheckpoint(eager=True)
        batch = _vectors(spark, BATCH, offset=n).localCheckpoint(eager=True)
        k = max(4, n // TARGET_BLOCK)
        cent = semantic_fit_centroids(
            pre, "vec_id", "embedding", k=k,
            update_rounds=1, fit_sample_mod=8,
        ).localCheckpoint(eager=True)  # fit once, untimed (amortized)
        # pre-ingested state: assignment + normalized vectors, as the
        # prior folds would have left it (untimed — already on disk in
        # a real ingest loop)
        state = (
            pre.select(
                F.col("vec_id").alias("vid"),
                normalize(F.col("embedding")).alias("__nv"),
            )
            .join(
                kmeans_assign_arrow(
                    pre, cent, "vec_id", "embedding"
                ).select("vid", "c"),
                "vid",
            )
            .select("vid", "c", "__nv")
            .localCheckpoint(eager=True)
        )
        timed(op, n, lambda: incremental_semantic_dedup(
            state, batch, cent, threshold=0.35, dim=DIM,
            arrow_assign=True,
        )[0].count(), spark)
    else:
        raise SystemExit(f"unknown op {op!r}")


def main() -> None:
    if len(sys.argv) == 4 and sys.argv[1] == "--point":
        run_point(int(sys.argv[2]), sys.argv[3])
        return
    here = Path(__file__).resolve().parent
    for op in OPS:
        for n in SIZES:
            subprocess.run(
                [sys.executable, str(here / "scaling_r10.py"),
                 "--point", str(n), op],
                check=False,
            )


if __name__ == "__main__":
    main()
