"""Round-8 scaling evidence: the INCREMENTAL-dedup win.

The claim the incremental operators make (COVERAGE §2.10 r08 rows):
deduplicating a new ingest batch against an existing corpus via the
materializable LSH index / digest state costs ~O(batch), while the
naive alternative re-pairs the WHOLE corpus at ~O(corpus) every
ingest.  This sweep measures both on the same synthetic corpus at
growing sizes (new batch fixed at 10% of corpus) so the gap is a
recorded number, not rhetoric.

Methodology matches tools/scaling_r07.py after its r08 rework: each
(size, op) point runs in a FRESH subprocess (no JVM-state bleed) with
one untimed warmup run (steady-state, not cold-start).

Usage: python tools/scaling_r08.py [sizes_csv]   # corpus doc counts
       python tools/scaling_r08.py --point <n> <op>
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OPS = [
    "full_minhash_pairs",       # re-pair the whole corpus (the naive path)
    "index_probe_10pct",        # probe a 10% batch against the 90% index
    "full_exact_dedup",
    "incremental_exact_10pct",
    "exhaustive_postings_join",  # uncapped pair join (the naive exact path)
    "prefix_filter_join",        # lossless PPJoin-style pruning, same output
]


def timed(name: str, n: int, thunk, spark):
    thunk()  # warmup (see scaling_r07.timed)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"op": name, "n": n, "sec": dt, "rows": rows}),
          flush=True)


def _corpus(spark, n: int):
    """Deterministic synthetic corpus: 30-word docs whose words are
    md5-derived from (base id, position) — a ~65 k token space, so
    distinct ids give distinct documents w.h.p. (a first draft used a
    500-word modular vocabulary; at n ≫ 500 the word sequences
    repeated every 500 ids and the 'corpus' collapsed to 500 dup
    groups of ~n/500 copies — a quadratic pair explosion that made
    the full-re-pair side look artificially terrible).  Planted
    structure: every 17th doc is an exact copy of its neighbor, every
    13th a one-word edit of itself — dup groups of size 2, the
    realistic regime."""
    from pyspark.sql import functions as F

    base = F.when(F.col("id") % 17 == 1, F.col("id") - 1).otherwise(
        F.col("id")
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.when(
            (F.col("id") % 13 == 1) & (i == F.lit(3)), F.lit("edit")
        ).otherwise(
            F.substring(
                F.md5(F.concat(base.cast("string"), F.lit("_"), i.cast("string"))),
                1,
                4,
            )
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def run_point(n: int, op: str) -> None:
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.operators.dedup import (
        exact_dedup,
        incremental_exact_dedup,
        minhash_banded_pairs,
        minhash_index,
        minhash_probe,
    )

    spark = get_spark("scaling-r08")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _corpus(spark, n).persist()
    docs.count()  # materialize the corpus outside every timer
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)

    if op == "full_minhash_pairs":
        timed(op, n,
              lambda: minhash_banded_pairs(docs, threshold=0.5).count(),
              spark)
    elif op == "index_probe_10pct":
        # index build is the WRITE-side cost paid once at ingest; the
        # recurring per-batch cost is the probe — persist the index
        # (≈ reading the materialized index tables) outside the timer
        sh, idx = minhash_index(old)
        sh, idx = sh.persist(), idx.persist()
        sh.count(), idx.count()
        timed(op, n,
              lambda: minhash_probe(sh, idx, new, threshold=0.5).count(),
              spark)
    elif op == "full_exact_dedup":
        timed(op, n, lambda: exact_dedup(docs).count(), spark)
    elif op == "incremental_exact_10pct":
        state, _ = incremental_exact_dedup(None, old)
        state = state.persist()
        state.count()
        timed(op, n,
              lambda: incremental_exact_dedup(state, new)[0].count(),
              spark)
    elif op == "exhaustive_postings_join":
        from square_etl_spark.operators.dedup import ngram_jaccard_pairs

        timed(op, n,
              lambda: ngram_jaccard_pairs(
                  docs, threshold=0.5, df_cap=None).count(),
              spark)
    elif op == "prefix_filter_join":
        from square_etl_spark.operators.dedup import ngram_jaccard_prefix

        timed(op, n,
              lambda: ngram_jaccard_prefix(docs, threshold=0.5).count(),
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
                  "20000,80000,320000").split(",")
    ]
    me = str(Path(__file__).resolve())
    for n in sizes:
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
                    {"op": op, "n": n,
                     "error": (r.stderr or "")[-400:]}), flush=True)


if __name__ == "__main__":
    main()


def prefix_guard_demo(spark, n: int = 40_000, boiler_every: int = 20) -> None:
    """Hot-shingle wall-time evidence for the prefix filter: every
    ``boiler_every``-th doc carries the SAME 6-word boilerplate
    sentence (n/20 = 2000 docs → the boilerplate shingles' posting
    lists are 2000 long → the exhaustive postings join materializes
    ~2M candidate pairs from boilerplate alone), while the prefix
    filter sorts those max-df shingles LAST — they never enter a
    prefix, so the planted block costs it nothing and the OUTPUT is
    still exactly the exhaustive join's (losslessness is only about
    pairs ≥ t).  The r07 cap-guard demo needed a cap knob and changed
    the output; here the guard falls out of the math and the output
    is identical.  Run separately from main() so the headline sweep
    stays comparable:
    python -c "import sys; sys.path.insert(0,'.'); \
      from tools.scaling_r08 import prefix_guard_demo; \
      from square_etl_spark import get_spark; prefix_guard_demo(get_spark('pf'))"
    """
    import time as _t

    from pyspark.sql import functions as F

    from square_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix,
    )

    docs = _corpus(spark, n)
    boiler = "please subscribe to our newsletter for updates today"
    docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % boiler_every == boiler_every - 1,
            F.concat(F.lit(boiler + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    ).persist()
    docs.count()

    for name, thunk in [
        ("prefix_filter", lambda: ngram_jaccard_prefix(
            docs, threshold=0.5).count()),
        ("exhaustive_postings", lambda: ngram_jaccard_pairs(
            docs, threshold=0.5, df_cap=None).count()),
    ]:
        thunk()  # warmup
        spark.sparkContext._jvm.System.gc()
        t0 = _t.perf_counter()
        rows = thunk()
        print(json.dumps({"op": name, "n": n, "sec": round(
            _t.perf_counter() - t0, 2), "rows": rows}), flush=True)
