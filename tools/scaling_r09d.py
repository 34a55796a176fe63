"""Round-9 scaling evidence (d): the INCREMENTAL unigram-LM state
makes perplexity/DoReMi scoring batch-proportional; a naive pipeline
re-tokenizes the whole corpus per ingest batch.

The claim under test is the one `mix_doremi_incremental` advertises:
with a growing accumulated corpus and a FIXED 5 000-doc ingest batch,
scoring the batch against the corpus-so-far unigram LM costs

- full recompute: re-derive the (w, c) model from EVERY document ever
  ingested (corpus text re-tokenized each batch), then score;
- state probe:    read the stored vocab-sized (w, c) state, fold the
  batch's own counts in (batch-sized tokenize), then score.

Both paths produce IDENTICAL scores (count-sum monoid — pinned by the
shared oracle of `mix_doremi_incremental` and test_dedup_text's
fold/model_counts parity pins); what this sweep measures is the COST
gap and its growth.  Unlike DSIR's ≤4096-row bucket state the vocab
state is sub-linear-but-unbounded — the sweep also prints the state's
row count so the sub-linearity claim is itself measured.

Methodology matches tools/scaling_r08/r09*.py: each (size, op) point
runs in a FRESH subprocess with one untimed warmup.

Usage: python tools/scaling_r09d.py                # full sweep
       python tools/scaling_r09d.py --point <n> <op>
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

OPS = ["lm_full_recompute", "lm_state_probe"]
#: accumulated corpus docs; the 2.56M point is where the gap opens on
#: these 30-word synthetic docs (tokenize+count is cheap codegen — a
#: real web corpus's ~1k-word docs move the crossover far earlier)
SIZES = [40_000, 160_000, 640_000, 2_560_000]
BATCH = 5_000


def timed(name: str, n: int, thunk, spark, extra=None):
    thunk()  # warmup (steady-state, not cold-start)
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    rows = thunk()
    rec = {
        "op": name, "n": n, "sec": round(time.perf_counter() - t0, 3),
        "rows": rows,
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)


def run_point(n: int, op: str) -> None:
    from pyspark.sql import functions as F

    from square_etl_spark import get_spark
    from square_etl_spark.operators.text import (
        fold_unigram_counts,
        unigram_counts,
        unigram_logprob,
    )

    spark = get_spark("scaling-r09d")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="scaling_r09d_")

    from scaling_r08 import _corpus

    step = max(n // BATCH, 1)
    docs = _corpus(spark, n)
    corpus = docs.filter(F.col("doc_id") % step != 0)
    batch = docs.filter(F.col("doc_id") % step == 0).persist()
    batch.count()

    # materialize the accumulated corpus: text parquet (what the full
    # recompute must re-tokenize) + the vocab-sized count state (what
    # the incremental path reads instead)
    corpus.write.mode("overwrite").parquet(f"{base}/corpus")
    unigram_counts(corpus, "text").write.mode("overwrite").parquet(
        f"{base}/state"
    )
    corpus_r = spark.read.parquet(f"{base}/corpus")
    state_r = spark.read.parquet(f"{base}/state")
    vocab_rows = state_r.count()

    if op == "lm_full_recompute":
        def full() -> int:
            counts = unigram_counts(
                corpus_r.select("doc_id", "text").unionByName(
                    batch.select("doc_id", "text")
                ),
                "text",
            )
            return unigram_logprob(
                batch, "doc_id", "text", model_counts=counts
            ).count()

        timed(op, n, full, spark, {"vocab_rows": vocab_rows})
        return

    if op == "lm_state_probe":
        def probe() -> int:
            counts = fold_unigram_counts(
                state_r, unigram_counts(batch, "text")
            )
            return unigram_logprob(
                batch, "doc_id", "text", model_counts=counts
            ).count()

        timed(op, n, probe, spark, {"vocab_rows": vocab_rows})
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
