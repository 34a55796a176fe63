"""Round-12 scaling study B: the trained-NB classifier family.

Claims under test (operators/classify.py):

1. TRAINING is one map-side-combinable aggregation — wall time linear
   in corpus size even when one token carries a constant FRACTION of
   the whole corpus's token mass (the hot reduce key combines in the
   map-side partial, so no reducer sees the raw occurrence stream).
2. SCORING is corpus-linear with a vocabulary-bounded model: the
   model relation (vocab × |labels|) must stay FLAT as the corpus
   replicates (the fixture vocabulary is closed), and the per-doc
   cost must not grow with corpus size.

Method: replicate the sf0.1 documents table 1x/4x/16x with doc_id
remapped per copy (distinct docs, same vocabulary); plant a hot token
by appending a 32-token run of the single word 'hot' to every 10th
document — at 16x that token alone is ~1.5M occurrences concentrated
on one (label, token) reduce key per label.  Time nb_counts (train)
and nb_predictions (score) end to end via a noop write.

Usage: python tools/scaling_r12b.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.io import load_table  # noqa: E402
from square_etl_spark.operators import classify as cl  # noqa: E402


def replicated(d, k: int):
    """k distinct copies of the corpus: doc_id shifted per copy, every
    10th doc gets a 32-occurrence hot-token tail."""
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    hot_tail = F.concat(F.col("text"), F.lit(" " + "hot " * 31 + "hot"))
    return out.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, hot_tail).otherwise(
            F.col("text")
        ),
    )


def run(spark, d, k: int) -> dict:
    corpus = replicated(d, k).localCheckpoint(eager=True)  # isolate input build
    n_docs = corpus.count()
    t0 = time.time()
    counts = cl.nb_counts(corpus.filter(F.col("doc_id") % 3 != 0))
    counts.write.format("noop").mode("overwrite").save()
    t_train = time.time() - t0
    model_rows = counts.count()
    t0 = time.time()
    preds = cl.nb_predictions(
        corpus.filter(F.col("doc_id") % 3 == 0),
        cl.nb_counts(corpus.filter(F.col("doc_id") % 3 != 0)),
    )
    preds.write.format("noop").mode("overwrite").save()
    t_score = time.time() - t0
    return {
        "k": k,
        "n_docs": n_docs,
        "model_rows": model_rows,
        "t_train_s": round(t_train, 2),
        "t_score_s": round(t_score, 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scaling-r12b")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    # warm the JVM/codegen once so k=1 isn't charged startup
    run(spark, d, 1)
    rows = [run(spark, d, k) for k in (1, 4, 16)]
    for r in rows:
        print(r)
    r1, r4, r16 = rows
    print(
        "train growth 1->4:",
        round(r4["t_train_s"] / max(r1["t_train_s"], 1e-9), 2),
        " 4->16:",
        round(r16["t_train_s"] / max(r4["t_train_s"], 1e-9), 2),
    )
    print(
        "score growth 1->4:",
        round(r4["t_score_s"] / max(r1["t_score_s"], 1e-9), 2),
        " 4->16:",
        round(r16["t_score_s"] / max(r4["t_score_s"], 1e-9), 2),
    )
    print(
        "model rows flat?",
        r1["model_rows"],
        r4["model_rows"],
        r16["model_rows"],
    )


if __name__ == "__main__":
    main()
