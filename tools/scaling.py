"""Scaling measurement: run the heavy extension operators over
synthetically enlarged inputs and report wall time per size.

The driver's fixtures stop at sf0.1 (5 k documents / 500 vectors);
this tool manufactures corpora 10–100× larger (same statistical shape:
zipf-ish vocabulary, ~55-word docs; unit-normal embeddings) in a
scratch directory and times:

- dedup_exact          (digest groupBy — expect ~linear)
- ngram_jaccard        (postings self-join — expect ~linear in pairs)
- text_quality         (pure map — expect linear)
- ann_topk_bruteforce  (O(N·Q) scan — expect linear)
- minhash_lsh          (banded candidate join)

Usage: python tools/scaling.py [sizes_csv]   (default "5000,20000,50000")
Prints one JSON line per size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_banded_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    survivor_selection,
)
from square_etl_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_quantized,
    quantize_int8,
    topk_from_codes,
)
from square_etl_spark.operators.text import (  # noqa: E402
    quality_metrics,
    quality_score,
)

VOCAB = 30_000
DOC_WORDS = 55
DIM = 64


def gen_documents(n: int, out: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    # zipf-ish: rank-skewed vocabulary like natural text
    ranks = rng.zipf(1.3, size=(n, DOC_WORDS)) % VOCAB
    texts = [" ".join(f"w{r}" for r in row) for row in ranks]
    # plant exact + near duplicates (1% each) so dedup has real work
    for i in range(0, n // 100):
        texts[n - 1 - i] = texts[i]                      # exact dup
    for i in range(n // 100, 2 * (n // 100)):
        words = texts[i].split()
        words[0] = "wX"
        texts[n - 1 - i] = " ".join(words)               # near dup
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": texts}),
        out,
    )


def gen_embeddings(n: int, out: str, seed: int = 11) -> None:
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        ),
        out,
    )


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "5000,20000,50000").split(",")]
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="scaling-")
    try:
        for n in sizes:
            dpath = os.path.join(scratch, f"docs_{n}.parquet")
            epath = os.path.join(scratch, f"emb_{n}.parquet")
            gen_documents(n, dpath)
            gen_embeddings(n, epath)
            docs = spark.read.parquet(dpath)
            emb = spark.read.parquet(epath)
            qset = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            timings, rows = {}, {}

            def run(name, df):
                # accept a thunk for operators that materialize eagerly
                # during CONSTRUCTION (connected_components checkpoints
                # each round) — their cost must sit inside the timer.
                t0 = time.perf_counter()
                if callable(df):
                    df = df()
                rows[name] = df.count()
                timings[name] = round(time.perf_counter() - t0, 3)

            run("dedup_exact", exact_dedup(docs))
            run("ngram_jaccard", ngram_jaccard_pairs(docs, threshold=0.5, df_cap=100))
            m = quality_metrics("text")
            run(
                "text_quality",
                docs.select("doc_id", *[v.alias(k) for k, v in m.items()]),
            )
            run("ann_bruteforce", cosine_topk(emb, qset, k=5))
            run("ann_quantized", cosine_topk_quantized(emb, qset, k=5, dim=DIM))
            # deployment shape: quantize+write ONCE (untimed setup, the
            # ingest-time cost), then time the probe over the stored
            # codes+norm table — this is what ann_topk_codes benches
            codes_path = os.path.join(scratch, f"codes_{n}")
            codes_df, factors = quantize_int8(emb, DIM)
            codes_df.write.mode("overwrite").parquet(codes_path)
            stored = spark.read.parquet(codes_path)
            run(
                "ann_codes_probe",
                topk_from_codes(stored, factors, emb, qset, k=5, dim=DIM),
            )
            # cluster + survivor pick over the pair graph: CC rounds are
            # constant on shallow near-dup graphs, the label join is
            # key-sized, and the argmax is one window — expect ~linear
            run(
                "survivor_selection",
                lambda: survivor_selection(
                    docs.select("doc_id", quality_score("text").alias("q")),
                    ngram_jaccard_pairs(docs, threshold=0.5, df_cap=100),
                ),
            )
            # our banded implementation (bucket-cap skew guard); the
            # spark.ml wrapper is measured separately below when small
            # enough — it goes superlinear on skewed corpora.
            run(
                "minhash_banded",
                minhash_banded_pairs(
                    docs, num_hashes=16, bands=8, threshold=0.8, bucket_cap=200
                ),
            )
            if n <= 5000:
                run(
                    "minhash_sparkml",
                    minhash_lsh_pairs(docs, num_hashes=8, threshold=0.8),
                )
            print(
                json.dumps(
                    {"n_docs": n, "timings_s": timings, "rows": rows}
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
