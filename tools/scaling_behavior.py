"""Scaling measurement for the round-6 operator families: behavior
analytics (funnel / retention / streaks / gap-fill), sketches
(count-min, Bloom pruning), iterative compute (PageRank, k-means),
and the snapshot diff.

Manufactures event streams with the fixtures' shape (users x ~30
days, microsecond timestamps) at 10-40x the sf0.1 row count, plus
embeddings for k-means, and times each operator end-to-end (count
action; thunks so eager checkpoint work lands inside the timer —
the survivor-selection lesson from r06).

Usage: python tools/scaling_behavior.py [sizes_csv]
  (default "100000,1000000,4000000" event rows; users = rows/66)
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
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.operators.behavior import (  # noqa: E402
    activity_streaks,
    funnel_stage_times,
    gapfill_daily,
    retention_cohorts,
)
from square_etl_spark.operators.aggregations import decimal_sum  # noqa: E402
from square_etl_spark.operators.clustering import kmeans_fixed  # noqa: E402
from square_etl_spark.operators.graph import pagerank_fixed  # noqa: E402
from square_etl_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_probe_keys,
    cms_build,
    cms_estimate,
)
from square_etl_spark.sinks.merge import snapshot_diff  # noqa: E402

TYPES = np.array(["view", "click", "purchase", "signup", "error"])


def gen_events(n: int, out: str, seed: int = 7) -> int:
    rng = np.random.default_rng(seed)
    n_users = max(50, n // 66)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 10**6, "us")
    ts = ts0 + (rng.random(n) * span.astype(np.int64)).astype(
        "timedelta64[us]"
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts.astype("datetime64[us]")),
                "user_id": pa.array(
                    rng.integers(0, n_users, n), pa.int64()
                ),
                "event_type": pa.array(TYPES[rng.integers(0, 5, n)]),
                "value": pa.array(
                    np.round(rng.random(n) * 100, 2), pa.float64()
                ),
            }
        ),
        out,
    )
    return n_users


# reuse the main sweep's generator — one definition of "the fixtures'
# embedding shape" so the two sweeps can never measure different data
from scaling import gen_embeddings  # noqa: E402


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "100000,1000000,4000000"
        ).split(",")
    ]
    spark = get_spark("scaling-behavior")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="scaling-bhv-")
    try:
        for n in sizes:
            epath = os.path.join(scratch, f"events_{n}.parquet")
            n_users = gen_events(n, epath)
            ev = spark.read.parquet(epath)
            timings, rows = {}, {}

            def run(name, thunk):
                t0 = time.perf_counter()
                df = thunk()
                rows[name] = df.count()
                timings[name] = round(time.perf_counter() - t0, 3)

            run(
                "funnel",
                lambda: funnel_stage_times(
                    ev, "ts", "user_id", "event_type",
                    ["view", "click", "purchase"],
                ),
            )
            run("retention", lambda: retention_cohorts(ev, "ts", "user_id"))
            run("streaks", lambda: activity_streaks(ev, "ts", "user_id"))
            run(
                "gapfill",
                lambda: gapfill_daily(
                    ev.filter(F.col("user_id") < 1000),
                    "ts", "user_id", decimal_sum(F.col("value")),
                ),
            )
            run(
                "cms_build_estimate",
                lambda: cms_estimate(
                    cms_build(ev, "user_id"),
                    ev.select("user_id").distinct(),
                    "user_id",
                ),
            )
            run(
                "bloom_prune",
                lambda: bloom_probe_keys(
                    ev.select("user_id").distinct(),
                    "user_id",
                    bloom_build(
                        ev.filter(F.col("user_id") % 5 == 0).select(
                            "user_id"
                        ),
                        "user_id",
                        m=1 << 16,
                    ),
                    m=1 << 16,
                ),
            )
            # the query's exact graph shape — shared constructor so the
            # sweep can never time a different graph than the oracle pins
            from square_etl_spark.operators.graph import regular_user_graph

            edges = regular_user_graph(ev.select("user_id").distinct())
            run("pagerank_3it", lambda: pagerank_fixed(edges, iters=3))
            run(
                "snapshot_diff",
                lambda: snapshot_diff(
                    ev.filter(F.col("event_id") % 10 != 7).select(
                        "event_id", "event_type", "value"
                    ),
                    ev.filter(F.col("event_id") % 13 != 5).select(
                        "event_id",
                        "event_type",
                        F.when(
                            F.col("event_id") % 3 == 0, F.col("value") + 1.5
                        ).otherwise(F.col("value")).alias("value"),
                    ),
                    ["event_id"],
                    ["event_type", "value"],
                ),
            )
            # k-means scales with vectors, not events: 1/10 of n, cap 50k
            kn = min(max(n // 10, 2000), 50_000)
            kpath = os.path.join(scratch, f"emb_{kn}.parquet")
            gen_embeddings(kn, kpath)
            emb = spark.read.parquet(kpath)
            run(
                f"kmeans_2it_{kn}v",
                lambda: kmeans_fixed(emb, "vec_id", "embedding", k=8)[0],
            )
            print(
                json.dumps(
                    {
                        "n_events": n,
                        "n_users": n_users,
                        "timings_s": timings,
                        "rows": rows,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
