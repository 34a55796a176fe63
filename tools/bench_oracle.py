"""Time the DuckDB oracle SQL for every benched query at a scale factor.

Context for BENCH_r{N}.json: the reference engine publishes no numbers
(BASELINE.md), so the closest honest single-node baseline is DuckDB —
the same engine the driver trusts for correctness — executing the
semantically identical SQL on the same parquet.  Prints one JSON line
mirroring bench.py's shape.

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from square_etl_spark.queries import registry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    out, total = {}, 0.0
    for spec in registry():
        if not spec.bench or spec.oracle is None:
            continue
        t0 = time.time()
        con.execute(spec.oracle).fetchall()
        dt = time.time() - t0
        out[spec.name] = round(dt, 3)
        total += dt
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "oracle_bench_total_s",
                "value": round(total, 3),
                "unit": "sec",
                "queries": out,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
