"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``square_etl_spark`` (see SURVEY.md for the
operator inventory this surface covers); this module is a thin
re-export so the registry has one source of truth.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable no matter where the driver runs us from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from square_etl_spark import queries as _q  # noqa: E402
from square_etl_spark.io import DEFAULT_SF_DIR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-join revenue rollup: windowed orders scan ⋈ lineitem with
    broadcast customer/nation/region enrichment and order-independent
    decimal revenue sums (SURVEY.md §7 phase 0).
    """
    return _q.queries()["flagship_star_revenue"](spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every ANSI-expressible query — all
    but the two native-HLL estimates as of late r06 (exact counts in
    COVERAGE.md; MinHash/SimHash/LSH/fingerprint/mapInPandas stages
    all recompute in ANSI SQL via portable md5/affine hashing); the
    two HLL estimates stay rows-only, engine-specific by nature."""
    return _q.oracle_sql()
