"""Dump ``explain("formatted")`` for named registry queries — the
r16 optimization round's before/after plan evidence.

Usage:
    python tools/plans_r16.py <sf_dir> <out_dir> <suffix> [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` per query (suffix = "before"
from the pre-optimization worktree, "after" from the current tree).
With no names, dumps every bench=True query.  Plan construction runs
whatever eager work the query's own construction requires (collect-
fold Lloyd steps, checkpoint materializations) at the given sf.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.queries import bench_queries, queries  # noqa: E402


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], Path(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:] or list(bench_queries())
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    reg = queries()
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = reg[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # keep going; record the failure
            txt = f"PLAN ERROR: {ex!r}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
