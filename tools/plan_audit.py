"""Plan audit: one-line physical-plan summary for EVERY registered
query — the scale review, mechanized.

For each query the tool builds the DataFrame at a small sf and reads
the physical plan (no execution beyond what plan construction itself
requires — the iterative CC operators checkpoint eagerly), counting
the structures that decide 100 TB behavior:

- scans        parquet FileScans (recompute smell when one logical
               source appears more times than the algorithm needs)
- exch         shuffle Exchanges (each is a full network pass)
- bcast        broadcast Exchanges (small sides staying off the wire)
- joins        join nodes by strategy (BHJ/SMJ/SHJ/BNLJ)
- py           row-at-a-time Python nodes (BatchEvalPython — should
               be ZERO everywhere; Arrow nodes are listed separately)
- arrow        Arrow-batched Python stages (mapInPandas etc. — the
               sanctioned escape hatch)
- wsc          whole-stage-codegen spans
- pf           FileScans carrying a NON-EMPTY PartitionFilters list —
               partition pruning reaching the scan (the stored-index
               probe queries' load-bearing property: only the probed
               cells' directories are read)
- gw           single-partition WINDOW Exchanges (all rows to one
               task; must be 0 unless the registry carries an explicit
               bounded-input justification via global_window_ok)
- flags        CARTESIAN if any CartesianProduct appears

Usage: python tools/plan_audit.py [sf_dir] [out_md]
Writes a markdown table (default PLAN_AUDIT.md) and prints totals.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.queries import registry  # noqa: E402


def count_global_windows(plan: str) -> int:
    """Single-partition Exchanges CAUSED BY a window (not a global
    aggregate): an ``Exchange SinglePartition`` whose few-lines-up
    ancestry is a Window/WindowGroupLimit (+ its required Sort).
    These move ALL rows to one task — fine only when the input is
    bounded by construction (a justification the registry must carry
    via QuerySpec.global_window_ok)."""
    lines = plan.splitlines()
    n = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for back in lines[max(0, i - 3):i]:
            if "Window" in back:  # WindowExec or WindowGroupLimit
                n += 1
                break
    return n


def summarize(plan: str) -> dict:
    return {
        "gw": count_global_windows(plan),
        "scans": plan.count("FileScan"),
        "exch": len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobin|\bExchange SinglePartition", plan)),
        "bcast": plan.count("BroadcastExchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "py": plan.count("BatchEvalPython"),
        "arrow": plan.count("ArrowEvalPython") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        # DISTINCT span ids: "*(3)" prefixes every operator inside
        # codegen span 3, so counting occurrences would report operator
        # counts, not spans (r06 review)
        "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # scans where partition pruning actually reached the reader:
        # a non-empty PartitionFilters bracket on a FileScan
        "pf": len(re.findall(r"PartitionFilters: \[[^\]]", plan)),
        "cartesian": plan.count("CartesianProduct"),
    }


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out = Path(args[1] if len(args) > 1 else
               Path(__file__).resolve().parent.parent / "PLAN_AUDIT.md")

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows, totals = [], {"py": 0, "cartesian": 0, "gw": 0, "errors": 0}
    for spec in registry():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            s = summarize(plan)
        except Exception as exc:  # noqa: BLE001
            rows.append((spec.name, None, f"ERROR: {exc}"))
            totals["errors"] += 1
            continue
        totals["py"] += s["py"]
        totals["cartesian"] += s["cartesian"]
        flags = []
        if s["py"]:
            flags.append("PYTHON-ROW")
        if s["cartesian"]:
            flags.append("CARTESIAN")
        if s["gw"]:
            if spec.global_window_ok:
                flags.append(f"gw-ok({spec.global_window_ok})")
            else:
                # unjustified single-partition window = audit failure
                flags.append("GLOBAL-WINDOW")
                totals["gw"] += 1
        rows.append((spec.name, s, ",".join(flags) or ""))

    lines = [
        "# PLAN AUDIT — physical-plan summary per registered query",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`.  Every row is",
        "the executed-plan structure Catalyst chose for the query as",
        "registered; `py` (row-at-a-time Python) must be 0 everywhere,",
        "Arrow stages are the sanctioned Python escape hatch, and any",
        "CARTESIAN flag is a scale bug.  Plan-shape regressions show up",
        "here as diffs.",
        "",
        "| query | scans | exch | bcast | joins | py | arrow | wsc | pf | gw | flags |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if r[1] is None:
            lines.append(
                f"| {r[0]} | — | — | — | — | — | — | — | — | — | {r[2]} |"
            )
            continue
        name, s, flags = r[0], r[1], r[2]
        joins = "/".join(
            f"{s[k]} {k}" for k in ("bhj", "smj", "shj", "bnlj") if s[k]
        ) or "—"
        lines.append(
            f"| {name} | {s['scans']} | {s['exch']} | {s['bcast']} | {joins}"
            f" | {s['py']} | {s['arrow']} | {s['wsc']} | {s['pf']}"
            f" | {s['gw']} | {flags} |"
        )
    lines += [
        "",
        f"**Totals: {len(rows)} queries audited; row-at-a-time Python"
        f" nodes = {totals['py']}; Cartesian products ="
        f" {totals['cartesian']}; unjustified global-order windows ="
        f" {totals['gw']}; plan-construction errors ="
        f" {totals['errors']}.**",
        "",
    ]
    out.write_text("\n".join(lines))
    print(f"wrote {out}: {len(rows)} queries, py={totals['py']}, "
          f"cartesian={totals['cartesian']}, gw={totals['gw']}, "
          f"errors={totals['errors']}")
    # an errored query was never plan-checked — that is a FAILED audit,
    # not a green one (r06 review)
    return (
        0
        if (totals["py"] == 0 and totals["cartesian"] == 0
            and totals["gw"] == 0 and totals["errors"] == 0)
        else 1
    )


if __name__ == "__main__":
    sys.exit(main())
