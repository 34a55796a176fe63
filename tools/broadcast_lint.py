"""Forced-broadcast lint: every `F.broadcast(...)` in non-test source
must carry an explicit bounded-input justification.

The r07 verdict's rule (the same justification discipline the plan
audit's `gw` column enforces for single-partition windows): a FORCED
broadcast hint overrides Spark's size statistics, so it is only safe
over relations bounded BY CONSTRUCTION — singleton aggregates, k×d
centroid tables, ≤256-row shard-offset maps, constant LUTs, capped
hot-key lists.  A hint over a corpus- or SF-linear relation is a
latent OOM at exactly the scale the operator is advertised for (the
r07 finding: the LM scorers broadcast the distinct-bigram table,
which is corpus-linear — now size-gated in operators/text.py).

Mechanics: each source line containing ``F.broadcast(`` must have a
``# bcast-ok: <why bounded>`` pragma on the same line or within the
3 preceding lines.  Relations that are NOT bounded by construction
must not be hinted at all — drop the hint and let the size-stat
planner / AQE decide (autoBroadcastJoinThreshold), or size-gate it
like ``text._gated_model_join``.

Usage: python tools/broadcast_lint.py        # exit 1 on violations
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "square_etl_spark"
PRAGMA = re.compile(r"#\s*bcast-ok:\s*(\S.*)")
SITE = re.compile(r"\bF\.broadcast\(")


def main() -> int:
    files = sorted(SRC.rglob("*.py"))
    sites = justified = 0
    bad: list[tuple[str, int, str]] = []
    for path in files:
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            m = SITE.search(line)
            if not m:
                continue
            hash_pos = line.find("#")
            if 0 <= hash_pos < m.start():  # mention inside a comment
                continue
            sites += 1
            window = lines[max(0, i - 3): i + 1]
            if any(PRAGMA.search(l) for l in window):
                justified += 1
            else:
                bad.append((str(path.relative_to(REPO)), i + 1, line.strip()))
    print(
        f"broadcast lint: {len(files)} files scanned, {sites} forced-"
        f"broadcast sites: {justified} justified, {len(bad)} unjustified"
    )
    for f, n, text in bad:
        print(f"  UNJUSTIFIED  {f}:{n}  {text[:90]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
