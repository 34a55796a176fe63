"""Oracle NaN-guard lint: no unguarded division denominators.

The selfcheck/driver comparison cannot distinguish a genuine NaN in an
oracle double column from NULL after the pandas fetch (documented in
tools/selfcheck.py), so registry policy says oracles must never emit
NaN — every ratio denominator must be guarded.  This lint enforces the
policy mechanically instead of by convention (the r06 advice found
three unguarded ratios that shipped under the convention).

Rule: every `/` or `//` denominator in every oracle must be one of
  - a numeric literal;
  - `NULLIF(...)` (the canonical guard — 0 becomes NULL, never NaN);
  - `COUNT(*)` (a grouped COUNT(*) is ≥ 1 by construction);
  - `(CASE WHEN ...` (an inline-guarded denominator expression);
  - annotated `/*nz: <reason>*/` — positive-by-construction, with the
    reason stated at the site (e.g. a Jaccard union of nonempty sets,
    a PageRank out-degree from a grouped edge count).  An empty reason
    fails the lint: the annotation is a justification, not a mute.

Single-quoted strings and `--` comments are stripped before scanning
(SQL text may legitimately contain slashes).

Usage: python tools/oracle_lint.py            # lint all oracles
Wired into tools/selfcheck.py — a finding fails the whole selfcheck.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_STRINGS = re.compile(r"'(?:[^']|'')*'")
_LINE_COMMENTS = re.compile(r"--[^\n]*")
#: nz annotations are folded to a sentinel token BEFORE division
#: scanning — their closing `*/` would otherwise read as a division
_NZ = re.compile(r"/\*nz:(.*?)\*/", re.DOTALL)
_DIV = re.compile(
    r"(?<![/])/{1,2}(?!/)\s*"
    r"(@NZOK@|@NZEMPTY@|[A-Za-z_][A-Za-z_0-9.]*\s*\(\s*\*?"
    r"|[A-Za-z_][A-Za-z_0-9.]*|\(\s*CASE\s+WHEN|\(|[0-9][0-9.]*)",
    re.IGNORECASE,
)


def lint_oracle(sql: str) -> list[str]:
    """Return a list of findings (context snippets); empty = clean."""
    s = _LINE_COMMENTS.sub("", _STRINGS.sub("''", sql))
    s = _NZ.sub(
        lambda m: "@NZOK@" if m.group(1).strip() else "@NZEMPTY@", s
    )
    findings = []
    for m in _DIV.finditer(s):
        d = m.group(1).strip()
        if re.fullmatch(r"[0-9][0-9.]*", d):
            continue  # literal
        if d == "@NZOK@":
            continue  # annotated positive-by-construction, with reason
        u = re.sub(r"\s+", "", d.upper())
        if u.startswith("NULLIF(") or u.startswith("COUNT(*"):
            continue
        if u.startswith("(CASEWHEN"):
            continue  # inline-guarded denominator
        label = (
            "empty /*nz:*/ reason"
            if d == "@NZEMPTY@"
            else f"unguarded denominator `{d}`"
        )
        findings.append(
            label
            + " at …"
            + s[max(0, m.start() - 50):m.end() + 30].replace("\n", " ")
            + "…"
        )
    return findings


def lint_registry() -> dict[str, list[str]]:
    from square_etl_spark.queries import registry

    out: dict[str, list[str]] = {}
    for spec in registry():
        if spec.oracle is None:
            continue
        f = lint_oracle(spec.oracle)
        if f:
            out[spec.name] = f
    return out


def main() -> int:
    from square_etl_spark.queries import registry

    scanned = sum(1 for spec in registry() if spec.oracle is not None)
    bad = lint_registry()
    for name, findings in bad.items():
        for f in findings:
            print(f"LINT  {name}: {f}")
    n = sum(len(v) for v in bad.values())
    # r07 verdict: "0 findings in 0 queries" read as "scanned nothing" —
    # always state the denominator so healthy output looks healthy
    print(
        f"{n} oracle NaN-guard findings in {scanned} oracles scanned"
        f" ({len(bad)} queries with findings)"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
