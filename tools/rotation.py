"""Check-rotation auditor: verifies `_CHECK_PRIORITY` against the
driver's CORRECTNESS_r*.json history.

The driver caps correctness checks at 50 queries per round, so the
head of ``queries()`` decides which registered queries get a hard
oracle signal.  The rotation policy (queries.py) promises every
query's green row stays within an ARITHMETIC freshness window: with
N registered queries, a 50/round cap and one slot reserved for the
flagship anchor, a full refresh takes ⌈(N−1)/49⌉ rounds, so the
enforceable ceiling is ⌈(N−1)/49⌉ + 1 rounds — computed here from
the live registry, not hard-coded (the r06 fixed "≤2 rounds" promise
became impossible at 154 queries and made every audit cry wolf).
This tool makes the policy auditable and the next round's head
mechanical:

    python tools/rotation.py            # audit + recommended next head

It reports, for the CURRENT priority order:
  - queries that have NEVER had a driver row (must go first);
  - queries whose latest green row is older than the policy window;
  - any name in _CHECK_PRIORITY that is not a registered query
    (queries.py raises on this too — here it's a readable report);
  - the recommended next-round head: never-checked first, then
    cohorts oldest-round-first, flagship anchor last, capped at 50.

Governance rule (r12 verdict item 8, encoded r13): a query whose
implementation was REFACTORED after its last driver check sorts with
the never-checked cohort — its old green row certifies code that no
longer exists.  Refactors are declared in tools/refresh_queue.txt
(`<name> <round>`); an entry is live until the driver's latest row
for that query is from <round> or later, then expires automatically.
Perf refactors MUST add a queue line in the same commit (the r12
precedent — six hand-promoted dedup queries — is now the rule).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAP = 50


def max_age_rounds(n_registered: int) -> int:
    """Enforceable freshness ceiling for the live registry size.

    One of the CAP slots is the flagship anchor (re-checked every
    round), so rotation capacity is CAP−1 queries/round; a full pass
    over the other N−1 queries takes ⌈(N−1)/(CAP−1)⌉ rounds, and a
    query checked in round r is next reachable at worst that many
    rounds later — +1 round of slack for red-row re-checks and new
    registrations jumping the queue."""
    full_pass = -(-(n_registered - 1) // (CAP - 1))  # ceil division
    return full_pass + 1


def load_history() -> dict[str, int]:
    """query name → latest round with a driver CORRECTNESS row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def load_refresh_queue() -> dict[str, int]:
    """query name → round its implementation was refactored in.

    Parsed from tools/refresh_queue.txt; unknown names are reported by
    the caller (a typo here silently loses the re-check priority)."""
    path = os.path.join(REPO, "tools", "refresh_queue.txt")
    queue: dict[str, int] = {}
    if not os.path.exists(path):
        return queue
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            name, rnd = line.rsplit(None, 1)
            queue[name] = max(queue.get(name, 0), int(rnd))
    return queue


def main() -> int:
    sys.path.insert(0, REPO)
    from square_etl_spark.queries import _CHECK_PRIORITY, registry

    specs = registry()
    names = [spec.name for spec in specs]
    # hard invariants the r11 review caught drifting: the head must be
    # EXACTLY the driver's 50-query cap with the flagship anchor in
    # the last slot — a 51st entry silently pushes the anchor out
    if len(_CHECK_PRIORITY) != CAP:
        print(f"FAIL: _CHECK_PRIORITY has {len(_CHECK_PRIORITY)} entries, cap is {CAP}")
        return 1
    if _CHECK_PRIORITY[-1] != "flagship_star_revenue":
        print("FAIL: flagship anchor is not the last head slot")
        return 1
    if len(set(_CHECK_PRIORITY)) != len(_CHECK_PRIORITY):
        print("FAIL: duplicate names in _CHECK_PRIORITY")
        return 1
    has_oracle = {spec.name: spec.oracle is not None for spec in specs}
    latest = load_history()
    current_round = max(latest.values(), default=0)

    # refresh queue: declared refactors not yet re-checked by the
    # driver sort as never-checked (cohort 0)
    queue = load_refresh_queue()
    queue_unknown = sorted(n for n in queue if n not in set(names))
    live_refresh = sorted(
        n for n, rnd in queue.items()
        if n in set(names) and latest.get(n, 0) < rnd
    )

    window = max_age_rounds(len(names))
    unknown = [n for n in _CHECK_PRIORITY if n not in set(names)]
    never = [n for n in names if n not in latest]
    # assume the upcoming driver run checks the current head
    head_now = set(names[:CAP])
    stale = sorted(
        (n for n, r in latest.items()
         if n in set(names) and n not in head_now
         and current_round + 1 - r > window),
        key=lambda n: latest[n],
    )
    # the freshness window is the policy for ORACLE-checked queries;
    # rows-only rows are a weaker signal and age without violating it
    stale_oracle = [n for n in stale if has_oracle[n]]
    stale_rows_only = [n for n in stale if not has_oracle[n]]

    print(f"registered queries : {len(names)}")
    print(f"driver rounds seen : {current_round}")
    print(f"freshness window   : {window} rounds (= ceil({len(names)-1}/{CAP-1}) + 1, from live registry)")
    print(f"head (first {CAP})   : checked next round")
    print(f"never checked      : {[n for n in never if n not in head_now] or 'none outside head'}")
    print(f"refresh queue live : {live_refresh or 'none'}")
    if unknown:
        print(f"UNKNOWN in priority: {unknown}")
    if queue_unknown:
        print(f"UNKNOWN in refresh_queue.txt: {queue_unknown}")
    if stale_oracle:
        print(f"POLICY VIOLATION — oracle-checked queries aging past the {window}-round window:")
        for n in stale_oracle:
            print(f"  {n}  (last green r{latest[n]:02d})")
    else:
        print("rotation healthy: no oracle-checked query ages past the window")
    if stale_rows_only:
        print("info: rows-only rows older than the window (weaker signal, allowed):")
        for n in stale_rows_only:
            print(f"  {n}  (last row r{latest[n]:02d})")

    # a never-checked query left OUT of the head while head slots are
    # occupied by already-green queries = a whole round of contract
    # evidence silently deferred (the late-r09 stale-head failure mode:
    # the head froze early-round and later registrations never made it
    # in).  Fail loudly — refreshing the head is one list edit.
    never_outside = [n for n in never if n not in head_now]
    displaced = [
        n for n in head_now
        if n in latest and n != "flagship_star_revenue"
    ]
    head_stale = bool(never_outside) and bool(displaced)
    if head_stale:
        print(
            "POLICY VIOLATION — never-checked queries outside the head "
            f"while {len(displaced)} already-green queries hold slots: "
            f"{never_outside}\n  fix: refresh _CHECK_PRIORITY to the "
            "recommended head below"
        )

    # live refresh entries outside the upcoming head defer the re-check
    # of refactored code a full rotation cycle — same severity as a
    # never-checked query left out (the rule this tool encodes)
    refresh_outside = [n for n in live_refresh if n not in head_now]
    if refresh_outside and displaced:
        print(
            "POLICY VIOLATION — refresh-queue (refactored) queries outside "
            f"the head while already-green queries hold slots: "
            f"{refresh_outside}\n  fix: refresh _CHECK_PRIORITY to the "
            "recommended head below"
        )

    # recommended next head: never-checked/refactored → oldest cohort
    # → … → anchor
    cohorts: dict[int, list[str]] = {}
    for n in names:
        if n == "flagship_star_revenue":
            continue
        rnd = 0 if n in set(live_refresh) else latest.get(n, 0)
        cohorts.setdefault(rnd, []).append(n)
    rec: list[str] = []
    for rnd in sorted(cohorts):  # 0 = never checked, then oldest rounds
        rec.extend(cohorts[rnd])
    rec = rec[: CAP - 1] + ["flagship_star_revenue"]
    print(f"\nrecommended NEXT head ({CAP} incl. anchor, oldest-first):")
    for n in rec:
        tag = "" if has_oracle[n] else "  [rows-only]"
        print(f"  {n}  (last r{latest.get(n, 0):02d}){tag}")
    return 1 if (
        unknown or queue_unknown or stale_oracle or head_stale
        or (refresh_outside and displaced)
    ) else 0


if __name__ == "__main__":
    raise SystemExit(main())
