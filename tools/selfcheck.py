"""Self-check harness: mimic the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
scale factor and compares row count, column names, and an
order-insensitive value hash (values canonicalized: floats rounded to
9 significant-ish decimals, timestamps to ISO strings).  Stricter than
necessary is fine — if this passes, the driver's check should too.

Driver-faithful since r06: the oracle side is fetched via ``.df()``
(pandas) rather than ``fetchall()``, so arrow/pandas type coercion —
e.g. DuckDB HUGEINT → float64, which silently rounds values > 2^53 —
is applied here exactly as the driver applies it.  ``fetchall()``
returned exact Python ints and let the r05 ``text_fingerprint``
HUGEINT oracle ship selfcheck-green but driver-red.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
       python tools/selfcheck.py [sf_dir] --head   # exactly the
       driver's 50-query check head (the registry's first 50) — the
       fast "what will the driver see this round" gate
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from square_etl_spark import get_spark  # noqa: E402
from square_etl_spark.queries import registry  # noqa: E402


def _from_pandas(v):
    """Normalize pandas null sentinels (NaN/NaT/NA) back to None so a
    SQL NULL hashes as ∅ on both sides; leave every other value — in
    particular float64s produced by HUGEINT coercion — untouched.

    Known approximation (r06 review): a GENUINE NaN in an oracle
    double column is indistinguishable from NULL after the pandas
    fetch and normalizes to ∅ here, while a Spark-side NaN
    canonicalizes as 'nan' — so an oracle that can emit NaN (0/0 in a
    ratio) could selfcheck differently than it drivers.  Registry
    policy therefore: oracles must not emit NaN — guard ratio
    denominators (the corr/outlier/retention queries all do)."""
    if v is None:
        return None
    try:
        import pandas as pd

        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass  # array-valued cell: pd.isna is elementwise, keep as-is
    return v


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision: the engine aims for bit-identical doubles via
        # decimal-intermediate sums, so canonicalization must not hide
        # last-ulp differences the driver's hash would catch.
        return f"{v:.17g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a and a != "--head")
    if "--head" in args:
        from square_etl_spark.queries import registry as _reg

        only |= {spec.name for spec in _reg()[:50]}

    # NaN-guard lint first (tools/oracle_lint.py): the comparison below
    # cannot tell an oracle NaN from NULL after the pandas fetch, so an
    # unguarded 0/0 in an oracle is a latent false-green — fail fast.
    from oracle_lint import lint_registry

    lint_bad = lint_registry()
    for qname, fnds in lint_bad.items():
        for f in fnds:
            print(f"LINT  {qname}: {f}")

    # forced-broadcast justification lint (tools/broadcast_lint.py):
    # every F.broadcast() in non-test source needs a bounded-input
    # pragma — an unjustified hint is a latent OOM at scale.
    import broadcast_lint

    bcast_bad = broadcast_lint.main() != 0

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = []
    for spec in registry():
        if only and spec.name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {spec.name}: spark error: {exc}")
            failures.append(spec.name)
            continue
        if spec.oracle is None:
            print(f"ok?   {spec.name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0 and spec.name not in ():
                print(f"      note: empty result")
            continue
        try:
            # .df() (not fetchall) so pandas/arrow coercion — HUGEINT →
            # float64, DATE → Timestamp — hits the oracle values exactly
            # as it does in the driver's comparison path.
            cur = con.execute(spec.oracle)
            date_cols = {d[0] for d in cur.description if d[1] == "Date"}
            odf = cur.df()
            ocols = list(odf.columns)
            # .df() widens DATE to midnight Timestamp; fold it back so a
            # SQL DATE canonicalizes like Spark's datetime.date (the
            # driver compares these green, so this is not a real skew).
            for c in date_cols:
                odf[c] = odf[c].dt.date
            orows = [
                tuple(_from_pandas(v) for v in r)
                for r in odf.itertuples(index=False, name=None)
            ]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {spec.name}: oracle error: {exc}")
            failures.append(spec.name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        else:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
        if problems:
            print(f"FAIL  {spec.name}: {'; '.join(problems)}")
            failures.append(spec.name)
            # show a tiny diff sample
            sset = {
                "|".join(canon(v) for v in r) for r in srows[:100000]
            }
            oset = {
                "|".join(canon(v) for v in r) for r in orows[:100000]
            }
            for line in list(sset - oset)[:3]:
                print(f"      spark-only: {line[:160]}")
            for line in list(oset - sset)[:3]:
                print(f"      oracle-only: {line[:160]}")
        else:
            print(f"PASS  {spec.name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    failures.extend(f"lint:{q}" for q in lint_bad)
    if bcast_bad:
        failures.append("lint:forced-broadcast")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
