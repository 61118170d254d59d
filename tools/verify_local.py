"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir and compares via hive_test_spark.oracle.

Usage:
    python tools/verify_local.py [--sf /root/testdata/sf0.01] [key ...]

A float-tolerant-only match (``~ok``) is a FAILURE by default: the
driver's gate is an order-insensitive VALUE HASH, so a key that matches
only within 1e-9 tolerance is a latent driver-red row — exactly how
evt_granger and join_shuffle_hash shipped red in round 10 while the
close-sweep counted their ``~ok`` as green. Pass ``--tolerant`` only
for exploratory runs that are not gating a driver exposure.
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, ".")

from hive_test_spark.oracle import compare, duck_connect
from hive_test_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--tolerant",
        action="store_true",
        help="count float-tolerant-only (~ok) matches as passing "
        "(default: ~ok is a FAIL — it is a latent driver hash-red row)",
    )
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from hive_test_spark.api import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    keys = args.keys or sorted(qs)
    spark = get_spark("verify-local")
    con = duck_connect(args.sf)

    n_ok = n_fail = n_rows_only = 0
    failures = []
    for key in keys:
        if key not in qs:
            print(f"?? {key}: not registered")
            continue
        t0 = time.time()
        try:
            spark_pdf = qs[key](spark, args.sf).toPandas()
        except Exception:
            print(f"XX {key}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(key)
            continue
        if key not in oracles:
            n_rows_only += 1
            print(f"-- {key}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[key]).df()
        except Exception:
            print(f"XX {key}: DUCKDB ERROR\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(key)
            continue
        r = compare(key, spark_pdf, duck_pdf)
        if r["ok"] and (r["bitwise"] or args.tolerant):
            n_ok += 1
            flag = "ok" if r["bitwise"] else "~ok"
            print(f"{flag} {key}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            for n in r["notes"]:
                print(f"     note: {n}")
        elif r["ok"]:
            n_fail += 1
            failures.append(key)
            print(f"XX {key}: ~ok = latent driver hash-red (float-tolerant only)")
            for n in r["notes"]:
                print(f"     {n}")
        else:
            n_fail += 1
            failures.append(key)
            print(f"XX {key}: MISMATCH")
            for n in r["notes"]:
                print(f"     {n}")
    print(f"\n== {n_ok} ok, {n_rows_only} rows-only, {n_fail} fail of {len(keys)}")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
