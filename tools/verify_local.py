"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (exact for non-floats; exact-then-tolerant for
floats, flagging any non-bitwise match so rounding can be added).

Usage:
    python tools/verify_local.py [--sf /root/testdata/sf0.01] [key ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from hive_test_spark.io import TABLES, table_path
from hive_test_spark.session import get_spark


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_cell(v):
    """Canonicalize one cell for order-insensitive compare."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.floor("us").isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def _float_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isinf(a) or math.isinf(b):
            return a == b
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return False


def rows_equal(a: tuple, b: tuple) -> tuple[bool, bool]:
    """(equal, bitwise) — equal allows float tolerance."""
    if len(a) != len(b):
        return False, False
    bitwise = True
    for x, y in zip(a, b):
        if isinstance(x, tuple) and isinstance(y, tuple):
            eq, bw = rows_equal(x, y)
            if not eq:
                return False, False
            bitwise = bitwise and bw
            continue
        if x == y:
            continue
        if _float_close(x, y):
            bitwise = False
            continue
        return False, False
    return True, bitwise


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    res = {"key": name, "ok": False, "bitwise": True, "notes": []}
    if len(spark_pdf) != len(duck_pdf):
        res["notes"].append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return res
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        res["notes"].append(f"columns spark={sc} duck={dc}")
        return res
    a, b = canon_df(spark_pdf), canon_df(duck_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        eq, bw = rows_equal(ra, rb)
        if not eq:
            res["notes"].append(f"row {i} differs:\n  spark={ra}\n  duck ={rb}")
            if len(res["notes"]) > 3:
                break
            continue
        res["bitwise"] = res["bitwise"] and bw
    if not any(n.startswith("row ") for n in res["notes"]):
        res["ok"] = True
        if not res["bitwise"]:
            res["notes"].append("float-tolerant match only (add rounding?)")
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
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
            sdf = qs[key](spark, args.sf)
            spark_pdf = sdf.toPandas()
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
        if r["ok"]:
            n_ok += 1
            flag = "ok" if r["bitwise"] else "~ok"
            print(f"{flag} {key}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            for n in r["notes"]:
                print(f"     note: {n}")
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
