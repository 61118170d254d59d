"""Command-line front end: run, explain, or list any registered query.

Usage:
    python -m hive_test_spark list [substr]
    python -m hive_test_spark run <key> [--sf DIR] [--limit N] [--out PATH]
    python -m hive_test_spark explain <key> [--sf DIR] [--mode formatted]
    python -m hive_test_spark oracle <key>

``run`` prints the result as a table (or writes parquet with --out, the
distributed path — no driver collect). ``explain`` prints the physical
plan, the same artifact tools/audit_plans.py summarizes. ``oracle``
prints the key's DuckDB oracle SQL so users can eyeball the contract.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m hive_test_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered query keys")
    p_list.add_argument("substr", nargs="?", default="")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("key")
        p.add_argument("--sf", default="/root/testdata/sf0.001")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument("--out", default=None, help="write parquet here instead of printing")
        else:
            p.add_argument("--mode", default="formatted")

    p_oracle = sub.add_parser("oracle")
    p_oracle.add_argument("key")

    args = ap.parse_args(argv)

    from hive_test_spark.api import oracle_sql, queries

    qs = queries()
    if args.cmd == "list":
        oracles = oracle_sql()
        for k in sorted(qs):
            if args.substr in k:
                mark = "oracle" if k in oracles else "rows-only"
                print(f"{k}\t{mark}")
        return 0

    if args.cmd == "oracle":
        sql = oracle_sql().get(args.key)
        if sql is None:
            print(f"no oracle for {args.key!r}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    if args.key not in qs:
        print(f"unknown key {args.key!r} (try: list)", file=sys.stderr)
        return 1

    from hive_test_spark.session import get_spark

    spark = get_spark("hts-cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.key](spark, args.sf)

    if args.cmd == "explain":
        from hive_test_spark.plans.inspect import explain_str

        print(explain_str(df, args.mode))
        return 0

    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
