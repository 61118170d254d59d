"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt (optimization-round evidence).

Usage:
    python tools/capture_plans.py --tag r12 --suffix before [key ...]

Defaults to the bench headline + extended set when no keys are given.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

from hive_test_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import bench
    from hive_test_spark.api import queries

    keys = args.keys or (bench.HEADLINE + bench.EXTENDED)
    qs = queries()
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = qs[key](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
