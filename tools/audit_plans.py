"""Audit physical plans of the headline queries: print join strategies,
scan pruning, codegen spans, exchanges — the 100 TB sanity checklist.

Usage: python tools/audit_plans.py [key ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from hive_test_spark.plans.inspect import analyze, has_pushed_filters, scan_read_columns
from hive_test_spark.session import get_spark


def main() -> None:
    from bench import HEADLINE
    from hive_test_spark.api import queries

    keys = sys.argv[1:] or HEADLINE
    qs = queries()
    spark = get_spark("hts-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    for key in keys:
        df = qs[key](spark, sf)
        f = analyze(df)
        print(
            f"{key:28s} bhj/bnlj={f.broadcast_joins} smj={f.sort_merge_joins} "
            f"cartesian={f.cartesian} codegen={f.codegen_spans} "
            f"scan_cols={scan_read_columns(f)} pushed={has_pushed_filters(f)}"
        )
        if "--full" in sys.argv:
            print(f.text)


if __name__ == "__main__":
    main()
