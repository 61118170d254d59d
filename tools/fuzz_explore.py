"""One-off fuzz EXPLORATION over the differential grammars.

The pytest fuzz suite runs ``derandomize=True`` — a fixed example set,
deliberately a regression net. This tool re-runs every grammar with
FRESH random examples (no derandomization, no example database) to hunt
cross-engine divergences the pinned set misses. Any falsifying example
it prints should be (a) fixed if it's a wiring bug, and (b) promoted to
an ``@example`` pin in tests/test_differential_fuzz.py either way.

Usage:
    python tools/fuzz_explore.py [examples_per_grammar] [grammar_substr]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hypothesis import HealthCheck, given, seed, settings  # noqa: E402

import tests.test_differential_fuzz as G  # noqa: E402
from hive_test_spark.oracle import compare, duck_connect  # noqa: E402
from hive_test_spark.session import get_spark  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402

# (name, strategy factory, spark renderer, sql renderer)
GRAMMARS = [
    ("query", G.query_specs, G._render_df, G._render_sql),
    ("join", G.join_specs, G._join_df, G._join_sql),
    ("window", G.window_specs, G._win_df, G._win_sql),
    ("grouping", G.grouping_specs, G._grouping_df, G._grouping_sql),
    ("setop", G.setop_specs, G._setop_df, G._setop_sql),
    ("subquery", G.subquery_specs, G._subq_df, G._subq_sql),
    ("scalar", G.scalar_specs, G._scalar_df, G._scalar_sql),
    ("date_expr", G.date_specs, G._date_df, G._date_sql),
    ("array", G.array_specs, G._array_df, G._array_sql),
    ("win_frame", G.frame_specs, G._frame_df, G._frame_sql),
    ("string", G.string_specs, G._string_df, G._string_sql),
    ("filter_agg", G.filter_agg_specs, G._fagg_df, G._fagg_sql),
    ("join_window", G.join_window_specs, G._join_win_df, G._join_win_sql),
    ("nested_agg", G.nested_agg_specs, G._nested_df, G._nested_sql),
    ("range_frame", G.range_frame_specs, G._range_df, G._range_sql),
    ("date_chain", G.date_chain_specs, G._date_chain_df, G._date_chain_sql),
    ("null_order", G.null_order_specs, G._null_order_df, G._null_order_sql),
    ("decimal", G.decimal_specs, G._decimal_df, G._decimal_sql),
    ("pattern", G.pattern_specs, G._pattern_df, G._pattern_sql),
    ("ordered_agg", G.ordered_agg_specs, G._ordered_agg_df, G._ordered_agg_sql),
    ("cond", G.cond_specs, G._cond_df, G._cond_sql),
    ("percentile", G.percentile_specs, G._pct_df, G._pct_sql),
    ("hof_window", G.hofwin_specs, G._hofwin_df, G._hofwin_sql),
    ("rank_stat", G.rank_stat_specs, G._rank_stat_df, G._rank_stat_sql),
    ("graph_deriv", G.graph_deriv_specs, G._graph_deriv_df, G._graph_deriv_sql),
    ("transition", G.transition_specs, G._transition_df, G._transition_sql),
    ("cohort_grid", G.cohort_specs, G._cohort_df, G._cohort_sql),
    ("funnel", G.funnel_specs, G._funnel_df, G._funnel_sql),
    ("poisson_boot", G.poisson_boot_specs, G._pboot_df, G._pboot_sql),
    ("hash_bucket", G.hash_bucket_specs, G._hash_bucket_df, G._hash_bucket_sql),
    ("cosine_fast", G.cosine_fastpath_specs, G._cosfp_df, G._cosfp_sql),
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("hts-fuzz-explore")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duck_connect(SF_DIR)
    failures: list[tuple[str, object]] = []
    for name, specs, df_fn, sql_fn in GRAMMARS:
        if only and only not in name:
            continue
        t0 = time.time()

        @settings(
            max_examples=n,
            deadline=None,
            derandomize=False,
            database=None,
            suppress_health_check=list(HealthCheck),
        )
        @seed(int(time.time()))
        @given(spec=specs())
        def probe(spec):
            r = compare(name, df_fn(spark, spec).toPandas(), duck.execute(sql_fn(spec)).df())
            assert r["ok"], f"{name}: spec={spec}\nsql={sql_fn(spec)}\nnotes={r['notes']}"

        try:
            probe()
            print(f"ok   {name:12s} {n} fresh examples ({time.time() - t0:.1f}s)")
        except AssertionError as e:
            failures.append((name, e))
            print(f"FAIL {name}: {e}")
    print(f"\n== {len(failures)} diverging grammar(s) of {len([g for g in GRAMMARS if not only or only in g[0]])}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
