"""Driver-contract tests: entry smoke, registry consistency (SURVEY.md §5.2)."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
    # stable schema: all aggregate columns aliased
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_registry_consistency(registry):
    qs, oracles = registry
    assert len(qs) >= 93, f"SURVEY.md §2 inventory is 93 keys; registered {len(qs)}"
    # every oracle key must have a query
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    # rows-only keys are the documented exceptions only
    # (agg_approx_distinct graduated to a property oracle in round 4.)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "llm_near_dedup_minhash",
        "sort_within_partitions",
        "scan_tablesample",
    }, f"unexpected rows-only keys: {rows_only}"


def test_all_queries_at_sf0001(spark, registry):
    """Every registered query runs and returns a well-formed DataFrame at
    the smoke scale factor (full value verification is test_oracle)."""
    from tests.conftest import SF_DIR

    qs, _ = registry
    for key in sorted(qs):
        df = qs[key](spark, SF_DIR)
        assert df.columns, key
        assert df.count() >= 0, key


def test_python_tier_ops_from_foreign_cwd():
    """An external driver may import __spark_entry__ with cwd anywhere.
    Python-tier kernels pickle by reference, so workers must resolve
    hive_test_spark by name — tune()'s addPyFile shipping guarantees it
    (regression: ModuleNotFoundError from /tmp before the fix)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as mod\n"
        "from hive_test_spark.session import get_spark\n"
        "spark = get_spark('cwd-probe')\n"
        "qs = mod.queries()\n"
        "assert qs['udf_pandas_scalar'](spark, '/root/testdata/sf0.001').count() > 0\n"
        "assert qs['udtf_grouped_map'](spark, '/root/testdata/sf0.001').count() > 0\n"
        "print('FOREIGN_CWD_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd="/tmp", capture_output=True, text=True, timeout=300
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stderr[-2000:]


# The driver verifies exactly list(queries())[:50] per round. The planned
# window lives in registry._FRONT (round-4: the full untested llm_* suite
# + 12 evt_* keys). If an addition displaces a planned key, this fails
# LOUDLY — new keys must rank outside the window (see registry._rank), or
# be deliberately prepended to _FRONT (updating its comment).
def test_driver_window_is_the_planned_one(registry):
    from hive_test_spark.registry import _FRONT, DRIVER_FAILED

    qs, _ = registry
    assert len(_FRONT) == 50
    # Keys whose latest driver row was red auto-prepend (none expected).
    expected = list(DRIVER_FAILED) + [k for k in _FRONT if k not in DRIVER_FAILED]
    assert list(qs)[:50] == expected[:50]


# SURVEY §3.2 promises BOTH front ends (DataFrame API and SQL text).
# operators/sqlfront.py keeps SQL-text twins of flagship surfaces —
# including HiveQL-dialect constructs (LATERAL VIEW, DISTRIBUTE/SORT/
# CLUSTER BY, LEFT SEMI/ANTI JOIN, hints). This pins the count so the
# SQL parser path stays exercised as the registry grows.
def test_sql_front_end_surface(registry):
    from hive_test_spark.operators.sqlfront import SQL_FRONT_KEYS

    qs, oracles = registry
    assert len(SQL_FRONT_KEYS) >= 10
    for key in SQL_FRONT_KEYS:
        assert key in qs, key
        assert key in oracles, key  # every SQL twin is hash-oracled


def test_driver_window_spends_no_slot_on_seen_keys(registry):
    from hive_test_spark.registry import _FRONT, _NEXT_ROUNDS, DRIVER_SEEN

    qs, _ = registry
    # Every window slot goes to a never-tested key, and the r5+ queue
    # covers the rest: nothing unseen is left unscheduled except keys
    # added after the round-4 planning (which must be newer than _FRONT).
    assert not (set(_FRONT) & DRIVER_SEEN)
    assert not (set(_FRONT) & set(_NEXT_ROUNDS))
    assert not (set(_NEXT_ROUNDS) & DRIVER_SEEN)
