"""Scale-technique operator tests: bucketed SMB join is shuffle-free,
salting preserves semantics, TABLESAMPLE is bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_test_spark.plans.inspect import analyze
from tests.conftest import SF_DIR


def test_bucketed_smb_join_has_no_join_shuffle(spark, registry):
    qs, _ = registry
    df = qs["join_bucketed_smb"](spark, SF_DIR)
    f = analyze(df)
    assert f.sort_merge_joins == 1
    # the only exchange allowed is the final groupBy — the join itself
    # must consume bucket layout directly
    assert f.exchanges <= 1, f"bucketed join should not shuffle:\n{f.text}"


def test_salted_join_equals_plain_join(spark, registry):
    from hive_test_spark.io import load_table

    qs, _ = registry
    salted = {
        (r["n_name"], r["n_customers"]) for r in qs["join_skew_salted"](spark, SF_DIR).collect()
    }
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    plain = {
        (r["n_name"], r["n_customers"])
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .collect()
    }
    assert salted == plain


def test_tablesample_bounds(spark, registry):
    from hive_test_spark.io import load_table

    qs, _ = registry
    sampled = (
        qs["scan_tablesample"](spark, SF_DIR).agg(F.sum("sampled_rows")).collect()[0][0]
    )
    total = load_table(spark, SF_DIR, "lineitem").count()
    assert 0.05 * total < sampled < 0.2 * total  # 10% Bernoulli, generous bounds
