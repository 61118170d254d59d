"""Oracle E2E: every hash-verifiable operator matches DuckDB at sf0.001
(the driver runs the same comparison at sf0.01 — SURVEY.md §5.4)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _keys():
    from hive_test_spark.api import oracle_sql

    return sorted(oracle_sql())


@pytest.mark.parametrize("key", _keys())
def test_oracle_match(spark, duck, registry, key):
    from hive_test_spark.oracle import compare

    qs, oracles = registry
    spark_pdf = qs[key](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(oracles[key]).df()
    res = compare(key, spark_pdf, duck_pdf)
    assert res["ok"], f"{key}: {res['notes']}"
