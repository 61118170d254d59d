"""Public API surface consumed by ``__spark_entry__.py`` (driver contract).

``entry`` runs the flagship query at sf0.001; ``queries`` / ``oracle_sql``
expose the full operator registry (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_test_spark import registry
from hive_test_spark.io import DEFAULT_SF_DIR
from hive_test_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    from hive_test_spark.operators.relational import pricing_summary

    return pricing_summary(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all()
    return {k: registry.QUERIES[k] for k in registry.ordered_keys()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {
        k: registry.ORACLES[k] for k in registry.ordered_keys() if k in registry.ORACLES
    }
