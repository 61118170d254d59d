"""Operator registry: the single source of truth behind ``queries()`` /
``oracle_sql()`` in ``__spark_entry__.py``.

Every operator module registers its query functions here via the
``@register(key, oracle=...)`` decorator. A registered function has
signature ``(spark, sf_dir) -> DataFrame`` and must alias every computed
column identically to its oracle SQL (driver hash-compares by column
name — SURVEY.md §5.3).

``oracle=None`` ⇒ rows-only check (approx/streaming/partition-local ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    from hive_test_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        dml,
        extras,
        joins,
        profiling,
        relational,
        scale,
        setops,
        sorts,
        subqueries,
        windows,
    )
    from hive_test_spark.sources import scans, sinks  # noqa: F401
    from hive_test_spark.functions import lateral, scalar, udfs  # noqa: F401
    from hive_test_spark.streaming import batch_twins, live  # noqa: F401
    from hive_test_spark.llm import dedup, multimodal, pipeline, similarity, text  # noqa: F401
