"""Reshape + data-quality profiling operators.

``agg_unpivot`` is the inverse of ``agg_pivot`` (Hive expresses it as a
``stack``/UNION ALL — SURVEY.md §2.H lists ``stack`` as the UDTF surface);
``dq_audit`` is the per-column profile a curation pipeline runs before
training-data ingest: one pass over the table, one output row per audited
column. Both are pure built-in compositions with full DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


@register(
    "agg_unpivot",
    """
    SELECT p_partkey, 'p_size' AS metric,
           ROUND(CAST(p_size AS DOUBLE), 6) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric,
           ROUND(CAST(p_retailprice AS DOUBLE), 6) AS value
    FROM part
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide numeric columns to long (key, metric, value)
    form — the inverse of ``agg_pivot`` and the Hive ``stack()`` idiom.
    Spark's native ``DataFrame.unpivot`` is a narrow (map-only) transform:
    no shuffle, output rows = n_rows × n_metrics, so at 100 TB it streams
    — the only cost is the row-count multiplier, which downstream
    aggregations absorb map-side."""
    tune(spark)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_size").cast("double"), 6).alias("p_size"),
        F.round(F.col("p_retailprice").cast("double"), 6).alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# (column, min/max string representation) — min/max are computed on NATIVE
# values (never on the string form: "100.00" < "99.00" lexicographically)
# and rendered afterwards. Dates render via DATE (timezone-stable); doubles
# via DECIMAL(18,2) (identical text in Spark and DuckDB — raw double→string
# diverges at ≥1e7 where Java switches to scientific notation).
_IDENT: Callable[[Column], Column] = lambda c: c.cast("string")  # noqa: E731
_DQ_COLS: list[tuple[str, Callable[[Column], Column]]] = [
    ("o_orderstatus", _IDENT),
    ("o_orderpriority", _IDENT),
    ("o_orderdate", lambda c: c.cast("date").cast("string")),
    ("o_totalprice", lambda c: c.cast("decimal(18,2)").cast("string")),
]

_DQ_ORACLE_PARTS = []
for _name, _repr_sql in [
    ("o_orderstatus", "CAST({m} AS VARCHAR)"),
    ("o_orderpriority", "CAST({m} AS VARCHAR)"),
    ("o_orderdate", "CAST(CAST({m} AS DATE) AS VARCHAR)"),
    ("o_totalprice", "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)"),
]:
    _DQ_ORACLE_PARTS.append(
        f"""
        SELECT '{_name}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({_name}) AS n_nulls,
               COUNT(DISTINCT {_name}) AS n_distinct,
               {_repr_sql.format(m=f"MIN({_name})")} AS min_repr,
               {_repr_sql.format(m=f"MAX({_name})")} AS max_repr
        FROM orders
        """
    )
_DQ_ORACLE = "\nUNION ALL\n".join(_DQ_ORACLE_PARTS)


@register("dq_audit", _DQ_ORACLE)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: per-column row/null/distinct counts and min/max,
    one output row per audited column — the profile a training-data
    pipeline ships before ingest (and the input to schema-drift alerts).

    Single full-table pass: ALL columns' metrics are computed in ONE
    ``agg`` (Spark plans the multi-distinct via a single Expand + two-stage
    aggregate), then the 1-row result is reshaped to long form with
    explode(array(struct...)) — a driver-free transform on 1 row. At
    100 TB swap ``countDistinct`` for ``approx_count_distinct`` (HLL,
    map-side combinable, no Expand blow-up) — the audit is an estimate
    there anyway; the exact form here is what makes it oracle-able."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    agg_exprs = [F.count(F.lit(1)).alias("n_rows")]
    for name, _ in _DQ_COLS:
        c = F.col(name)
        agg_exprs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls"),
            F.countDistinct(c).alias(f"{name}__nd"),
            F.min(c).alias(f"{name}__min"),
            F.max(c).alias(f"{name}__max"),
        ]
    row = o.agg(*agg_exprs)
    structs = [
        F.struct(
            F.lit(name).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{name}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{name}__nd").alias("n_distinct"),
            repr_fn(F.col(f"{name}__min")).alias("min_repr"),
            repr_fn(F.col(f"{name}__max")).alias("max_repr"),
        )
        for name, repr_fn in _DQ_COLS
    ]
    return row.select(F.explode(F.array(*structs)).alias("m")).select("m.*")
