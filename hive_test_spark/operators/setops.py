"""SURVEY.md §2.G — set operations.

Reference surface: HiveQL UNION [ALL|DISTINCT], INTERSECT, EXCEPT
(Hive 2.3+) [Hive-public] (reference checkout empty — SURVEY.md §0.1).

Scale notes (100 TB): UNION ALL is a zero-shuffle plan concatenation.
UNION DISTINCT / INTERSECT / EXCEPT each cost one hash-dedup shuffle on
the full row; at warehouse scale prefer keyed semi/anti joins over
whole-row set ops when a key exists (the whole row is the shuffle key
here — keep projections narrow first, as these queries do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


def _branches(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping keysets: customers with big orders vs urgent orders."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return big, urgent

_BRANCH_SQL = {
    "big": "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0",
    "urgent": "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'",
}


@register(
    "set_union_all",
    f"""
    SELECT custkey, COUNT(*) AS n
    FROM (({_BRANCH_SQL['big']}) UNION ALL ({_BRANCH_SQL['urgent']})) u
    GROUP BY custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — duplicates kept, visible via the count)."""
    tune(spark)
    big, urgent = _branches(spark, sf_dir)
    return big.unionByName(urgent).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_union_distinct",
    f"""
    ({_BRANCH_SQL['big']}) UNION ({_BRANCH_SQL['urgent']})
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (set semantics)."""
    tune(spark)
    big, urgent = _branches(spark, sf_dir)
    return big.unionByName(urgent).distinct()


@register(
    "set_intersect",
    f"""
    ({_BRANCH_SQL['big']}) INTERSECT ({_BRANCH_SQL['urgent']})
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers in both branches."""
    tune(spark)
    big, urgent = _branches(spark, sf_dir)
    return big.intersect(urgent)


@register(
    "set_except",
    f"""
    ({_BRANCH_SQL['big']}) EXCEPT ({_BRANCH_SQL['urgent']})
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): big-order customers never urgent."""
    tune(spark)
    big, urgent = _branches(spark, sf_dir)
    return big.subtract(urgent)
