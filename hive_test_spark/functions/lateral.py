"""SURVEY.md §2.H — lateral views / table-generating functions (UDTFs).

Reference surface: HiveQL LATERAL VIEW explode / posexplode / json_tuple
/ stack [Hive-public] (reference checkout empty — SURVEY.md §0.1).

Scale notes (100 TB): explode is a narrow (pipelined) operator — no
shuffle; output row count is the fan-out. Keep the projection narrow
before exploding so the duplicated columns are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


@register(
    "udtf_explode",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token
    HAVING COUNT(*) > 50
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode: flatten token arrays → word counts."""
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 50)
    )


@register(
    "udtf_posexplode",
    """
    SELECT doc_id, pos, token FROM (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ) t
    WHERE pos < 5
    """,
)
def udtf_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: flatten with ordinal, keep first 5 tokens."""
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"))
        .filter(F.col("pos") < 5)
    )


@register(
    "udtf_json_tuple",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def udtf_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW json_tuple: multi-field JSON extraction from props."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.json_tuple(F.col("props"), "k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        )
    )


@register(
    "udtf_stack",
    """
    SELECT l_returnflag, metric, val
    FROM (
      SELECT l_returnflag, 'sum_qty' AS metric, ROUND(SUM(l_quantity), 6) AS val
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS metric, ROUND(SUM(l_extendedprice), 6) AS val
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT l_returnflag, 'n_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS val
      FROM lineitem GROUP BY l_returnflag
    ) u
    """,
)
def udtf_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack(n, ...) — unpivot wide aggregates into (metric, val) rows."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, 'n_rows', n_rows) AS (metric, val)"
        ),
    )
