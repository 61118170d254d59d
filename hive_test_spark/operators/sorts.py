"""SURVEY.md §2.F — sorts / limits / top-k.

Reference surface: HiveQL ORDER BY / LIMIT and the Hive-specific
SORT BY / DISTRIBUTE BY / CLUSTER BY partition-local forms [Hive-public]
(reference checkout empty — SURVEY.md §0.1).

Scale notes (100 TB): global ORDER BY is a range-partitioned sort
(sampled range boundaries → shuffle → per-partition sort) — Spark never
funnels to one node. ORDER BY + LIMIT k plans as TakeOrderedAndProject:
per-partition top-k heaps, merged on the driver — O(k) driver memory.
SORT BY (partition-local) skips the range exchange entirely, which is
why Hive workloads use it before per-reducer writes.

The driver hash is order-insensitive, so ordered queries also project a
rank column — that turns row order into hashed values and makes the sort
observable to the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


@register(
    "sort_order_by",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER (ORDER BY c_nationkey ASC, c_acctbal DESC NULLS LAST, c_custkey) AS global_pos
    FROM customer
    """,
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort, asc/desc + NULLS LAST. The global_pos column
    materializes the total order so the order-insensitive hash verifies it.
    (The single-partition rank window is the verification device; the
    production sort itself is the range-partitioned orderBy.)"""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(
        F.col("c_nationkey").asc(), F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey")
    )
    return (
        c.orderBy(F.col("c_nationkey").asc(), F.col("c_acctbal").desc_nulls_last(), "c_custkey")
        .select("c_custkey", "c_nationkey", "c_acctbal", F.row_number().over(w).alias("global_pos"))
    )


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: plans as TakeOrderedAndProject (per-partition heaps,
    no full sort, no full shuffle). Deterministic via o_orderkey tiebreak."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


@register(
    "limit_rows",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def limit_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT row cap. Bare LIMIT is partition-order-dependent, so the
    verified form caps an ordered-by-unique-key input (deterministic);
    tests exercise the bare CollectLimit separately."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    )


@register("sort_within_partitions")  # rows-only: partition-local order is not SQL-observable
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive SORT BY + DISTRIBUTE BY (= CLUSTER BY when keys match):
    repartition on the key, sort only within partitions — no global range
    exchange. Verified by a per-partition monotonicity check in tests;
    here we also expose the partition id so the distribution is visible."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_shipdate")
        .select("l_suppkey", "l_shipdate", F.spark_partition_id().alias("part_id"))
    )


@register(
    "sort_cluster_by",
    """
    SELECT l_suppkey, CAST(1 AS BIGINT) AS n_partitions, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_suppkey
    """,
)
def sort_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CLUSTER BY (= DISTRIBUTE BY + SORT BY on the same key)
    [Hive-public: LanguageManual SortBy — the pre-bucketing co-location
    primitive]. Driven through the SQL front end, then verified by
    OBSERVING the physical layout: spark_partition_id() is captured
    post-shuffle and the rollup proves every l_suppkey landed in exactly
    ONE partition (n_partitions == 1 for all keys, vs the oracle's
    literal 1) while total row counts match. A broken distribution
    (e.g. round-robin) would scatter keys across partitions and fail the
    hash on n_partitions.

    100 TB note: CLUSTER BY before a write is how you co-locate data for
    downstream merge joins / bucketed tables; the per-key single-partition
    invariant is exactly what bucket-map-join correctness rests on. The
    follow-up groupBy reuses the HashPartitioning(l_suppkey) the shuffle
    produced — one exchange total (asserted in tests/test_plans.py)."""
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("cb_lineitem")
    clustered = spark.sql(
        "SELECT l_suppkey, l_extendedprice FROM cb_lineitem CLUSTER BY l_suppkey"
    )
    return (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("pid").alias("n_partitions"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
