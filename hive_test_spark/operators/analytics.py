"""Event-analytics operators over the `events` fixture — the classic
warehouse workloads a Hive test corpus exercises beyond plain aggregation
[Hive-public: funnel/retention/histogram queries are standard HiveQL
idioms built from joins + window functions; no new engine surface].

All three are deterministic compositions of built-ins (JVM-side,
codegen'd) with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


@register(
    "evt_funnel",
    """
    WITH fv AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    )
    SELECT f.user_id, f.first_view,
           min(CAST(e.ts AS TIMESTAMP)) AS first_purchase,
           epoch_us(min(CAST(e.ts AS TIMESTAMP))) - epoch_us(f.first_view) AS latency_us
    FROM fv f
    JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase'
     AND CAST(e.ts AS TIMESTAMP) > f.first_view
     AND CAST(e.ts AS TIMESTAMP) <= f.first_view + INTERVAL 7 DAY
    GROUP BY f.user_id, f.first_view
    """,
)
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: per user, first 'view' and the first 'purchase'
    that follows it within 7 days, with conversion latency. Two map-side-
    combinable aggregations + one equi-join on user_id with a pushed time
    range — at 100 TB both sides shuffle on user_id once; the events scan
    prunes to the two event types at the reader (predicate pushdown)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        fv.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("first_view"))
            & (F.col("p_ts") <= F.col("first_view") + F.expr("INTERVAL 7 DAY")),
        )
        .groupBy("user_id", "first_view")
        .agg(
            F.min("p_ts").alias("first_purchase"),
            (F.unix_micros(F.min("p_ts")) - F.unix_micros(F.col("first_view"))).alias(
                "latency_us"
            ),
        )
    )


@register(
    "evt_retention",
    """
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      FROM events
    ),
    active AS (SELECT d, count(*) AS n_active FROM days GROUP BY d),
    ret AS (
      SELECT a.d, count(*) AS retained
      FROM days a JOIN days b
        ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
      GROUP BY a.d
    )
    SELECT act.d AS day, act.n_active, COALESCE(r.retained, 0) AS retained
    FROM active act LEFT JOIN ret r ON r.d = act.d
    """,
)
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: per day, distinct active users and how many
    of them return the next day. The (user, day) distinct set is computed
    once and self-joined on (user_id, day+1) — one shuffle each on the
    dedup and the join; day-bucketing keys are low-cardinality so the
    final aggregates broadcast."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    active = days.groupBy("d").agg(F.count(F.lit(1)).alias("n_active"))
    nxt = days.select(
        F.col("user_id").alias("b_user"), F.col("d").alias("b_d")
    )
    ret = (
        days.join(
            nxt,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_d") == F.col("d") + F.expr("INTERVAL 1 DAY")),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("retained"))
        .withColumnRenamed("d", "r_d")
    )
    return (
        active.join(ret, active.d == F.col("r_d"), "left")
        .select(
            F.col("d").alias("day"),
            "n_active",
            F.coalesce(F.col("retained"), F.lit(0)).alias("retained"),
        )
    )


@register(
    "agg_histogram",
    """
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
           count(*) AS n_items,
           ROUND(min(l_extendedprice), 6) AS lo,
           ROUND(max(l_extendedprice), 6) AS hi
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (5000-wide buckets over l_extendedprice) —
    the deterministic replacement for Hive's histogram_numeric (which is
    approximate/NDV-dependent and thus not oracle-able). floor(x/width)
    keeps the whole profile one map-side-combinable aggregation; at
    100 TB this is the standard first-pass distribution profile before
    choosing range-partition bounds."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.min("l_extendedprice"), 6).alias("lo"),
            F.round(F.max("l_extendedprice"), 6).alias("hi"),
        )
    )
