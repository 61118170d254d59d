"""Late-round surface completions: OUTER lateral view, windowed distinct
count, filtered/argmax aggregates, grouped median, and an hourly
distinct-user rollup on `events`.

These close small but real gaps in the Hive query surface (SURVEY.md §2.H
lists ``LATERAL VIEW OUTER`` as part of the UDTF grammar [Hive-public];
``count_if``/``max_by``/``min_by``/``median`` are in the shared
Hive/Spark builtin family [Spark-public]) and in the event-analytics set
(§2.M). All are pure built-in compositions with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune


@register(
    "udtf_explode_outer",
    """
    WITH base AS (
      SELECT p_partkey,
             CASE WHEN p_size < 25 THEN string_split(p_name, ' ')
                  ELSE CAST([] AS VARCHAR[]) END AS words
      FROM part)
    SELECT p_partkey, unnest(words) AS word FROM base WHERE len(words) > 0
    UNION ALL
    SELECT p_partkey, CAST(NULL AS VARCHAR) AS word
    FROM base WHERE len(words) = 0
    """,
)
def udtf_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER explode: rows whose array is empty (or null)
    survive with a NULL element instead of vanishing — the Hive grammar's
    OUTER modifier. Spark's ``explode_outer`` is the exact builtin; like
    plain Generate it is a narrow map-side transform, so at 100 TB it
    streams with no shuffle and the only cost is the fan-out multiplier."""
    tune(spark)
    p = load_table(spark, sf_dir, "part")
    words = F.when(F.col("p_size") < 25, F.split("p_name", " ")).otherwise(
        F.array().cast("array<string>")
    )
    return p.select("p_partkey", F.explode_outer(words).alias("word"))


@register(
    "win_distinct_count",
    """
    SELECT o.o_orderkey, o.o_custkey, d.n_prio
    FROM orders o
    JOIN (SELECT o_custkey,
                 COUNT(DISTINCT o_orderpriority) AS n_prio
          FROM orders GROUP BY o_custkey) d
      ON o.o_custkey = d.o_custkey
    """,
)
def win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT x) OVER (PARTITION BY k): Spark's windowed aggregates
    reject DISTINCT outright, so the idiomatic rewrite is
    ``size(collect_set(x) OVER w)`` — one shuffle on the partition key,
    set dedup inside the window frame. The oracle uses the equivalent
    groupBy-then-join formulation. At 100 TB prefer that join form when
    per-key cardinality is high (collect_set materializes the set per ROW
    in the worst case; the groupBy form materializes it once per KEY), or
    ``approx_count_distinct`` when an estimate suffices."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w)).cast("long").alias("n_prio"),
    )


@register(
    "agg_count_if_argminmax",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           arg_max(o_orderstatus, o_orderkey) AS last_key_status,
           arg_min(o_orderstatus, o_orderkey) AS first_key_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_if_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered count (``count_if`` / FILTER clause) and argmax/argmin
    (``max_by``/``min_by``) in one grouped aggregate. The ordering key
    (o_orderkey) is unique, which is what makes max_by deterministic —
    with ties it is pick-any in both engines. All three are map-side
    combinable (partial count + partial (key,val) max), so at 100 TB
    this is a single standard two-phase aggregate with no extra pass."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.max_by("o_orderstatus", "o_orderkey").alias("last_key_status"),
        F.min_by("o_orderstatus", "o_orderkey").alias("first_key_status"),
    )


@register(
    "agg_median",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(median(l_quantity), 6) AS median_qty,
           ROUND(median(l_extendedprice), 6) AS median_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median (percentile-0.5 with linear interpolation —
    identical even/odd-count semantics in Spark and DuckDB). Exact
    percentiles buffer the group's values per key, so at 100 TB swap to
    ``percentile_approx`` (a fixed-size mergeable digest, map-side
    combinable) — the exact form here is what makes it oracle-able."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.median("l_extendedprice"), 6).alias("median_price"),
    )


@register(
    "evt_distinct_users_hourly",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
           event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def evt_distinct_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly active-user rollup: distinct users and event volume per
    (hour, event_type) — the batch twin of a streaming DAU/HAU counter.
    COUNT(DISTINCT) plans as Expand + two-phase aggregate keyed on
    (h, event_type, user_id): the first phase dedups map-side, so the
    shuffle carries at most one row per (hour, type, user) — bounded by
    distinct users, not raw event volume. At 100 TB that bound is the
    whole game; if an estimate suffices, approx_count_distinct drops the
    Expand entirely."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
