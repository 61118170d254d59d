"""Event-analytics operators over the `events` fixture — the classic
warehouse workloads a Hive test corpus exercises beyond plain aggregation
[Hive-public: funnel/retention/histogram queries are standard HiveQL
idioms built from joins + window functions; no new engine surface].

All three are deterministic compositions of built-ins (JVM-side,
codegen'd) with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "evt_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS d0,
             date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS d1
      FROM events
    ),
    spine_days AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS event_day
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT t.event_type, s.event_day FROM types t CROSS JOIN spine_days s),
    daily AS (
      SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_day,
             count(*) AS n, ROUND(avg(value), 6) AS a
      FROM events WHERE value > 200 GROUP BY 1, 2
    ),
    j AS (
      SELECT s.event_type, s.event_day, COALESCE(d.n, 0) AS n_events, d.a,
             COUNT(d.a) OVER (PARTITION BY s.event_type ORDER BY s.event_day) AS grp
      FROM spine s
      LEFT JOIN daily d ON d.event_type = s.event_type AND d.event_day = s.event_day
    )
    SELECT event_type, event_day, n_events,
           MAX(a) OVER (PARTITION BY event_type, grp) AS avg_val_filled
    FROM j
    """,
)
def evt_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + LOCF (the hypertable `time_bucket_gapfill` /
    `locf` idiom): build a complete day spine per series key, left-join the
    sparse daily aggregate (high-value events only — `value > 200` leaves
    real gaps in the fixtures), fill counts with 0 and carry the last
    observed daily average forward (null before the first observation).

    Scale shape: the spine is (n_days x n_series) — tiny relative to the
    fact table, generated with sequence()+explode, never collected. The
    LOCF window partitions BY SERIES KEY, so at 100 TB each series fills
    independently after one shuffle on event_type; there is no global
    single-partition window anywhere. The DuckDB oracle expresses LOCF
    portably via the grouped-carry trick (running COUNT of non-nulls as a
    group id, then MAX within the group) — same results as Spark's
    last(ignorenulls=True)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine_days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("event_day")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(spine_days))
    daily = (
        ev.filter(F.col("value") > 200)
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("event_day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_val"),
        )
    )
    j = spine.join(daily, ["event_type", "event_day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "event_day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.last("avg_val", ignorenulls=True).over(w).alias("avg_val_filled"),
    )


@register(
    "evt_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS to_type
      FROM events
    )
    SELECT from_type, to_type, COUNT(*) AS n_trans,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY from_type), 6)
             AS p_trans
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition (Markov) matrix: per-user consecutive event bigrams
    via LEAD over (ts, event_id), rolled up to transition counts and
    row-normalized probabilities — the user-behavior summary behind churn
    and recommendation features.

    Scale shape: ONE shuffle on user_id for the sequence window (the same
    partitioning every sessionization op needs — at 100 TB you bucket the
    event log by user_id and this becomes shuffle-free), then a tiny
    (|event_types|^2)-row aggregate; the probability window runs on that
    matrix, not on the raw events. Deterministic tie-break on event_id."""
    from pyspark.sql import Window

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    mat = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n_trans"))
    wf = Window.partitionBy("from_type")
    return mat.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(wf), 6).alias("p_trans"),
    )
