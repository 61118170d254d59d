"""Streaming behavior tests beyond the single-batch oracle (SURVEY.md §2.K):
multi-micro-batch execution, dedup across batches, twin equivalence."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_live_watermark_equals_batch_twin(spark, registry):
    """The live streaming tumbling count equals the batch F.window agg."""
    qs, _ = registry
    live = {
        (r["w_start"], r["n_events"])
        for r in qs["stream_watermark_late"](spark, SF_DIR).collect()
    }
    from hive_test_spark.io import load_table

    batch = {
        (r["w_start"], r["n_events"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
        .collect()
    }
    assert live == batch


def test_multi_microbatch_dedup(spark):
    """Force 2 micro-batches (maxFilesPerTrigger=1 over a 2-copy source):
    dropDuplicates state must dedup ACROSS batches, not just within."""
    from hive_test_spark.io import scratch_dir
    from hive_test_spark.streaming.live import (
        _events_raw_schema,
        _events_stream_dir,
        _normalize_stream_ts,
    )

    src = _events_stream_dir(spark, SF_DIR, copies=2)
    raw = _normalize_stream_ts(
        spark.readStream.schema(_events_raw_schema(spark, src))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = raw.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    name = f"hts_test_{uuid.uuid4().hex[:8]}"
    ckpt = scratch_dir("ckpt", name)
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    shutil.rmtree(ckpt, ignore_errors=True)
    out = spark.table(name)
    progress = q.recentProgress
    assert len(progress) >= 2, "expected multiple micro-batches"
    from hive_test_spark.io import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    assert out.count() == n_events


def test_session_window_twin_equivalence(spark, registry):
    """F.session_window output matches the lag/cumsum sessionization idiom
    on session counts per user."""
    qs, _ = registry
    native = (
        qs["stream_session_window"](spark, SF_DIR)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    )
    native_map = {r["user_id"]: r["n_sessions"] for r in native}
    from hive_test_spark.io import load_table
    from pyspark.sql import Window

    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    idiom = (
        ev.select(
            "user_id",
            F.when(F.lag("ts").over(w).isNull() | (gap >= 1800), 1).otherwise(0).alias("new_s"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
        .collect()
    )
    idiom_map = {r["user_id"]: r["n_sessions"] for r in idiom}
    assert native_map == idiom_map
