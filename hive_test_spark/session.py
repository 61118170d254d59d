"""SparkSession factory and per-query session tuning.

The driver may hand us an arbitrary ``SparkSession``; everything that is
runtime-settable (session timezone, Arrow, AQE) is (re-)applied by
``tune()`` at the top of every query function so correctness does not
depend on who built the session.

Scale notes (100 TB design): these configs are the single place where
cluster-level tuning lives. On a real cluster the same factory is used
with ``master`` unset (picked up from spark-submit), AQE handles runtime
shuffle-partition coalescing and skew-join splitting, and
``autoBroadcastJoinThreshold`` keeps dimension joins map-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session we receive (driver's or ours).
_RUNTIME_CONFS = {
    # Oracle hash-match depends on UTC rendering (SURVEY.md §5.3).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for all pandas_udf / toPandas paths (SURVEY.md §2.J).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime shuffle coalescing, skew-join splitting, join demotion.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # ANSI off: Hive/legacy-permissive semantics (NULL on bad cast, not error),
    # which is also what the DuckDB oracle's permissive functions expect.
    "spark.sql.ansi.enabled": "false",
}


def shuffle_partitions(spark: SparkSession) -> int:
    """Shuffle partition count: ``$SPARK_GRAFT_SHUFFLE_PARTITIONS`` when
    set (the per-deployment knob — on a cluster size it so post-shuffle
    partitions land in the 100 MB–1 GB band, guide §2.2), otherwise the
    session's core count (``defaultParallelism``).

    r12 optimization round: this was a literal 32 — right for the
    local[32] harness, wrong everywhere else (the driver also benches at
    a LOWER core count, where 32 shuffle tasks are pure scheduling
    overhead at fixture scale, and a real cluster wants a data-sized
    value). Every cross-partition reduction in the engine accumulates in
    exact DECIMAL or integers (SCALE.md §9ac), so results are
    partition-count-invariant by construction; AQE coalesces above
    whatever is set here."""
    env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env:
        # Validate here so a malformed/zero/negative value fails softly
        # at the knob instead of crashing tune()/get_spark() far from
        # the env var (ADVICE r12).
        try:
            n = int(env)
        except ValueError:
            n = 0
        if n > 0:
            return n
        import warnings

        warnings.warn(
            f"SPARK_GRAFT_SHUFFLE_PARTITIONS={env!r} is not a positive "
            "int; falling back to defaultParallelism"
        )
    return fanout(spark)


def fanout(spark: SparkSession) -> int:
    """Partition fan-out used to SPREAD a single-split fixture table before
    per-pair-heavy work (the recurring 1-parquet-split disease, SCALE.md
    §9y): narrow chains and broadcast nested-loop joins inherit the
    streamed side's layout, so without an explicit repartition every
    probe×corpus pair evaluates on one core.

    Derived from ``defaultParallelism`` (= total cores on local[N],
    executor-count-scaled on a real cluster) rather than a literal 32, so
    the spread adapts to the host instead of over/under-parallelizing
    (ADVICE r8). On this harness (local[32]) it returns exactly 32, so
    existing verified plans are unchanged."""
    try:
        n = spark.sparkContext.defaultParallelism
    except Exception:  # session without a live context (never in practice)
        n = 0
    return n if n and n > 0 else 32


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session. Idempotent, cheap."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this build — non-fatal
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions(spark)))
    except Exception:
        pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``hive_test_spark`` importable on Python workers regardless of
    the driver process's cwd/sys.path.

    Python-tier kernels (pandas_udf / applyInPandas / mapInPandas bodies)
    defined at module level are cloudpickled BY REFERENCE, so workers must
    import this package by name. An external driver that imported
    ``__spark_entry__`` via an absolute path (cwd elsewhere) would
    otherwise crash every UDF-tier operator with ModuleNotFoundError.
    Shipping the package once per SparkContext with ``addPyFile`` is the
    same mechanism a real cluster deployment uses (``--py-files``), and is
    a no-op for JVM-only operators.
    """
    sc = spark.sparkContext
    if getattr(sc, "_hts_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"hive_test_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # e.g. a session that forbids addPyFile — workers then need PYTHONPATH
    sc._hts_pkg_shipped = True


def get_spark(app_name: str = "hive-test-spark") -> SparkSession:
    """Build the engine's own session (tests / bench).

    ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster the master comes from
    the environment and this builder only contributes SQL confs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Files: pack small test files; at scale maxPartitionBytes governs
        # scan parallelism (128m default keeps partitions executor-sized).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Needs a live context (core count), so set after creation; tune()
    # re-applies it per query for sessions built elsewhere.
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions(spark)))
    return spark
