"""Table loading for the driver fixtures.

All ten tables (TESTDATA.md) load as parquet DataFrames. Loads are lazy
plan nodes; Catalyst pushes filters/column pruning into the vectorized
parquet reader, so callers should never pre-materialize.

Scale notes: at 100 TB each "table" is a directory of many files (or an
external catalog table); ``load_table`` only depends on
``spark.read.parquet(path)`` which handles both. Partition-pruned reads
come for free when the warehouse layout is ``partitionBy`` -ed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Scratch area for sink/round-trip operators (inside the repo; gitignored).
SCRATCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a fixture table (single file at fixture scale, a
    directory of files at warehouse scale). Unknown/missing reads as
    'huge' so size-gated broadcasts fail SAFE (never broadcast)."""
    p = table_path(sf_dir, name)
    try:
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )
        return os.path.getsize(p)
    except OSError:
        return 1 << 62


# Mirrors the session's autoBroadcastJoinThreshold (64 MB, get_spark):
# the gate below makes the SAME decision correct statistics would make,
# from file metadata, with no Spark job.
_BROADCAST_BYTES_LIMIT = 64 * 1024 * 1024


def attach_side(df: DataFrame, sf_dir: str, name: str = "documents"):
    """Join-side wrapper for a corpus-wide PER-DOCUMENT table being
    attached to a pair/candidate frame (token sets, signatures, shingle
    sets): broadcast when the source table is provably dimension-sized,
    shuffle-hash otherwise.

    A bare ``F.broadcast`` hint OVERRIDES the planner's size threshold,
    so an unconditional hint on a per-doc table pins the whole corpus
    into driver + executor memory at any real scale (VERDICT r12 item
    3). The on-disk byte gate keeps the fixture-scale plan (broadcast,
    measured ~20% faster than shuffle_hash on the minhash verify legs
    at sf0.1) while a 100 TB corpus flips every such join to a
    doc_id-keyed shuffled hash join with the per-doc table as build —
    the schedule the op docstrings document."""
    from pyspark.sql import functions as F

    if table_bytes(sf_dir, name) <= _BROADCAST_BYTES_LIMIT:
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TimestampType across fixture vintages.

    The driver has shipped events.parquet with two physical layouts:
    TIMESTAMP(NANOS) — which Spark's µs TimestampType rejects outright
    (PARQUET_TYPE_ILLEGAL), so it must be read as a raw long (legacy conf)
    and floored to µs, matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast —
    and plain timestamp[us], which Spark 4 infers as TIMESTAMP_NTZ. Both
    normalize to session-tz TimestampType (session tz is pinned UTC, so
    the NTZ cast is wall-clock-identical)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return df.withColumn("ts", _normalize_ts(df.schema["ts"].dataType))


def _normalize_ts(dtype):
    """Column expression turning a raw events.ts of any fixture vintage
    (long nanos | TIMESTAMP_NTZ µs | already-TimestampType) into
    TimestampType.

    NANOS-ONLY ASSUMPTION: a LongType ts can only come from the legacy
    ``nanosAsLong`` read of a TIMESTAMP(NANOS) parquet column (no fixture
    vintage ships raw int64 micros/millis), so DIV 1000 → µs is the only
    long branch. Guarded: values outside the plausible epoch-nanos range
    (1990..2100, i.e. ~6.3e17..4.1e18) raise instead of silently
    mis-scaling a future micros/millis vintage."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, T.LongType):
        return F.when(
            F.col("ts").between(631_152_000_000_000_000, 4_102_444_800_000_000_000),
            F.timestamp_micros(F.expr("ts DIV 1000")),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("events.ts long value out of epoch-nanos range "
                          "(unexpected fixture vintage?): "),
                    F.col("ts").cast("string"),
                )
            ).cast(T.TimestampType())
        )
    return F.col("ts").cast(T.TimestampType())


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def scratch_path(*parts: str) -> str:
    p = os.path.join(SCRATCH_DIR, *parts)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    return p


def scratch_dir(*parts: str) -> str:
    """Path for a scratch output directory (parent pre-created)."""
    p = os.path.join(SCRATCH_DIR, *parts)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    return p
