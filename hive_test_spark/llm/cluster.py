"""SURVEY.md §2.L — distributed clustering over the embedding corpus.

``llm_kmeans_lloyd`` is the iterative-algorithm exhibit for the embedding
side of the pipeline: Lloyd's k-means expressed entirely as DataFrame ops
(broadcast centroid table, JVM higher-order-function distances, map-side-
combinable mean recompute). Clustering is the backbone of several scale
ops that already exist here — llm_semdedup routes through nearest
centroids, llm_ann_ivf probes coarse cells — and this operator is the
distributed trainer that PRODUCES those centroid tables.

Scale notes (100 TB): each Lloyd iteration is (a) one broadcast of the
k×dim centroid table (tiny — k≤65k × 64 doubles ≈ 32 MB, always
broadcastable), (b) one narrow pass computing argmin distance per vector
(no shuffle — the cross join is against a broadcast relation), and
(c) one map-side-combinable per-(cluster,pos) mean — the only shuffle,
keyed on k×dim rows. Nothing is ever collected to the driver; the
iteration count is FIXED so lineage stays shallow (convergence-driven
loops would localCheckpoint the assignment every few rounds). Distances
are pure JVM ``aggregate(zip_with(...))`` — no Python workers anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_test_spark.io import load_table
from hive_test_spark.registry import register
from hive_test_spark.session import tune

KMEANS_K = 8

# Squared euclidean distance between two double arrays, JVM-side.
_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"
)

# One DuckDB centroid-table build: per-(cluster, position) mean, re-listed
# in position order. {src} supplies (cluster, emb double-list) rows.
_DUCK_CENTROIDS = """
  SELECT cluster, list(comp_avg ORDER BY pos) AS centroid FROM (
    SELECT cluster, pos, AVG(comp) AS comp_avg FROM (
      SELECT cluster, generate_subscripts(emb, 1) AS pos, unnest(emb) AS comp
      FROM {src}
    ) x GROUP BY cluster, pos
  ) p GROUP BY cluster
"""

# One DuckDB assignment step: nearest centroid by rounded squared
# euclidean distance, ties to the lower cluster id.
_DUCK_ASSIGN = """
  SELECT vec_id, emb, cluster FROM (
    SELECT e.vec_id, e.emb, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND(list_sum(list_transform(
                        generate_series(1, len(c.centroid)),
                        i -> (e.emb[i] - c.centroid[i]) ^ 2)), 6),
                      c.cluster) AS rn
    FROM e CROSS JOIN {cents} c
  ) t WHERE rn = 1
"""

_KMEANS_ORACLE = f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    seeded AS (SELECT vec_id % {KMEANS_K} AS cluster, emb FROM e),
    c0 AS ({_DUCK_CENTROIDS.format(src="seeded")}),
    a1 AS ({_DUCK_ASSIGN.format(cents="c0")}),
    c1 AS ({_DUCK_CENTROIDS.format(src="a1")}),
    a2 AS ({_DUCK_ASSIGN.format(cents="c1")}),
    sizes AS (SELECT cluster, COUNT(*) AS cluster_n FROM a2 GROUP BY cluster)
    SELECT a2.vec_id, a2.cluster, sizes.cluster_n
    FROM a2 JOIN sizes USING (cluster)
"""


def _centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster, per-position mean → centroid arrays (position order
    restored via array_sort on (pos, value) structs — collect_list order
    is nondeterministic under parallel aggregation)."""
    per_pos = (
        assigned.select("cluster", F.posexplode("emb").alias("pos", "comp"))
        .groupBy("cluster", "pos")
        .agg(F.avg("comp").alias("comp_avg"))
    )
    return (
        per_pos.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "comp_avg"))).alias("pc"))
        .select("cluster", F.expr("transform(pc, x -> x.comp_avg)").alias("centroid"))
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment. Distances are rounded to 6 decimals
    BEFORE the argmin so Spark's and DuckDB's last-ulp mean-summation
    differences can never flip an assignment; genuine ties break to the
    lower cluster id in both engines."""
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "emb",
        "cluster",
        F.round(F.expr(_SQDIST.format(a="emb", b="centroid")), 6).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy("d", "cluster")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cluster")
    )


@register("llm_kmeans_lloyd", _KMEANS_ORACLE)
def llm_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, deterministic hash-sharded init, two
    assignment rounds with one centroid update between) over the
    embedding corpus; output is the final integer assignment
    (vec_id, cluster, cluster_n) — exactly the coarse-quantizer table
    llm_ann_ivf / llm_semdedup consume.

    Init is ``vec_id % k`` shard means: fully deterministic and
    distributed (k-means|| sampling would add driver round-trips; at
    100 TB a hash-sharded init converges the same and costs one pass).
    The oracle unrolls the identical seeded-init → assign → update →
    assign pipeline as chained CTEs, so the comparison covers the full
    Lloyd arithmetic — init means, both argmin rounds, and the
    intermediate centroid update — not just the final regrouping."""
    tune(spark)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb")
    )
    c0 = _centroids(
        e.select((F.col("vec_id") % KMEANS_K).alias("cluster"), "emb")
    )
    a1 = _assign(e, c0)
    c1 = _centroids(a1)
    a2 = _assign(e, c1)
    sizes = a2.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_n"))
    return a2.join(sizes, "cluster").select("vec_id", "cluster", "cluster_n")
