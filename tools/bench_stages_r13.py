"""Stage-level timing for the round-13 optimization targets (guide §1:
measure first): llm_incremental_minhash and llm_near_dedup_minhash.

Each leg is timed in isolation with the noop sink so the expensive leg
is identified before anything is changed.

Usage:
    python tools/bench_stages_r13.py incr [--sf ...] [--runs 2]
    python tools/bench_stages_r13.py neardup [--sf ...] [--runs 2]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from hive_test_spark.session import get_spark


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed(spark, name, df, runs) -> None:
    spark.sparkContext.setJobDescription(f"warm:{name}")
    noop(df)
    best = float("inf")
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.perf_counter()
        noop(df)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} best {best:7.3f}s", flush=True)


def incr_stages(spark, sf, runs) -> None:
    from hive_test_spark.io import load_table
    from hive_test_spark.llm import pipeline as P

    d = load_table(spark, sf, "documents")
    toks, mins = P._minhash_wide(d)
    bands = P._bands_from_wide(mins).drop("n")
    in_bands = bands.filter(F.col("doc_id") % P._INCR_MOD == 0)
    ex_bands = bands.filter(F.col("doc_id") % P._INCR_MOD != 0)
    cand = (
        in_bands.alias("i")
        .join(
            ex_bands.alias("e"),
            (F.col("i.band") == F.col("e.band"))
            & (F.col("i.bkey") == F.col("e.bkey")),
        )
        .select(F.col("i.doc_id").alias("in_id"), F.col("e.doc_id").alias("ex_id"))
        .distinct()
    )
    from hive_test_spark.api import queries

    full = queries()["llm_incremental_minhash"](spark, sf)
    timed(spark, "mins", mins, runs)
    timed(spark, "bands", bands, runs)
    timed(spark, "cand", cand, runs)
    timed(spark, "full", full, runs)
    print(f"candidates={cand.count()}")


def neardup_stages(spark, sf, runs) -> None:
    from hive_test_spark.io import load_table
    from hive_test_spark.llm import dedup as D

    d = load_table(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("n", F.size("tok"))
    a, b = toks.repartition(32).alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok"))).cast("double")
    union = F.col("a.n") + F.col("b.n") - F.size(
        F.array_intersect(F.col("a.tok"), F.col("b.tok"))
    )
    jac = inter / union
    ratio = F.least(F.col("a.n"), F.col("b.n")).cast("double") / F.greatest(
        F.col("a.n"), F.col("b.n")
    )
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ratio > D.JACCARD_THRESHOLD)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jac"),
        )
        .filter(F.col("jac") > D.JACCARD_THRESHOLD)
    )
    truth_agg = truth.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.round(F.min("jac"), 6).alias("min_true_jaccard"),
        F.round(F.max("jac"), 6).alias("max_true_jaccard"),
    )

    # candidate-set build (LSH chain) timed as the checkpoint cost
    spark.sparkContext.setJobDescription("time:cand_ckpt")
    t0 = time.perf_counter()
    cand = D.minhash_candidate_pairs(spark, sf).select("doc_a", "doc_b").localCheckpoint(
        eager=True
    )
    print(f"{'cand_ckpt':12s} once {time.perf_counter() - t0:7.3f}s", flush=True)

    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    cand_jac = (
        cand.join(F.broadcast(ta), "doc_a").join(F.broadcast(tb), "doc_b")
        .select(
            (
                F.size(F.array_intersect("tok_a", "tok_b")).cast("double")
                / (
                    F.size("tok_a")
                    + F.size("tok_b")
                    - F.size(F.array_intersect("tok_a", "tok_b"))
                )
            ).alias("token_jac")
        )
    )
    precision = cand_jac.agg(
        F.coalesce(
            F.bool_and(F.col("token_jac") > D.JACCARD_THRESHOLD - 0.05), F.lit(True)
        ).alias("candidates_all_true")
    )
    hit = cand.withColumn("hit", F.lit(1)).hint("shuffle_hash")
    recall = (
        truth.join(hit, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            (F.count("hit") >= F.lit(0.9) * F.count(F.lit(1))).alias("recall_ok"),
        )
    )
    timed(spark, "truth_agg", truth_agg, runs)
    timed(spark, "precision", precision, runs)
    timed(spark, "recall", recall, runs)
    print(f"candidates={cand.count()}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["incr", "neardup"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("r13-stages")
    spark.sparkContext.setLogLevel("ERROR")
    if args.which == "incr":
        incr_stages(spark, args.sf, args.runs)
    else:
        neardup_stages(spark, args.sf, args.runs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
